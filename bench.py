"""Benchmark: full CFFM training-step throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}

Baseline (BASELINE.md): >=1M examples/s on a v5e-8 => 125K examples/s
per chip. vs_baseline = measured_per_chip / 125000.

Measures the complete train step (lookup + fused Pallas cross-conv
fwd/bwd + tower + per-row Adagrad + optax) on the Criteo-Kaggle
flagship config with synthetic data, using the RTT-corrected harness
(cffm_tpu/utils/timing.py — the axon relay's block_until_ready lies).
"""

import dataclasses
import json
import sys


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cffm_tpu.config import get_config
    from cffm_tpu.models.cffm import field_offsets
    from cffm_tpu.train import create_state, default_interaction_fn, train_step
    from cffm_tpu.utils.timing import device_time, measure_rtt

    cfg = get_config("criteo_kaggle")
    batch = 32768
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, batch_size=batch))

    rng = np.random.default_rng(0)
    ids_local = np.stack(
        [rng.integers(0, v, size=batch) for v in cfg.model.vocab_sizes], axis=1
    ).astype(np.int32)
    ids = jnp.asarray(ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
    dense = jnp.asarray(rng.normal(size=(batch, 13)), jnp.float32)
    labels = jnp.asarray((rng.random(batch) < 0.3).astype(np.float32))

    state = create_state(cfg, jax.random.key(0))
    interaction_fn = default_interaction_fn(cfg)

    # train_step is already jit'd WITH state donation — call it directly
    # (an extra non-donating jit wrapper would double the table in HBM).
    state, _ = train_step(state, ids, dense, labels, cfg, interaction_fn)

    rtt = measure_rtt()

    import time

    n = 10
    t0 = time.time()
    for _ in range(n):
        state, m = train_step(state, ids, dense, labels, cfg, interaction_fn)
    _ = float(m["loss"])
    total = time.time() - t0
    dt = max(total - rtt, 1e-9) / n

    value = batch / dt
    out = {
        "metric": "criteo_kaggle_train_step_examples_per_s_per_chip",
        "value": round(value, 1),
        "unit": "examples/s",
        "vs_baseline": round(value / 125000.0, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
