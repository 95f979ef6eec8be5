"""Device-trace the SHARDED train step (1-device mesh, real chip).

The routed path (build_routing + routed_lookup + grad_return +
rowwise_update, cffm_tpu/parallel/sharded_*) measured 131K ex/s/chip vs
338K for the replicated step at batch 65536 (BENCH_LAST_GOOD r3) — a
~306 ms/step overhead. This prints the per-HLO-op breakdown of where
that time goes so the optimization targets are measured, not guessed.

Usage: python scripts/trace_sharded.py [config] [batch] [steps]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import sys
import tempfile

from trace_step import report  # same trace-json top-ops printer


def capture(config: str, batch: int, steps: int, log_dir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cffm_tpu.config import get_config
    from cffm_tpu.models.cffm import field_offsets
    from cffm_tpu.parallel.mesh import make_mesh
    from cffm_tpu.parallel.sharded_train import (create_sharded_state,
                                                 make_sharded_train_step)
    from cffm_tpu.train import default_interaction_fn
    from cffm_tpu.utils.profiling import trace

    cfg = get_config(config)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, batch_size=batch),
        model=dataclasses.replace(
            cfg.model,
            table_dtype=_os.environ.get("CFFM_TABLE_DTYPE",
                                        cfg.model.table_dtype)),
        sharding=dataclasses.replace(cfg.sharding, table_sharded=True))
    mcfg = cfg.model
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        np.stack([rng.integers(0, v, size=batch) for v in mcfg.vocab_sizes],
                 axis=1).astype(np.int32)
        + field_offsets(mcfg)[None, :].astype(np.int32))
    dense = (jnp.asarray(rng.normal(size=(batch, mcfg.num_dense)), jnp.float32)
             if mcfg.num_dense else None)
    labels = jnp.asarray((rng.random(batch) < 0.3).astype(np.float32))

    mesh = make_mesh(1)
    state = create_sharded_state(cfg, jax.random.key(0), mesh)
    step = make_sharded_train_step(cfg, mesh, default_interaction_fn(cfg))
    state, m = step(state, ids, dense, labels)
    _ = float(m["loss"])  # drain compile/warm before tracing
    with trace(log_dir):
        for _ in range(steps):
            state, m = step(state, ids, dense, labels)
        _ = float(m["loss"])


def main() -> None:
    config = sys.argv[1] if len(sys.argv) > 1 else "criteo_kaggle"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    log_dir = tempfile.mkdtemp(prefix="cffm_trace_sharded_")
    capture(config, batch, steps, log_dir)
    report(log_dir, steps)
    print(f"trace dir (TensorBoard/Perfetto-viewable): {log_dir}")


if __name__ == "__main__":
    main()
