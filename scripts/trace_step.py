"""Capture a device trace of the train step and print the top ops.

The axon relay supports real device traces (jax.profiler.trace), and
they are the ground truth for optimization on this platform — the
RTT-corrected wall harness gives totals only, and micro-benching
kernels in isolation overstates their cost 2-3x (see
docs/PLATFORM_NOTES.md). Three of round 2's five perf wins came
straight from this view.

Usage: python scripts/trace_step.py [config] [batch] [steps]
Prints one line per distinct HLO op >0.4 ms: device ms, op name,
category, source file:line, truncated HLO.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import glob
import gzip
import json
import sys
import tempfile


def capture(config: str, batch: int, steps: int, log_dir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cffm_tpu.config import get_config
    from cffm_tpu.models.cffm import field_offsets
    from cffm_tpu.train import (create_state, default_interaction_fn,
                                train_step)
    from cffm_tpu.utils.profiling import trace

    cfg = get_config(config)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=batch),
        model=dataclasses.replace(
            cfg.model,
            table_dtype=_os.environ.get("CFFM_TABLE_DTYPE",
                                        cfg.model.table_dtype)))
    mcfg = cfg.model
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        np.stack([rng.integers(0, v, size=batch) for v in mcfg.vocab_sizes],
                 axis=1).astype(np.int32)
        + field_offsets(mcfg)[None, :].astype(np.int32))
    dense = (jnp.asarray(rng.normal(size=(batch, mcfg.num_dense)), jnp.float32)
             if mcfg.num_dense else None)
    labels = jnp.asarray((rng.random(batch) < 0.3).astype(np.float32))
    state = create_state(cfg, jax.random.key(0))
    fn = default_interaction_fn(cfg)
    state, m = train_step(state, ids, dense, labels, cfg, fn)
    _ = float(m["loss"])  # drain compile/warm before tracing
    with trace(log_dir):
        for _ in range(steps):
            state, m = train_step(state, ids, dense, labels, cfg, fn)
        _ = float(m["loss"])


def report(log_dir: str, steps: int, min_ms: float = 0.4) -> None:
    path = glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(path) as f:
        tr = json.load(f)
    rows = {}
    for e in tr.get("traceEvents", []):
        a = e.get("args") or {}
        if e.get("ph") == "X" and "source" in a and e.get("dur", 0) > 0:
            # events repeat once per traced step: keep one occurrence
            if e["name"] not in rows:
                rows[e["name"]] = (
                    e["dur"] / 1e3, a.get("hlo_category", ""),
                    a.get("source", "").rsplit("/", 1)[-1],
                    a.get("long_name", "")[:72])
    total = 0.0
    for n, (d, c, s, l) in sorted(rows.items(), key=lambda kv: -kv[1][0]):
        if d < min_ms:
            continue
        total += d
        print(f"{d:8.2f}ms {n[:26]:26s} {c[:14]:14s} {s:26s} {l}")
    print(f"-- sum of listed: {total:.1f} ms "
          f"(per traced step; {steps} steps captured)")


def main() -> None:
    config = sys.argv[1] if len(sys.argv) > 1 else "criteo_kaggle"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    log_dir = tempfile.mkdtemp(prefix="cffm_trace_")
    capture(config, batch, steps, log_dir)
    report(log_dir, steps)
    print(f"trace dir (TensorBoard/Perfetto-viewable): {log_dir}")


if __name__ == "__main__":
    main()
