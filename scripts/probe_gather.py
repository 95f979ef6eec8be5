"""Gather scaling probe (docs/NEXT_EXPERIMENTS.md #7).

Times jnp.take of the criteo bench gather (1.28M sorted row ids out of
a 2.6M-row table) at several row widths. If time scales ~linearly with
width, gathers are BANDWIDTH-bound and a bf16 shadow table would save
~half the gather time; if roughly flat, they are ROW-COUNT-bound and
the shadow is useless. Prints one JSON line per width.

Usage: python scripts/probe_gather.py [--rows=2600832] [--take=1277952]
       [--widths=128,320,640] [--dtype=float32,bfloat16]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_600_832)
    ap.add_argument("--take", type=int, default=1_277_952)  # 39*32768
    ap.add_argument("--widths", default="128,320,640")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cffm_tpu.utils.timing import device_time, measure_rtt

    rtt = measure_rtt()
    for dt in args.dtypes.split(","):
        dtype = jnp.dtype(dt)
        for w in (int(x) for x in args.widths.split(",")):
            table = jax.jit(lambda k, w=w, dtype=dtype: jax.random.normal(
                k, (args.rows, w), jnp.float32).astype(dtype))(
                    jax.random.key(0))
            ids = jax.jit(lambda k: jnp.sort(jax.random.randint(
                k, (args.take,), 0, args.rows, jnp.int32)))(jax.random.key(1))
            jax.block_until_ready((table, ids))

            def gather(t, i):
                return jnp.take(t, i, axis=0,
                                indices_are_sorted=True, unique_indices=False)

            sec = device_time(jax.jit(gather), table, ids, n=10, rtt=rtt)
            bytes_moved = args.take * w * dtype.itemsize * 2  # read+write
            print(json.dumps({
                "metric": "gather_ms", "width": w, "dtype": dt,
                "value": round(sec * 1e3, 2),
                "gb_per_s": round(bytes_moved / sec / 1e9, 1),
            }), flush=True)
            del table, ids


if __name__ == "__main__":
    main()
