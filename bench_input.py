"""Host input-pipeline benchmark: parse+hash+batch rows/s (no TPU).

The ≥1M ex/s v5e-8 target (BASELINE.md) requires the host to feed ≥1M
rows/s; this measures the native reader path at several thread counts
and prints one JSON line per point plus a summary line.

Usage: python bench_input.py [--rows=2000000] [--threads=1,2,4,8]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def _write_criteo(path: str, rows: int) -> None:
    """Synthesize a criteo-shaped TSV quickly: build a 100K-row block in
    numpy-backed Python, then replicate blocks to the target size."""
    rng = np.random.default_rng(0)
    block_rows = min(rows, 100_000)
    labels = rng.integers(0, 2, size=block_rows)
    ints = rng.integers(-1, 40000, size=(block_rows, 13))
    cats = rng.integers(0, 2**32, size=(block_rows, 26))
    lines = []
    for r in range(block_rows):
        lines.append("\t".join(
            [str(labels[r])]
            + [str(x) if x >= 0 else "" for x in ints[r]]
            + [format(x, "08x") for x in cats[r]]))
    block = ("\n".join(lines) + "\n").encode()
    with open(path, "wb") as f:
        written = 0
        while written < rows:
            f.write(block)
            written += block_rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--threads", default="1,2,4,8")
    ap.add_argument("--batch", type=int, default=32768)
    args = ap.parse_args()

    from cffm_tpu.config import get_config
    from cffm_tpu.data import native
    from cffm_tpu.data.readers import criteo_batches_native_mt

    if not native.available():
        print(json.dumps({"metric": "input_rows_per_s", "value": 0,
                          "error": "native lib unavailable"}))
        return 1

    cfg = get_config("criteo_kaggle").model
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "criteo.tsv")
        t0 = time.time()
        _write_criteo(path, args.rows)
        sz = os.path.getsize(path)
        sys.stderr.write(f"wrote {sz/1e6:.0f} MB in {time.time()-t0:.1f}s\n")

        best = (0.0, 0)
        for nt in [int(x) for x in args.threads.split(",")]:
            it = criteo_batches_native_mt(path, cfg, args.batch,
                                          repeat=True, num_threads=nt)
            next(it)  # warm: threads up, first chunks parsed
            n_rows = 0
            t0 = time.time()
            while n_rows < args.rows:
                ids, _dense, _lab = next(it)
                n_rows += len(ids)
            dt = time.time() - t0
            rate = n_rows / dt
            print(json.dumps({"metric": "input_rows_per_s", "threads": nt,
                              "value": round(rate, 0),
                              "mb_per_s": round(sz / 1e6 * rate / args.rows, 1)}))
            if rate > best[0]:
                best = (rate, nt)

        # Pre-hashed .cfb path: parse cost paid once at conversion,
        # steady-state reads are memmap row-slice copies.
        from cffm_tpu.data.prehash import convert
        from cffm_tpu.data.prehashed import prehashed_batches

        cfb = os.path.join(d, "criteo.cfb")
        t0 = time.time()
        n_conv = convert(path, cfb, cfg, "criteo", chunk=args.batch)
        conv_rate = n_conv / (time.time() - t0)
        it = prehashed_batches(cfb, cfg, args.batch, shuffle=True)
        next(it)
        n_rows, t0 = 0, time.time()
        while n_rows < args.rows:
            ids, _dense, _lab = next(it)
            n_rows += len(ids)
        rate = n_rows / (time.time() - t0)
        print(json.dumps({"metric": "input_rows_per_s_prehashed",
                          "value": round(rate, 0),
                          "convert_rows_per_s": round(conv_rate, 0)}))
        if rate > best[0]:
            best = (rate, 0)

    print(json.dumps({
        "metric": "input_rows_per_s_best", "value": round(best[0], 0),
        "unit": "rows/s", "threads": best[1],
        "vs_target": round(best[0] / 1_000_000, 3),  # 1M rows/s/host
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
