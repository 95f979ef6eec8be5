"""One-shot TSV -> .cfb converter (see prehashed.py for the format).

    python -m cffm_tpu.data.prehash IN OUT --config=criteo_kaggle \
        [--dataset=criteo] [--chunk=65536]

Runs the normal streaming reader (native multi-threaded C++ parse when
available) over the WHOLE file — no split, no sharding — and streams
the hashed records out. Split/shard/shuffle are read-time decisions in
prehashed_batches, so one .cfb serves every topology.
"""

from __future__ import annotations

import argparse
import sys
import time

from cffm_tpu.config import get_config
from cffm_tpu.data.prehashed import write_prehashed


def convert(src: str, out: str, model_cfg, dataset: str,
            chunk: int = 65536, reader_threads: int = 4) -> int:
    """Parse+hash src with the `dataset` reader, write .cfb. Returns
    rows written (the final partial chunk of the source is dropped —
    same tail rule as the streaming readers' _rebatch)."""
    from cffm_tpu.data import native
    from cffm_tpu.data import readers

    kw = dict(repeat=False, split="train", val_every=0)
    if dataset == "criteo":
        if native.available() and reader_threads > 1:
            it = readers.criteo_batches_native_mt(
                src, model_cfg, chunk, num_threads=reader_threads, **kw)
        elif native.available():
            it = readers.criteo_batches_native(src, model_cfg, chunk, **kw)
        else:
            it = readers.criteo_batches(src, model_cfg, chunk, **kw)
    elif dataset == "avazu":
        if native.available() and reader_threads > 1:
            it = readers.avazu_batches_native_mt(
                src, model_cfg, chunk, num_threads=reader_threads, **kw)
        elif native.available():
            it = readers.avazu_batches_native(src, model_cfg, chunk, **kw)
        else:
            it = readers.avazu_batches(src, model_cfg, chunk, **kw)
    elif dataset == "movielens":
        it = readers.movielens_batches(src, model_cfg, chunk, **kw)
    else:
        raise ValueError(f"unknown dataset {dataset!r}")
    return write_prehashed(out, it, model_cfg.num_fields, model_cfg.num_dense)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--config", default="criteo_kaggle")
    ap.add_argument("--dataset", default=None,
                    help="criteo|avazu|movielens (default: config's)")
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args(argv)

    cfg = get_config(args.config)
    dataset = args.dataset or cfg.data.dataset
    t0 = time.time()
    n = convert(args.src, args.out, cfg.model, dataset,
                chunk=args.chunk, reader_threads=args.threads)
    dt = time.time() - t0
    print(f"wrote {n} rows to {args.out} in {dt:.1f}s "
          f"({n / max(dt, 1e-9):,.0f} rows/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
