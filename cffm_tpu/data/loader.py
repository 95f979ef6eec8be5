"""Batcher / host-sharder: dataset name -> iterator of device-ready batches.

Applies per-field vocab offsets (single combined table space), casts to
the on-device layout, and shards by host (SURVEY.md L6: per-host batch
shards). Falls back to the synthetic generator when no data path is
configured or present — this environment has no network, so real
Criteo/Avazu files are optional.
"""

from __future__ import annotations

import itertools
import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np

from cffm_tpu.config import TrainConfig
from cffm_tpu.data.readers import (avazu_batches, avazu_batches_native,
                                   avazu_batches_native_mt, criteo_batches,
                                   criteo_batches_native,
                                   criteo_batches_native_mt,
                                   movielens_batches)
from cffm_tpu.data.synthetic import SyntheticCTR
from cffm_tpu.models.cffm import field_offsets


class Batch(dict):
    """dict with attribute access: ids (B,F) int32 global, dense, labels."""

    __getattr__ = dict.__getitem__


def shuffled_batches(raw, buffer_rows: int, seed: int = 0):
    """Uniform shuffle-buffer over a stream of exact-size batches.

    Vectorized equivalent of tf.data's element-wise reservoir: keep a
    `buffer_rows` pool; for each incoming batch of B rows, emit B rows
    drawn (without replacement) from uniformly random pool positions and
    write the incoming rows into those slots. Emission starts once the
    pool is full; on stream end the pool flushes in permuted order as
    full batches (the final partial batch is dropped, matching
    readers._rebatch's tail rule).
    """
    rng = np.random.default_rng(seed)
    raw = iter(raw)
    first = next(raw, None)
    if first is None:
        return
    batch = len(first[0])
    buffer_rows = max(buffer_rows, batch)  # must hold >= one emit's worth
    has_dense = first[1] is not None

    def split_rows(pool, pos):
        out = tuple(None if c is None else c[pos] for c in pool)
        return out

    pool = None
    for item in itertools.chain([first], raw):
        ids, dense, label = item
        if pool is None or len(pool[0]) < buffer_rows:
            cols = (ids, dense if has_dense else None, label)
            if pool is None:
                pool = tuple(None if c is None else np.array(c) for c in cols)
            else:
                pool = tuple(
                    None if c is None else np.concatenate([p, c])
                    for p, c in zip(pool, cols))
            continue
        pos = rng.choice(len(pool[0]), size=batch, replace=False)
        yield split_rows(pool, pos)
        pool[0][pos] = ids
        if has_dense:
            pool[1][pos] = dense
        pool[2][pos] = label
    if pool is not None:
        perm = rng.permutation(len(pool[0]))
        for s in range(0, len(perm) - batch + 1, batch):
            yield split_rows(pool, perm[s:s + batch])


def downsampled_batches(raw, keep_rate: float, seed: int = 0):
    """Negative downsampling over a stream of exact-size batches.

    Keeps every positive, keeps each negative with probability
    keep_rate, and re-accumulates survivors into exact-size batches
    (static shapes for the jit'd step). The standard production-CTR
    trick for class-imbalanced streams; the model then over-predicts by
    odds 1/keep_rate, corrected at eval/serving by adding
    ln(keep_rate) to the logit (metrics.calibration_offset).
    """
    rng = np.random.default_rng(seed)
    pool = None
    batch = None
    for ids, dense, labels in raw:
        if batch is None:
            batch = len(labels)
        keep = (labels > 0.5) | (rng.random(len(labels)) < keep_rate)
        cols = (ids[keep], None if dense is None else dense[keep],
                labels[keep])
        pool = cols if pool is None else tuple(
            None if c is None else np.concatenate([p, c])
            for p, c in zip(pool, cols))
        while len(pool[2]) >= batch:
            yield tuple(None if c is None else c[:batch] for c in pool)
            pool = tuple(None if c is None else c[batch:] for c in pool)


def _raw_iterator(cfg: TrainConfig, process_index: int, process_count: int,
                  split: str = "train", repeat: bool = True):
    it = _raw_iterator_inner(cfg, process_index, process_count,
                             split=split, repeat=repeat)
    r = cfg.data.neg_downsample
    if split == "train" and 0.0 < r < 1.0:
        # train stream only — eval/serving see the true distribution
        it = downsampled_batches(it, r, seed=cfg.data.seed + process_index)
    return it


def _raw_iterator_inner(cfg: TrainConfig, process_index: int,
                        process_count: int,
                        split: str = "train", repeat: bool = True):
    d = cfg.data
    # path may be a file, a directory of files (full Criteo's
    # day_0..day_23), or a glob — readers.resolve_paths expands it
    from cffm_tpu.data.readers import resolve_paths
    path_ok = d.path is not None and bool(resolve_paths(d.path))
    per_host = d.batch_size // process_count
    ve = d.val_every
    if path_ok:
        from cffm_tpu.data.prehashed import is_prehashed, prehashed_batches
        if d.dataset == "prehashed" or (
                d.dataset != "movielens" and is_prehashed(d.path)):
            # Pre-hashed .cfb fast path: parse/hash already paid at
            # conversion; shuffle only the train stream (eval order is
            # irrelevant and determinism simplifies AUC comparisons).
            return prehashed_batches(
                d.path, cfg.model, per_host, process_index, process_count,
                split=split, val_every=ve, repeat=repeat,
                shuffle=d.shuffle and split == "train", seed=d.seed)
    def maybe_shuffle(it):
        if d.shuffle and split == "train" and d.shuffle_buffer > 0:
            return shuffled_batches(it, d.shuffle_buffer, seed=d.seed)
        return it

    if d.dataset == "criteo" and path_ok:
        from cffm_tpu.data import native
        if native.available() and d.reader_threads > 1:
            return maybe_shuffle(criteo_batches_native_mt(
                d.path, cfg.model, per_host, process_index, process_count,
                split=split, val_every=ve, repeat=repeat,
                num_threads=d.reader_threads))
        reader = criteo_batches_native if native.available() else criteo_batches
        return maybe_shuffle(
            reader(d.path, cfg.model, per_host, process_index, process_count,
                   split=split, val_every=ve, repeat=repeat))
    if d.dataset == "avazu" and path_ok:
        from cffm_tpu.data import native
        if native.available() and d.reader_threads > 1:
            return maybe_shuffle(avazu_batches_native_mt(
                d.path, cfg.model, per_host, process_index, process_count,
                split=split, val_every=ve, repeat=repeat,
                num_threads=d.reader_threads))
        reader = avazu_batches_native if native.available() else avazu_batches
        return maybe_shuffle(
            reader(d.path, cfg.model, per_host, process_index, process_count,
                   split=split, val_every=ve, repeat=repeat))
    if d.dataset == "movielens" and path_ok:
        return movielens_batches(d.path, cfg.model, per_host,
                                 seed=d.seed + process_index,
                                 split=split, val_every=ve, repeat=repeat)
    # Synthetic: all hosts/splits share one planted WORLD (seed); each
    # host draws its own sample stream, and the val stream is disjoint
    # from every host's train stream by a large seed offset.
    stream = d.seed + process_index + (104729 if split == "val" else 0)
    return iter(SyntheticCTR(cfg.model, per_host, seed=d.seed,
                             stream_seed=stream))


def device_prefetch(batches: Iterator[dict], to_device, depth: int = 2):
    """Stage batches on device from a background thread.

    jax puts are async-dispatched, but issuing them from the training
    loop still serializes transfer SETUP with step dispatch; a staging
    thread keeps `depth` device-resident batches ahead so the H2D
    transfer fully overlaps the previous step's compute.

    Yield shape mirrors the input stream: (ids, dense, labels) device
    tuples for raw batches, or the packed-wire dict (key "wire",
    see data/wire.py) when the loader runs wire_format="packed" —
    callers must key on the dict case, not assume tuples.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def producer():
        try:
            for b in batches:
                if stop.is_set():
                    return
                if "wire" in b:
                    # packed wire batch (data/wire.py): stage each
                    # component array; the jit'd step unpacks on device
                    q.put({k: to_device(v) for k, v in b["wire"].items()})
                else:
                    q.put((to_device(b["ids"]), to_device(b["dense"]),
                           to_device(b["labels"])))
        finally:
            q.put(None)

    threading.Thread(target=producer, daemon=True).start()

    def consumer():
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    return consumer()


def make_dataset(
    cfg: TrainConfig,
    process_index: int = 0,
    process_count: int = 1,
    prefetch: int = 2,
    split: str = "train",
    skip_batches: int = 0,
    repeat: bool = True,
) -> Iterator[Batch]:
    """Device-ready batches for this host, with a background prefetch thread.

    split="val" yields the held-out stream (cfg.data.val_every).
    repeat=False ends the stream after one pass (full-pass eval); the
    final batch may be PARTIAL (< batch_size rows). The synthetic
    generator is infinite and ignores repeat — callers must bound it.
    skip_batches fast-forwards the stream (deterministic resume: skip
    the batches consumed before the restored step; SURVEY.md §6)."""
    offsets = field_offsets(cfg.model)[None, :].astype(np.int32)
    raw = _raw_iterator(cfg, process_index, process_count, split=split,
                        repeat=repeat)
    for _ in range(skip_batches):
        next(raw)

    packed = cfg.data.wire_format == "packed" and split == "train" and repeat
    if packed:
        # Packed wire (data/wire.py): LOCAL ids in narrow dtypes; the
        # jit'd step unpacks and applies field offsets on device. Only
        # the repeat-mode train stream packs — eval streams may end
        # with a partial batch and feed eval_step's raw signature.
        from cffm_tpu.data import wire as wire_lib
        spec = wire_lib.spec_for_model(cfg.model)

        def to_batch(item) -> Batch:
            ids, dense, labels = item
            return Batch(wire=wire_lib.pack(ids, dense, labels, spec))
    else:
        def to_batch(item) -> Batch:
            ids, dense, labels = item
            return Batch(
                ids=(ids + offsets).astype(np.int32),
                dense=None if dense is None else dense.astype(np.float32),
                labels=labels.astype(np.float32),
            )

    if prefetch <= 0:
        return (to_batch(x) for x in raw)

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def producer():
        try:
            for item in raw:
                if stop.is_set():
                    return
                q.put(to_batch(item))
        finally:
            q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    def consumer():
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    return consumer()
