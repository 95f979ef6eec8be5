"""Pre-hashed .cfb dataset format + shuffle-buffer tests.

Covers: conversion roundtrip bit-equality vs the streaming TSV reader,
split/shard semantics parity, per-epoch shuffle determinism + coverage,
loader auto-detection, resume-by-skip determinism, and the streaming
shuffle buffer (loader.shuffled_batches).
"""

import dataclasses
import itertools
import os

import numpy as np
import pytest

from bench_input import _write_criteo
from cffm_tpu.config import get_config
from cffm_tpu.data.loader import make_dataset, shuffled_batches
from cffm_tpu.data.prehash import convert
from cffm_tpu.data.prehashed import (is_prehashed, prehashed_batches,
                                     read_header, write_prehashed)
from cffm_tpu.data.readers import criteo_batches


@pytest.fixture(scope="module")
def criteo_cfb(tmp_path_factory):
    """A small criteo TSV and its .cfb conversion."""
    d = tmp_path_factory.mktemp("cfb")
    tsv = str(d / "criteo.tsv")
    cfb = str(d / "criteo.cfb")
    rows = 4096
    _write_criteo(tsv, rows)
    cfg = get_config("criteo_kaggle").model
    n = convert(tsv, cfb, cfg, "criteo", chunk=512, reader_threads=1)
    return tsv, cfb, cfg, n


def test_header_and_magic(criteo_cfb):
    tsv, cfb, cfg, n = criteo_cfb
    nf, nd, nrows = read_header(cfb)
    assert (nf, nd) == (cfg.num_fields, cfg.num_dense)
    assert nrows == n and n >= 4000  # tail (<512) may drop
    assert is_prehashed(cfb) and not is_prehashed(tsv)


def test_roundtrip_bit_equal_to_tsv_reader(criteo_cfb):
    """Every record in the .cfb matches the TSV reader's output exactly
    (same hashing, bucketing, dense transform, label)."""
    tsv, cfb, cfg, n = criteo_cfb
    B = 256
    ref = criteo_batches(tsv, cfg, B, repeat=False)
    got = prehashed_batches(cfb, cfg, B, repeat=False)
    count = 0
    for (ri, rd, rl), (gi, gd, gl) in zip(ref, got):
        np.testing.assert_array_equal(ri, gi)
        np.testing.assert_array_equal(rd, gd)
        np.testing.assert_array_equal(rl, gl)
        count += B
    assert count >= n - B  # both drop at most one tail batch


def test_split_and_shard_semantics_match_tsv(criteo_cfb):
    """Block-level val split + host round-robin mirror the TSV chunk
    rules (same _chunk_selector): streams are disjoint and cover."""
    _, cfb, cfg, n = criteo_cfb
    B, ve = 128, 5
    tr0 = list(prehashed_batches(cfb, cfg, B, 0, 2, repeat=False,
                                 split="train", val_every=ve))
    tr1 = list(prehashed_batches(cfb, cfg, B, 1, 2, repeat=False,
                                 split="train", val_every=ve))
    va = list(prehashed_batches(cfb, cfg, B, 0, 1, repeat=False,
                                split="val", val_every=ve))
    nblocks = n // B
    nval = nblocks // ve
    assert len(va) == nval
    assert len(tr0) + len(tr1) == nblocks - nval
    assert abs(len(tr0) - len(tr1)) <= 1  # round-robin balance
    # disjoint: fingerprint rows by the full id tuple + label
    def keys(batches):
        return {tuple(i) + (float(l_),) for i_, _, lb in batches
                for i, l_ in zip(i_, lb)}
    assert not (keys(tr0) & keys(va))
    assert not (keys(tr0) & keys(tr1))


def test_shuffle_deterministic_and_covering(criteo_cfb):
    """shuffle=True permutes blocks+rows per epoch, deterministically
    per seed, visiting every row of the split exactly once per epoch."""
    _, cfb, cfg, n = criteo_cfb
    B = 256
    a = list(itertools.islice(
        prehashed_batches(cfb, cfg, B, shuffle=True, seed=7), n // B))
    b = list(itertools.islice(
        prehashed_batches(cfb, cfg, B, shuffle=True, seed=7), n // B))
    for (ai, ad, al), (bi, bd, bl) in zip(a, b):
        np.testing.assert_array_equal(ai, bi)
    plain = list(prehashed_batches(cfb, cfg, B, repeat=False))
    # same multiset of rows, different order
    def rowset(batches):
        return sorted(tuple(r) for ids, _, _ in batches for r in ids)
    assert rowset(a) == rowset(plain)
    assert any(not np.array_equal(x[0], y[0]) for x, y in zip(a, plain))
    # epoch 2 ordering differs from epoch 1
    two = list(itertools.islice(
        prehashed_batches(cfb, cfg, B, shuffle=True, seed=7), 2 * (n // B)))
    e1, e2 = two[: n // B], two[n // B:]
    assert any(not np.array_equal(x[0], y[0]) for x, y in zip(e1, e2))
    assert rowset(e1) == rowset(e2)


def test_loader_autodetects_cfb(criteo_cfb):
    """make_dataset routes .cfb paths to the prehashed reader for any
    dataset name, applies field offsets, and honors skip_batches."""
    _, cfb, cfg_m, _ = criteo_cfb
    cfg = get_config("criteo_kaggle")
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, path=cfb, dataset="criteo", batch_size=256, val_every=0))
    it = make_dataset(cfg, prefetch=0)
    b0 = next(it)
    assert b0.ids.shape == (256, cfg_m.num_fields)
    assert b0.ids.dtype == np.int32 and b0.dense.dtype == np.float32
    # offsets applied: field 1's ids must be >= vocab_sizes[0]
    assert b0.ids[:, 1].min() >= cfg_m.vocab_sizes[0]
    # resume: skip_batches fast-forwards deterministically
    it2 = make_dataset(cfg, prefetch=0, skip_batches=1)
    b1 = next(it)
    b1s = next(it2)
    np.testing.assert_array_equal(b1.ids, b1s.ids)


def test_write_prehashed_no_dense():
    """Datasets without dense features (avazu/movielens) roundtrip."""
    import tempfile

    ids = np.arange(12, dtype=np.int32).reshape(6, 2)
    lab = np.array([0, 1, 0, 1, 1, 0], np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.cfb")
        write_prehashed(p, [(ids, None, lab)], 2, 0)
        cfg = dataclasses.replace(
            get_config("movielens").model, num_fields=2,
            vocab_sizes=(16, 16), num_dense=0)
        (gi, gd, gl), = list(prehashed_batches(p, cfg, 6, repeat=False))
        np.testing.assert_array_equal(gi, ids)
        assert gd is None
        np.testing.assert_array_equal(gl, lab)


def test_shuffled_batches_uniform_buffer():
    """The streaming shuffle buffer emits exact batches, covers every
    row exactly once, and actually reorders."""
    B, nb = 64, 32
    ids = np.arange(B * nb, dtype=np.int32).reshape(-1, 1)
    lab = np.arange(B * nb, dtype=np.float32)
    raw = [(ids[i * B:(i + 1) * B], None, lab[i * B:(i + 1) * B])
           for i in range(nb)]
    out = list(shuffled_batches(iter(raw), buffer_rows=4 * B, seed=3))
    assert all(len(o[0]) == B for o in out)
    got = np.concatenate([o[0][:, 0] for o in out])
    assert len(got) == B * nb  # nothing lost (exact multiple of B)
    np.testing.assert_array_equal(np.sort(got), ids[:, 0])
    assert not np.array_equal(got, ids[:, 0])  # actually shuffled
    # determinism
    out2 = list(shuffled_batches(iter(raw), buffer_rows=4 * B, seed=3))
    np.testing.assert_array_equal(
        got, np.concatenate([o[0][:, 0] for o in out2]))
    # tiny buffer (< batch) still works via the >= batch clamp
    out3 = list(shuffled_batches(iter(raw), buffer_rows=1, seed=0))
    assert sum(len(o[0]) for o in out3) == B * nb


def test_multifile_cfb_directory(tmp_path):
    """A directory of .cfb shards covers every row across files: repeat
    mode yields only exact batches; non-repeat (full-pass eval) mode
    also flushes each file's partial tail as a partial batch."""
    cfg = get_config("criteo_kaggle").model
    d = tmp_path / "shards"
    d.mkdir()
    sizes = [300, 257, 128]  # tails of 44, 1, 0 at bs=128
    all_rows = []
    for i, n in enumerate(sizes):
        tsv = str(tmp_path / f"s{i}.tsv")
        _write_criteo(tsv, n)
        convert(tsv, str(d / f"day_{i}.cfb"), cfg, "criteo", chunk=64,
                reader_threads=1)
        all_rows.extend(
            ids for ids, _, _ in criteo_batches(tsv, cfg, 64, repeat=False))
    want = np.concatenate(all_rows)
    assert is_prehashed(str(d))

    bs = 128
    full = list(prehashed_batches(str(d), cfg, bs, repeat=False))
    got = np.concatenate([ids for ids, _, _ in full])
    # full pass covers EVERY row, in file order
    np.testing.assert_array_equal(got, want)
    # partial tails appear exactly where files have remainders
    assert sorted(len(ids) for ids, _, _ in full) == sorted(
        [bs] * (sum(n // bs for n in sizes)) + [44, 1])

    # repeat mode: one epoch = only the full blocks of each file
    one_epoch = sum(n // bs for n in sizes)
    rep = list(itertools.islice(prehashed_batches(str(d), cfg, bs), one_epoch))
    assert all(len(ids) == bs for ids, _, _ in rep)


def test_multifile_cfb_split_and_shuffle(tmp_path):
    """Across files, the val split + per-host sharding act on the global
    block sequence, and shuffle stays deterministic per (seed, epoch)."""
    cfg = get_config("criteo_kaggle").model
    d = tmp_path / "shards"
    d.mkdir()
    for i, n in enumerate([512, 384]):
        tsv = str(tmp_path / f"s{i}.tsv")
        _write_criteo(tsv, n)
        convert(tsv, str(d / f"day_{i}.cfb"), cfg, "criteo", chunk=64,
                reader_threads=1)
    bs = 128
    tr = list(prehashed_batches(str(d), cfg, bs, repeat=False,
                                split="train", val_every=3))
    va = list(prehashed_batches(str(d), cfg, bs, repeat=False,
                                split="val", val_every=3))
    # 7 full blocks total (4 + 3): val = blocks 2, 5 -> 2 batches
    assert len(va) == 2 and len(tr) == 5
    tr_keys = {ids.tobytes() for ids, _, _ in tr}
    va_keys = {ids.tobytes() for ids, _, _ in va}
    assert not (tr_keys & va_keys)

    a = list(itertools.islice(
        prehashed_batches(str(d), cfg, bs, shuffle=True, seed=7), 7))
    b = list(itertools.islice(
        prehashed_batches(str(d), cfg, bs, shuffle=True, seed=7), 7))
    for (ai, _, _), (bi, _, _) in zip(a, b):
        np.testing.assert_array_equal(ai, bi)
