"""Held-out train/val split (SURVEY.md §5.4): eval must consume
examples never trained on, across every reader family."""

import dataclasses

import numpy as np
import pytest

from cffm_tpu.config import DataConfig, ModelConfig, TrainConfig, get_config
from cffm_tpu.data.loader import make_dataset
from cffm_tpu.data.readers import (_chunk_selector, criteo_batches,
                                   movielens_batches)
from cffm_tpu.data.synthetic import SyntheticCTR


def test_chunk_selector_partitions_and_balances():
    val_every, num_shards, n_chunks = 5, 2, 100
    takes = {}
    for split in ("train", "val"):
        for shard in range(num_shards):
            take = _chunk_selector(split, val_every, shard, num_shards)
            takes[(split, shard)] = {i for i in range(n_chunks) if take(i)}
    val = takes[("val", 0)] | takes[("val", 1)]
    train = takes[("train", 0)] | takes[("train", 1)]
    assert len(val) == n_chunks // val_every
    assert not (val & train)
    assert val | train == set(range(n_chunks))
    # host round-robin balanced within each split, no overlap across hosts
    for split in ("train", "val"):
        a, b = takes[(split, 0)], takes[(split, 1)]
        assert not (a & b)
        assert abs(len(a) - len(b)) <= 1


@pytest.fixture()
def criteo_file(tmp_path):
    rng = np.random.default_rng(7)
    lines = []
    for _ in range(300):
        label = rng.integers(0, 2)
        ints = [str(rng.integers(0, 5000)) for _ in range(13)]
        cats = [f"{rng.integers(0, 2**32):08x}" for _ in range(26)]
        lines.append("\t".join([str(label)] + ints + cats))
    p = tmp_path / "criteo.tsv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _row_keys(batches):
    keys = set()
    for ids, _dense, _lab in batches:
        for r in ids:
            keys.add(tuple(int(x) for x in r[13:]))  # 26 hashed cats: unique whp
    return keys


def test_criteo_split_disjoint(criteo_file):
    cfg = get_config("criteo_kaggle").model
    bs, ve = 30, 5
    train = _row_keys(criteo_batches(criteo_file, cfg, bs, repeat=False,
                                     split="train", val_every=ve))
    val = _row_keys(criteo_batches(criteo_file, cfg, bs, repeat=False,
                                   split="val", val_every=ve))
    every = _row_keys(criteo_batches(criteo_file, cfg, bs, repeat=False))
    assert train and val
    assert not (train & val)
    assert (train | val) <= every
    # only a sub-batch_size tail may be missing from either split
    assert len(every) - len(train | val) < bs
    assert len(val) == 60  # chunks 4 and 9 of 10 x 30-row chunks


def test_movielens_split_disjoint(tmp_path):
    rng = np.random.default_rng(3)
    (tmp_path / "users.dat").write_bytes(b"".join(
        b"%d::%s::%d::%d::9%04d\n" % (u, b"M" if u % 2 else b"F",
                                      (18, 25, 35)[u % 3], u % 21, u)
        for u in range(1, 41)))
    (tmp_path / "movies.dat").write_bytes(b"".join(
        b"%d::T%d::Comedy|Drama\n" % (m, m) for m in range(1, 31)))
    # unique (user, movie) per rating row so rows are fingerprintable
    (tmp_path / "ratings.dat").write_bytes(b"".join(
        b"%d::%d::%d::9780%05d\n" % (1 + i % 40, 1 + i // 40,
                                     int(rng.integers(1, 6)), i)
        for i in range(400)))
    cfg = ModelConfig(num_fields=7, vocab_sizes=(64, 64, 2, 8, 22, 64, 19),
                      embed_dim=4, conv_channels=(4,), tower_hidden=(8,),
                      use_pallas=False)
    bs, ve = 20, 10

    def pairs(split):
        out = set()
        it = movielens_batches(str(tmp_path), cfg, bs, repeat=False,
                               split=split, val_every=ve)
        for ids, _d, _l in it:
            out |= {(int(a), int(b)) for a, b in ids[:, :2]}
        return out

    train, val = pairs("train"), pairs("val")
    assert len(val) == 40 and len(train) == 360  # 400 rows, every 10th out
    assert not (train & val)


def test_synthetic_val_shares_world_draws_disjoint_stream():
    cfg = ModelConfig(num_fields=4, vocab_sizes=(64,) * 4, embed_dim=4,
                      conv_channels=(4,), tower_hidden=(8,), use_pallas=False)
    tr = SyntheticCTR(cfg, 32, seed=5, stream_seed=5)
    va = SyntheticCTR(cfg, 32, seed=5, stream_seed=5 + 104729)
    for a, b in zip(tr._latents, va._latents):
        np.testing.assert_array_equal(a, b)  # same planted world
    np.testing.assert_array_equal(tr._pair_w, va._pair_w)
    ta, _, _ = tr.next_batch()
    vb, _, _ = va.next_batch()
    assert not np.array_equal(ta, vb)  # different sample stream


def test_make_dataset_val_split_differs_and_skip_batches():
    cfg = TrainConfig(
        name="t", model=ModelConfig(
            num_fields=3, vocab_sizes=(32, 32, 32), embed_dim=4,
            conv_channels=(4,), tower_hidden=(8,), use_pallas=False),
        data=DataConfig(batch_size=16))
    tr = make_dataset(cfg, prefetch=0)
    va = make_dataset(cfg, prefetch=0, split="val")
    b_tr, b_va = next(tr), next(va)
    assert not np.array_equal(b_tr["ids"], b_va["ids"])

    # skip_batches=2 fast-forwards deterministically
    a = make_dataset(cfg, prefetch=0)
    next(a), next(a)
    third = next(a)
    b = make_dataset(cfg, prefetch=0, skip_batches=2)
    np.testing.assert_array_equal(third["ids"], next(b)["ids"])


@pytest.mark.slow
def test_full_pass_eval_covers_entire_val_split(tmp_path):
    """eval_batches=0 on a real dataset: run() evaluates EVERY held-out
    example exactly once (partial tail included via masked padding) —
    the reference-style full-test-set AUC."""
    import dataclasses
    import json

    from bench_input import _write_criteo
    from cffm_tpu import train as train_lib
    from cffm_tpu.config import get_config
    from cffm_tpu.data.prehash import convert

    rows = 3000
    tsv = str(tmp_path / "c.tsv")
    cfb = str(tmp_path / "c.cfb")
    _write_criteo(tsv, rows)
    cfg = get_config("criteo_kaggle")
    n = convert(tsv, cfb, cfg.model, "criteo", chunk=500, reader_threads=1)
    assert n == rows
    bs, ve = 256, 4
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, use_pallas=False,
                                  compute_dtype="float32"),
        data=dataclasses.replace(cfg.data, path=cfb, dataset="criteo",
                                 batch_size=bs, num_train_steps=2,
                                 val_every=ve, eval_batches=0),
    )
    logs = []
    res = train_lib.run(cfg, log_fn=lambda s: logs.append(json.loads(s)))
    # val split = every ve-th block of bs rows; in non-repeat mode the
    # .cfb reader yields the file's 184-row tail as partial block 11,
    # which lands in the val split (11 % 4 == 3): 256 + 256 + 184
    want = 0
    nfull, tail = rows // bs, rows % bs
    for blk in range(nfull + (1 if tail else 0)):
        if blk % ve == ve - 1:
            want += bs if blk < nfull else tail
    assert res["count"] == want == 696, (res, want)
    assert np.isfinite(res["logloss"])


@pytest.mark.slow
def test_full_pass_eval_pads_partial_tail(tmp_path, monkeypatch):
    """Full-pass eval through the python TSV reader: the flushed
    partial tail batch pads to the static shape with mask=0 rows, so
    the count equals the exact held-out row total (incl. the tail)."""
    import dataclasses
    import json

    from bench_input import _write_criteo
    from cffm_tpu import train as train_lib
    from cffm_tpu.config import get_config
    from cffm_tpu.data import native

    monkeypatch.setattr(native, "available", lambda: False)
    rows, bs, ve = 3000, 256, 4
    tsv = str(tmp_path / "c.tsv")
    _write_criteo(tsv, rows)
    cfg = get_config("criteo_kaggle")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, use_pallas=False,
                                  compute_dtype="float32"),
        data=dataclasses.replace(cfg.data, path=tsv, dataset="criteo",
                                 batch_size=bs, num_train_steps=2,
                                 val_every=ve, eval_batches=0),
    )
    res = train_lib.run(cfg, log_fn=lambda s: None)
    # python reader chunks = bs lines: chunks 0..11 (last = 184 rows);
    # val chunks are idx 3, 7, 11 -> 256 + 256 + 184 = 696 rows, the
    # 184-row tail flushing as a partial batch padded by mask
    assert res["count"] == 696, res
    assert np.isfinite(res["logloss"])


def test_val_every_zero_reuses_train_stream(tmp_path, monkeypatch):
    """val_every=0: the val stream equals the train stream (documented
    smoke behavior) instead of coming back empty."""
    from cffm_tpu.config import get_config
    from cffm_tpu.data.readers import criteo_batches

    from bench_input import _write_criteo

    tsv = str(tmp_path / "c0.tsv")
    _write_criteo(tsv, 512)
    cfg = get_config("criteo_kaggle").model
    tr = list(criteo_batches(tsv, cfg, 128, repeat=False, split="train",
                             val_every=0))
    va = list(criteo_batches(tsv, cfg, 128, repeat=False, split="val",
                             val_every=0))
    assert len(va) == len(tr) == 4
    np.testing.assert_array_equal(tr[0][0], va[0][0])
