"""Serving export (cffm_tpu/export.py): round-trip parity + batch
polymorphism + checkpoint-driven CLI."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cffm_tpu.config import get_config
from cffm_tpu.export import (export_scoring, load_artifact, load_scoring_fn,
                             save_artifact, scoring_fn)
from cffm_tpu.models.cffm import field_offsets
from cffm_tpu.train import create_state


def _cfg(name="movielens", **model_kw):
    cfg = get_config(name)
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_pallas=False,
                                       **model_kw))


def _ids(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    offs = field_offsets(cfg.model)
    return jnp.asarray(np.stack(
        [rng.integers(0, v, size=b) for v in cfg.model.vocab_sizes],
        axis=1).astype(np.int32) + offs[None, :].astype(np.int32))


def test_export_roundtrip_parity(tmp_path):
    cfg = _cfg()
    state = create_state(cfg, jax.random.key(0))
    blob = export_scoring(cfg, state.params, platforms=("cpu",))
    path = os.path.join(tmp_path, "m.cffm")
    save_artifact(path, blob, cfg, step=0)

    meta, exp = load_artifact(path)
    assert meta["config"] == "movielens" and meta["num_dense"] == 0
    fn = load_scoring_fn(path)

    for b in (32, 128):  # symbolic batch: one artifact, any batch size
        ids = _ids(cfg, b, seed=b)
        got = np.asarray(fn(state.params, ids))
        want = np.asarray(scoring_fn(cfg)(state.params, ids))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        assert got.shape == (b,)
        assert np.all((got > 0) & (got < 1))


def test_export_with_dense_features(tmp_path):
    cfg = _cfg("criteo_kaggle")
    # shrink vocabs so the test table is small
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, vocab_sizes=tuple([16] * 13 + [64] * 26),
            embed_dim=8, conv_channels=(8,), tower_hidden=(16,)))
    state = create_state(cfg, jax.random.key(1))
    blob = export_scoring(cfg, state.params, platforms=("cpu",))
    path = os.path.join(tmp_path, "c.cffm")
    save_artifact(path, blob, cfg)
    fn = load_scoring_fn(path)
    ids = _ids(cfg, 64)
    dense = jnp.asarray(np.random.default_rng(2).normal(size=(64, 13)),
                        jnp.float32)
    got = np.asarray(fn(state.params, ids, dense))
    want = np.asarray(scoring_fn(cfg)(state.params, ids, dense))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_export_rejects_garbage(tmp_path):
    p = os.path.join(tmp_path, "bad.cffm")
    with open(p, "wb") as f:
        f.write(b"not an artifact")
    with pytest.raises(ValueError, match="not a CFFM export"):
        load_artifact(p)


def test_export_cli_with_checkpoint(tmp_path):
    from cffm_tpu import export as export_mod
    from cffm_tpu import train as train_lib

    ckpt = os.path.join(tmp_path, "ckpt")
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, dataset="synthetic",
                                 batch_size=128, num_train_steps=3,
                                 eval_batches=1),
        checkpoint_dir=ckpt, checkpoint_every=0, log_every=100,
    )
    train_lib.run(cfg)

    out = os.path.join(tmp_path, "m.cffm")
    rc = export_mod.main([
        "--config=movielens", f"--out={out}", "--platforms=cpu",
        f"--checkpoint_dir={ckpt}", "--model.use_pallas=False",
    ])
    assert rc == 0 and os.path.exists(out)
    meta, _ = load_artifact(out)
    assert meta["step"] == 3
    fn = load_scoring_fn(out)
    state = create_state(cfg, jax.random.key(0))
    from cffm_tpu.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt)
    state, _ = mgr.restore_auto(state, cfg, num_shards=1)
    mgr.close()
    probs = np.asarray(fn(state.params, _ids(cfg, 16)))
    assert probs.shape == (16,) and np.all(np.isfinite(probs))
