"""DCN-aware intra-host table sharding (parallel/dcn_mesh.py): a
(2 hosts x 4 chips) virtual grid must reproduce the single-device
trajectory exactly, like the flat-axis gold test."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cffm_tpu import train as train_lib
from cffm_tpu.config import (DataConfig, ModelConfig, OptimizerConfig,
                             ShardingConfig, TrainConfig)
from cffm_tpu.models.cffm import field_offsets
from cffm_tpu.parallel import sharded_embedding as se
from cffm_tpu.parallel.dcn_mesh import (create_sharded_state_2d, make_mesh_2d,
                                        make_sharded_eval_step_2d,
                                        make_sharded_train_step_2d)

H, C = 2, 4


def _cfg(batch=256):
    return TrainConfig(
        name="dcn_test",
        model=ModelConfig(
            num_fields=5, vocab_sizes=(64, 128, 256, 96, 32), embed_dim=8,
            cross="field_aware", conv_channels=(8,), conv_pool=2,
            tower_hidden=(16,), compute_dtype="float32", use_pallas=False,
        ),
        optim=OptimizerConfig(sparse_optimizer="adagrad", dense_optimizer="adam"),
        data=DataConfig(batch_size=batch),
        sharding=ShardingConfig(table_sharded=True, table_axis="intra_host"),
    )


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b = cfg.data.batch_size
    ids_local = np.stack(
        [np.minimum(rng.zipf(1.3, size=b) - 1, v - 1)
         for v in cfg.model.vocab_sizes], axis=1).astype(np.int32)
    ids = jnp.asarray(ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
    labels = jnp.asarray((rng.random(b) < 0.4).astype(np.float32))
    return ids, labels


def _replicated_state(sh_state, cfg):
    """2D-sharded state -> natural-layout single-device TrainState."""
    v = cfg.model.total_vocab
    params = jax.tree.map(np.asarray, sh_state.params)
    params["embed"]["table"] = np.asarray(
        se.from_mod_sharded(jnp.asarray(params["embed"]["table"]), C, v))
    if cfg.model.use_first_order:
        params["linear"]["table"] = np.asarray(
            se.from_mod_sharded(jnp.asarray(params["linear"]["table"]), C, v))
    sparse = jax.tree.map(np.asarray, sh_state.sparse_opt_state)
    for key in sparse:
        sparse[key]["accum"] = np.asarray(
            se.from_mod_sharded(jnp.asarray(sparse[key]["accum"]), C, v))
    return train_lib.TrainState(
        jnp.asarray(np.asarray(sh_state.step)),
        jax.tree.map(jnp.asarray, params),
        jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), sh_state.dense_opt_state),
        jax.tree.map(jnp.asarray, sparse))


def test_2d_step_matches_single_device(eight_devices):
    cfg = _cfg()
    mesh = make_mesh_2d(H, C)
    state = create_sharded_state_2d(cfg, jax.random.key(0), mesh)
    ref_state = _replicated_state(state, cfg)

    step = make_sharded_train_step_2d(cfg, mesh)
    ids, labels = _batch(cfg)
    new_sh, m_sh = step(state, ids, None, labels)
    new_ref, m_ref = train_lib.train_step(ref_state, ids, None, labels, cfg)

    assert int(m_sh["overflow"]) == 0
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5)

    v = cfg.model.total_vocab
    got_t = np.asarray(se.from_mod_sharded(new_sh.params["embed"]["table"], C, v))
    want_t = np.asarray(new_ref.params["embed"]["table"])
    np.testing.assert_allclose(got_t, want_t, rtol=1e-4, atol=1e-6)
    got_a = np.asarray(se.from_mod_sharded(
        new_sh.sparse_opt_state["embed"]["accum"], C, v))
    want_a = np.asarray(new_ref.sparse_opt_state["embed"]["accum"])
    np.testing.assert_allclose(got_a, want_a, rtol=1e-4, atol=1e-6)
    got_w = np.asarray(new_sh.params["tower"][0]["w"])
    want_w = np.asarray(new_ref.params["tower"][0]["w"])
    np.testing.assert_allclose(got_w, want_w, rtol=1e-4, atol=1e-6)


def test_2d_multi_step_and_eval(eight_devices):
    from cffm_tpu import metrics

    cfg = _cfg()
    mesh = make_mesh_2d(H, C)
    state = create_sharded_state_2d(cfg, jax.random.key(1), mesh)
    step = make_sharded_train_step_2d(cfg, mesh)
    losses = []
    for i in range(8):
        ids, labels = _batch(cfg, seed=i)
        state, m = step(state, ids, None, labels)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    eval_step = make_sharded_eval_step_2d(cfg, mesh)
    auc_state = metrics.auc_state_init()
    ids, labels = _batch(cfg, seed=100)
    auc_state = eval_step(state, auc_state, ids, None, labels)
    out = metrics.auc_state_finalize(auc_state)
    assert 0.0 <= float(out["auc"]) <= 1.0
    assert float(out["count"]) == cfg.data.batch_size


def test_2d_rejects_sparse_adam(eight_devices):
    import pytest

    cfg = _cfg()
    cfg = dataclasses.replace(cfg, optim=OptimizerConfig(sparse_optimizer="adam"))
    mesh = make_mesh_2d(H, C)
    with pytest.raises(AssertionError, match="dense-form"):
        make_sharded_train_step_2d(cfg, mesh)
