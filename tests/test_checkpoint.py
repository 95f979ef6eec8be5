"""Checkpoint save/restore/resume + cross-shard-count resharding."""

import dataclasses
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from cffm_tpu import train as train_lib
from cffm_tpu.checkpoint import CheckpointManager, reshard_tables
from cffm_tpu.config import DataConfig, ModelConfig, TrainConfig
from cffm_tpu.models.cffm import field_offsets


def _cfg():
    return TrainConfig(
        name="ckpt_test",
        model=ModelConfig(
            num_fields=4, vocab_sizes=(32, 32, 32, 32), embed_dim=8,
            cross="field_aware", conv_channels=(8,), tower_hidden=(16,),
            compute_dtype="float32", use_pallas=False,
        ),
        data=DataConfig(batch_size=64),
    )


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b = cfg.data.batch_size
    ids = np.stack([rng.integers(0, v, size=b) for v in cfg.model.vocab_sizes],
                   axis=1).astype(np.int32)
    ids = jnp.asarray(ids + field_offsets(cfg.model)[None, :].astype(np.int32))
    labels = jnp.asarray((rng.random(b) < 0.4).astype(np.float32))
    return ids, labels


def test_save_restore_roundtrip():
    cfg = _cfg()
    state = train_lib.create_state(cfg, jax.random.key(0))
    ids, labels = _batch(cfg)
    state, _ = train_lib.train_step(state, ids, None, labels, cfg)

    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        mgr.save(1, state, cfg, wait=True)
        assert mgr.latest_step() == 1

        template = train_lib.create_state(cfg, jax.random.key(99))
        restored, meta = mgr.restore(template)
        mgr.close()

    assert meta["config_name"] == "ckpt_test"
    np.testing.assert_array_equal(
        np.asarray(restored.params["embed"]["table"]),
        np.asarray(state.params["embed"]["table"]))
    np.testing.assert_array_equal(
        np.asarray(restored.sparse_opt_state["embed"]["accum"]),
        np.asarray(state.sparse_opt_state["embed"]["accum"]))
    assert int(restored.step) == int(state.step)

    # resumed training must continue identically
    ids2, labels2 = _batch(cfg, seed=1)
    s_a, m_a = train_lib.train_step(state, ids2, None, labels2, cfg)
    s_b, m_b = train_lib.train_step(restored, ids2, None, labels2, cfg)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)


def test_reshard_tables_roundtrip():
    from cffm_tpu.parallel.sharded_embedding import to_mod_sharded

    cfg = _cfg()
    state = train_lib.create_state(cfg, jax.random.key(1))
    natural = np.asarray(state.params["embed"]["table"])

    # natural (1 shard) -> 4 shards -> 8 shards -> back to 1
    s4 = reshard_tables(state, cfg, 1, 4)
    s8 = reshard_tables(s4, cfg, 4, 8)
    s1 = reshard_tables(s8, cfg, 8, 1)
    np.testing.assert_array_equal(
        np.asarray(s1.params["embed"]["table"])[: natural.shape[0]], natural)


def test_restore_auto_across_shard_counts():
    """Train on T=1, checkpoint, restore onto an 8-device sharded state:
    restore_auto must re-permute the mod-sharded storage (the padded
    shapes COINCIDE here — 128 % 8 == 0 — exactly the silent-corruption
    case a blind restore would hit), and the continued loss trajectory
    must match the single-device continuation."""
    import tempfile

    from cffm_tpu.parallel.mesh import make_mesh
    from cffm_tpu.parallel.sharded_embedding import from_mod_sharded
    from cffm_tpu.parallel.sharded_train import (create_sharded_state,
                                                 make_sharded_train_step)

    cfg = _cfg()
    state = train_lib.create_state(cfg, jax.random.key(3))
    for s in range(2):
        ids, labels = _batch(cfg, seed=s)
        state, _ = train_lib.train_step(state, ids, None, labels, cfg)
    v = cfg.model.total_vocab

    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        mgr.save(2, state, cfg, num_shards=1, wait=True)

        sh_cfg = dataclasses.replace(
            cfg, sharding=dataclasses.replace(cfg.sharding, table_sharded=True))
        mesh = make_mesh(8)
        template = create_sharded_state(sh_cfg, jax.random.key(99), mesh)
        assert template.params["embed"]["table"].shape[0] == v  # shapes coincide
        restored, meta = mgr.restore_auto(template, sh_cfg, num_shards=8)
        mgr.close()

    assert meta["num_table_shards"] == 1
    nat = from_mod_sharded(np.asarray(restored.params["embed"]["table"]), 8, v)
    np.testing.assert_array_equal(nat, np.asarray(state.params["embed"]["table"]))
    nat_acc = from_mod_sharded(
        np.asarray(restored.sparse_opt_state["embed"]["accum"]), 8, v)
    np.testing.assert_array_equal(
        nat_acc, np.asarray(state.sparse_opt_state["embed"]["accum"]))

    # continued training matches the single-device trajectory
    ids3, labels3 = _batch(cfg, seed=2)
    _, m_ref = train_lib.train_step(state, ids3, None, labels3, cfg)
    step_fn = make_sharded_train_step(sh_cfg, mesh)
    _, m_sh = step_fn(restored, jax.numpy.asarray(ids3), None,
                      jax.numpy.asarray(labels3))
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=2e-5)


def test_reshard_remaps_adam_state():
    """Every table-shaped sparse-state leaf (Adam m/v, not just adagrad
    accum) must ride the same permutation as the table."""
    from cffm_tpu.config import OptimizerConfig

    cfg = dataclasses.replace(_cfg(), optim=OptimizerConfig(sparse_optimizer="adam"))
    state = train_lib.create_state(cfg, jax.random.key(2))
    ids, labels = _batch(cfg)
    state, _ = train_lib.train_step(state, ids, None, labels, cfg)  # non-zero m/v

    m_nat = np.asarray(state.sparse_opt_state["embed"]["m"])
    v_nat = np.asarray(state.sparse_opt_state["embed"]["v"])
    t_nat = int(state.sparse_opt_state["embed"]["t"])
    assert np.abs(m_nat).max() > 0

    s4 = reshard_tables(state, cfg, 1, 4)
    s1 = reshard_tables(s4, cfg, 4, 1)
    np.testing.assert_array_equal(
        np.asarray(s1.sparse_opt_state["embed"]["m"])[: m_nat.shape[0]], m_nat)
    np.testing.assert_array_equal(
        np.asarray(s1.sparse_opt_state["embed"]["v"])[: v_nat.shape[0]], v_nat)
    assert int(s1.sparse_opt_state["embed"]["t"]) == t_nat
    # in the 4-shard layout, m must be permuted exactly like the table
    tab_nat = np.asarray(state.params["embed"]["table"])
    tab_s4 = np.asarray(s4.params["embed"]["table"])
    m_s4 = np.asarray(s4.sparse_opt_state["embed"]["m"])
    row_of = {tuple(tab_nat[r]): r for r in range(tab_nat.shape[0])}
    for r in range(0, tab_s4.shape[0], 7):
        key = tuple(tab_s4[r])
        if key in row_of:
            np.testing.assert_array_equal(m_s4[r], m_nat[row_of[key]])
