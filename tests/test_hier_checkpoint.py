"""Hier <-> flat checkpoint interchangeability: the hierarchical layout
uses the SAME flat mod-sharded table storage (sharded_train.
create_sharded_state docstring), so a checkpoint written under one
exchange must restore bit-identically under the other and train on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cffm_tpu.checkpoint import CheckpointManager
from cffm_tpu.parallel.dcn_mesh import make_mesh_2d
from cffm_tpu.parallel.mesh import make_mesh
from cffm_tpu.parallel.sharded_train import (
    create_sharded_state, make_sharded_train_step,
    make_sharded_train_step_hier)
from tests.test_hier_train import _batch, _cfg

H, C = 2, 4
T = H * C


def test_hier_checkpoint_restores_into_flat_and_back(tmp_path):
    cfg = _cfg()
    mesh2d = make_mesh_2d(H, C)
    mesh_flat = make_mesh(T)

    # train 2 hier steps, save
    state_h = create_sharded_state(cfg, jax.random.key(9), mesh2d,
                                   table_pspec=P(("host", "chip"), None))
    step_h = make_sharded_train_step_hier(cfg, mesh2d)
    for s in range(2):
        ids, labels = _batch(cfg, seed=s)
        state_h, _ = step_h(state_h, ids, None, labels)
    table_h = np.asarray(state_h.params["embed"]["table"])

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(2, state_h, cfg, num_shards=T, wait=True)

    # restore into the FLAT layout: same shard count, same storage —
    # bit-identical tables + optimizer state
    state_f = create_sharded_state(cfg, jax.random.key(0), mesh_flat)
    restored, meta = mgr.restore_auto(state_f, cfg, num_shards=T)
    assert int(meta["num_table_shards"]) == T
    np.testing.assert_array_equal(
        np.asarray(restored.params["embed"]["table"]), table_h)
    np.testing.assert_array_equal(
        np.asarray(restored.sparse_opt_state["embed"]["accum"]),
        np.asarray(state_h.sparse_opt_state["embed"]["accum"]))
    assert int(restored.step) == int(state_h.step)

    # the flat step trains on from the hier checkpoint, and produces
    # the SAME next state a continued hier run would (f32 allclose;
    # dedup-sum association differs between the exchanges)
    step_f = make_sharded_train_step(cfg, mesh_flat)
    ids, labels = _batch(cfg, seed=7)
    cont_f, mf = step_f(restored, ids, None, labels)
    cont_h, mh = step_h(state_h, ids, None, labels)
    np.testing.assert_allclose(float(mf["loss"]), float(mh["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cont_f.params["embed"]["table"]),
        np.asarray(cont_h.params["embed"]["table"]), rtol=1e-5, atol=1e-6)


def test_multihost_config_hier_step_runs_on_virtual_mesh(eight_devices):
    """Config-level integration: get_config('multihost') — hier
    exchange + measured-occupancy cap_rows — compiles and runs a
    finite step at test shapes on the 2x4 virtual mesh (the hard caps
    bind below the measured caps at tiny batches)."""
    import dataclasses

    from cffm_tpu.config import get_config
    from cffm_tpu.models.cffm import field_offsets

    cfg = get_config("multihost")
    assert cfg.sharding.table_axis == "hier"
    assert cfg.sharding.cap_rows > 0 and cfg.sharding.cap_rows_host > 0
    # scale the model down (26M rows don't fit a CPU test) but KEEP the
    # sharding block verbatim — the caps under test
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, vocab_sizes=tuple([64] * 13 + [512] * 26),
            table_dtype="float32", compute_dtype="float32",
            use_pallas=False),
        data=dataclasses.replace(cfg.data, batch_size=256))
    mesh2d = make_mesh_2d(H, C)
    state = create_sharded_state(cfg, jax.random.key(0), mesh2d,
                                 table_pspec=P(("host", "chip"), None))
    step = make_sharded_train_step_hier(cfg, mesh2d)
    rng = np.random.default_rng(0)
    b = cfg.data.batch_size
    ids_local = np.stack(
        [rng.integers(0, v, size=b) for v in cfg.model.vocab_sizes],
        axis=1).astype(np.int32)
    ids = jnp.asarray(
        ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
    dense = jnp.asarray(rng.normal(size=(b, cfg.model.num_dense)),
                        jnp.float32)
    labels = jnp.asarray((rng.random(b) < 0.3).astype(np.float32))
    state, m = step(state, ids, dense, labels)
    assert np.isfinite(float(m["loss"]))
    assert int(m["overflow"]) == 0
