"""LR schedule (warmup + cosine/linear decay): factor math and its
exact equivalence to a rescaled base LR, on both the single-device and
the sharded train steps (the dense optax path and the sparse per-row
path must ride one curve)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cffm_tpu.config import get_config
from cffm_tpu.optim.rowwise import schedule_factor


def _cfg(**optim_kw):
    cfg = get_config("movielens")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, use_pallas=False,
                                  compute_dtype="float32"),
        data=dataclasses.replace(cfg.data, batch_size=64,
                                 num_train_steps=100),
        optim=dataclasses.replace(cfg.optim, **optim_kw),
    )


def test_schedule_factor_math():
    opt = _cfg(lr_schedule="cosine", warmup_steps=10, decay_steps=100,
               end_lr_factor=0.1).optim
    # warmup ramp: (s+1)/10
    assert np.isclose(float(schedule_factor(opt, 0, 100)), 0.1)
    assert np.isclose(float(schedule_factor(opt, 4, 100)), 0.5)
    assert np.isclose(float(schedule_factor(opt, 9, 100)), 1.0)
    # cosine end: factor -> end_lr_factor at decay_steps
    assert np.isclose(float(schedule_factor(opt, 100, 100)), 0.1)
    # midpoint of [warm, total]: 0.1 + 0.9 * 0.5
    assert np.isclose(float(schedule_factor(opt, 55, 100)), 0.55)

    lin = dataclasses.replace(opt, lr_schedule="linear")
    assert np.isclose(float(schedule_factor(lin, 55, 100)), 0.55)
    assert np.isclose(float(schedule_factor(lin, 100, 100)), 0.1)

    const = dataclasses.replace(opt, lr_schedule="constant", warmup_steps=0)
    assert float(schedule_factor(const, 0, 100)) == 1.0
    assert float(schedule_factor(const, 99, 100)) == 1.0

    # decay_steps=0 falls back to total_steps
    fb = dataclasses.replace(opt, decay_steps=0)
    assert np.isclose(float(schedule_factor(fb, 100, 100)), 0.1)


def test_warmup_equals_rescaled_lr_single_device():
    """One step at warmup factor f == one step with base LRs scaled by
    f (adam/adagrad updates are linear in LR; accumulators LR-free)."""
    from cffm_tpu.train import create_state, train_step

    cfg_sched = _cfg(lr_schedule="linear", warmup_steps=4)
    f = 0.25  # factor at step 0
    cfg_scaled = _cfg(
        dense_lr=cfg_sched.optim.dense_lr * f,
        sparse_lr=cfg_sched.optim.sparse_lr * f)

    rng = np.random.default_rng(0)
    from cffm_tpu.models.cffm import field_offsets
    ids = (np.stack([rng.integers(0, v, size=64)
                     for v in cfg_sched.model.vocab_sizes], axis=1)
           .astype(np.int32)
           + field_offsets(cfg_sched.model)[None, :].astype(np.int32))
    labels = (rng.random(64) < 0.4).astype(np.float32)

    s1 = create_state(cfg_sched, jax.random.key(0))
    s2 = create_state(cfg_scaled, jax.random.key(0))
    n1, _ = train_step(s1, jnp.asarray(ids), None, jnp.asarray(labels),
                       cfg_sched)
    n2, _ = train_step(s2, jnp.asarray(ids), None, jnp.asarray(labels),
                       cfg_scaled)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        n1.params, n2.params)


def test_schedule_in_sharded_step_matches_single_device():
    """The sharded step computes the same schedule factor from the same
    step counter: after 3 steps with warmup+cosine, sharded == single."""
    from cffm_tpu.parallel.mesh import make_mesh
    from cffm_tpu.parallel.sharded_train import (create_sharded_state,
                                                 make_sharded_train_step)
    from cffm_tpu.train import create_state, train_step

    cfg = _cfg(lr_schedule="cosine", warmup_steps=2, end_lr_factor=0.2)
    cfg = dataclasses.replace(
        cfg, sharding=dataclasses.replace(cfg.sharding, table_sharded=True))

    rng = np.random.default_rng(1)
    from cffm_tpu.models.cffm import field_offsets
    offs = field_offsets(cfg.model)[None, :].astype(np.int32)

    mesh = make_mesh(8)
    st_sh = create_sharded_state(cfg, jax.random.key(3), mesh)
    step_sh = make_sharded_train_step(cfg, mesh)
    # same weights in natural layout (sharded init permutes storage);
    # deep copy — step_sh donates st_sh's buffers
    from cffm_tpu.checkpoint import reshard_tables
    st_1 = jax.tree.map(lambda x: jnp.array(np.asarray(x)),
                        reshard_tables(st_sh, cfg, 8, 1))

    for i in range(3):
        ids = (np.stack([rng.integers(0, v, size=64)
                         for v in cfg.model.vocab_sizes], axis=1)
               .astype(np.int32) + offs)
        labels = (rng.random(64) < 0.4).astype(np.float32)
        st_sh, m_sh = step_sh(st_sh, jnp.asarray(ids), None,
                              jnp.asarray(labels))
        st_1, m_1 = train_step(st_1, jnp.asarray(ids), None,
                               jnp.asarray(labels), cfg)
        np.testing.assert_allclose(float(m_sh["loss"]), float(m_1["loss"]),
                                   rtol=1e-5)
    # sharded storage is mod-permuted (and row-padded to a multiple of
    # T): compare through the resharder's natural layout
    st_nat = reshard_tables(st_sh, cfg, 8, 1)
    np.testing.assert_allclose(
        np.asarray(st_nat.params["embed"]["table"]),
        np.asarray(st_1.params["embed"]["table"]), rtol=2e-5, atol=1e-6)
