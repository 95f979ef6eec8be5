"""Sharded SPMD train step vs single-device reference (the gold test):
same batch, same init -> same loss trajectory and same tables."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cffm_tpu import train as train_lib
from cffm_tpu.config import (DataConfig, ModelConfig, OptimizerConfig,
                             ShardingConfig, TrainConfig)
from cffm_tpu.models.cffm import field_offsets
from cffm_tpu.parallel import sharded_embedding as se
from cffm_tpu.parallel.mesh import make_mesh
from cffm_tpu.parallel.sharded_train import (create_sharded_state,
                                             make_sharded_eval_step,
                                             make_sharded_train_step)

T = 8


def _cfg(batch=256):
    return TrainConfig(
        name="test",
        model=ModelConfig(
            num_fields=5,
            vocab_sizes=(64, 128, 256, 96, 32),
            embed_dim=8,
            cross="field_aware",
            conv_channels=(8,),
            conv_pool=2,
            tower_hidden=(16,),
            compute_dtype="float32",
            use_pallas=False,
        ),
        optim=OptimizerConfig(sparse_optimizer="adagrad", dense_optimizer="adam"),
        data=DataConfig(batch_size=batch),
        sharding=ShardingConfig(table_sharded=True),
    )


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b = cfg.data.batch_size
    ids_local = np.stack(
        [np.minimum(rng.zipf(1.3, size=b) - 1, v - 1) for v in cfg.model.vocab_sizes],
        axis=1,
    ).astype(np.int32)
    ids = jnp.asarray(ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
    labels = jnp.asarray((rng.random(b) < 0.4).astype(np.float32))
    return ids, labels


def _replicated_state_from_sharded(sh_state, cfg, t):
    """Convert sharded state to the natural layout for the reference step."""
    v = cfg.model.total_vocab
    params = jax.tree.map(np.asarray, sh_state.params)
    params["embed"]["table"] = np.asarray(
        se.from_mod_sharded(jnp.asarray(params["embed"]["table"]), t, v))
    if cfg.model.use_first_order:
        params["linear"]["table"] = np.asarray(
            se.from_mod_sharded(jnp.asarray(params["linear"]["table"]), t, v))
    sparse = jax.tree.map(np.asarray, sh_state.sparse_opt_state)
    for key in sparse:
        sparse[key]["accum"] = np.asarray(
            se.from_mod_sharded(jnp.asarray(sparse[key]["accum"]), t, v))
    params_j = jax.tree.map(jnp.asarray, params)
    sparse_j = jax.tree.map(jnp.asarray, sparse)
    dense_opt = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), sh_state.dense_opt_state)
    return train_lib.TrainState(jnp.asarray(np.asarray(sh_state.step)),
                                params_j, dense_opt, sparse_j)


@pytest.mark.parametrize("use_first_order", [True, False])
def test_sharded_step_matches_reference(eight_devices, use_first_order):
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_first_order=use_first_order))
    mesh = make_mesh(8)
    state = create_sharded_state(cfg, jax.random.key(0), mesh)
    ref_state = _replicated_state_from_sharded(state, cfg, T)

    step = make_sharded_train_step(cfg, mesh)
    ids, labels = _batch(cfg)

    new_sh, m_sh = step(state, ids, None, labels)
    new_ref, m_ref = train_lib.train_step(ref_state, ids, None, labels, cfg)

    assert int(m_sh["overflow"]) == 0
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5)

    # dense params identical
    got = np.asarray(new_sh.params["tower"][0]["w"])
    want = np.asarray(new_ref.params["tower"][0]["w"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    # tables identical after un-permuting
    v = cfg.model.total_vocab
    got_t = np.asarray(se.from_mod_sharded(new_sh.params["embed"]["table"], T, v))
    want_t = np.asarray(new_ref.params["embed"]["table"])
    np.testing.assert_allclose(got_t, want_t, rtol=1e-4, atol=1e-6)

    # adagrad accumulators identical
    got_a = np.asarray(se.from_mod_sharded(new_sh.sparse_opt_state["embed"]["accum"], T, v))
    want_a = np.asarray(new_ref.sparse_opt_state["embed"]["accum"])
    np.testing.assert_allclose(got_a, want_a, rtol=1e-4, atol=1e-6)


def test_sharded_step_with_pallas_kernel_matches_reference(eight_devices):
    """The flagship program: Pallas custom_vjp interaction kernel INSIDE
    the sharded step (interpret mode off-TPU) must match the jnp
    reference interaction path bit-for-bit at f32 tolerance — this is
    the exact composition criteo_full/multihost execute on real chips."""
    from cffm_tpu.ops.interaction_conv import make_interaction_fn

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_pallas=True))
    mesh = make_mesh(8)
    state_p = create_sharded_state(cfg, jax.random.key(5), mesh)
    state_r = jax.tree.map(jnp.copy, state_p)  # steps donate their input

    step_p = make_sharded_train_step(cfg, mesh, make_interaction_fn(use_pallas=True))
    step_r = make_sharded_train_step(cfg, mesh, None)
    ids, labels = _batch(cfg, seed=3)

    sp, mp = step_p(state_p, ids, None, labels)
    sr, mr = step_r(state_r, ids, None, labels)
    np.testing.assert_allclose(float(mp["loss"]), float(mr["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sp.params["embed"]["table"]),
        np.asarray(sr.params["embed"]["table"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sp.params["conv"][0]["w"]),
        np.asarray(sr.params["conv"][0]["w"]), rtol=1e-4, atol=1e-6)
    # and it keeps training: one more step, finite loss
    sp2, mp2 = step_p(sp, *_batch(cfg, seed=4)[:1], None, _batch(cfg, seed=4)[1])
    assert np.isfinite(float(mp2["loss"]))


def test_sharded_multi_step_loss_decreases(eight_devices):
    cfg = _cfg()
    mesh = make_mesh(8)
    state = create_sharded_state(cfg, jax.random.key(1), mesh)
    step = make_sharded_train_step(cfg, mesh)
    losses = []
    for i in range(10):
        ids, labels = _batch(cfg, seed=i)
        state, m = step(state, ids, None, labels)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_sharded_eval_step(eight_devices):
    from cffm_tpu import metrics

    cfg = _cfg()
    mesh = make_mesh(8)
    state = create_sharded_state(cfg, jax.random.key(2), mesh)
    eval_step = make_sharded_eval_step(cfg, mesh)
    auc_state = metrics.auc_state_init()
    for i in range(3):
        ids, labels = _batch(cfg, seed=100 + i)
        auc_state = eval_step(state, auc_state, ids, None, labels)
    out = metrics.auc_state_finalize(auc_state)
    assert float(out["count"]) == 3 * cfg.data.batch_size
    assert np.isfinite(float(out["logloss"]))


def test_sharded_step_bf16_exchange_finite_and_learns(eight_devices):
    """compute_dtype=bfloat16 exercises the bf16 gradient-return
    exchange (se.grad_return payload rides the compute dtype): the step
    must stay finite, touch only batch rows, and reduce loss over a few
    steps. Exact equality with the f32 reference is not expected (bf16
    rounding of the exchanged sums)."""
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    mesh = make_mesh(8)
    state = create_sharded_state(cfg, jax.random.key(2), mesh)
    t0 = np.asarray(state.params["embed"]["table"])
    step = make_sharded_train_step(cfg, mesh)
    losses = []
    for s in range(6):
        ids, labels = _batch(cfg, seed=s % 2)
        state, m = step(state, ids, None, labels)
        losses.append(float(m["loss"]))
        assert int(m["overflow"]) == 0
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # rows never referenced by either batch are bit-identical
    touched = np.zeros(t0.shape[0], bool)
    v = cfg.model.total_vocab
    for s in range(2):
        ids, _ = _batch(cfg, seed=s)
        flat = np.asarray(ids).reshape(-1)
        stor = (flat % 8) * (t0.shape[0] // 8) + flat // 8  # mod-shard storage
        touched[stor] = True
    t1 = np.asarray(state.params["embed"]["table"])
    np.testing.assert_array_equal(t1[~touched], t0[~touched])


def test_sharded_step_streamed_update_matches_scatter(eight_devices):
    """criteo_full's actual sparse path: streamed full-table apply
    (ops/streamed_update.py) INSIDE the sharded step. Each shard
    streams its local (Vs, W) table; results must match the proven
    scatter path, and never-touched rows must stay bit-identical."""
    from cffm_tpu.optim.rowwise import _should_stream

    def cfg15(streamed):
        return TrainConfig(
            name="test",
            model=ModelConfig(
                num_fields=15, vocab_sizes=(64,) * 15, embed_dim=16,
                cross="field_aware", conv_channels=(8,), conv_pool=2,
                tower_hidden=(16,), compute_dtype="float32",
                use_pallas=True),
            optim=OptimizerConfig(sparse_optimizer="adagrad",
                                  dense_optimizer="adam",
                                  streamed_update=streamed),
            data=DataConfig(batch_size=256),
            sharding=ShardingConfig(table_sharded=True),
        )

    cfg_on, cfg_off = cfg15("on"), cfg15("off")
    # guard against a vacuous pass: the forced-on gate must engage for
    # the per-shard local table shape (120 rows padded, W=256 f32)
    mesh = make_mesh(8)
    state_on = create_sharded_state(cfg_on, jax.random.key(2), mesh)
    local_rows = state_on.params["embed"]["table"].shape[0] // T
    assert _should_stream(
        jnp.zeros((local_rows, cfg_on.model.table_width), jnp.float32),
        cfg_on.optim, 15 * 256, local_rows + 1)

    state_off = jax.tree.map(jnp.copy, state_on)
    step_on = make_sharded_train_step(cfg_on, mesh)
    step_off = make_sharded_train_step(cfg_off, mesh)

    table0 = np.asarray(state_on.params["embed"]["table"])
    touched = np.zeros(table0.shape[0], bool)
    for seed in range(3):
        ids, labels = _batch(cfg_on, seed=seed)
        # local row ids under mod-sharding: global id -> (id // T) on
        # shard id % T; mark global rows for the untouched check below
        touched[np.unique(np.asarray(ids))] = True
        state_on, m_on = step_on(state_on, ids, None, labels)
        state_off, m_off = step_off(state_off, ids, None, labels)
        np.testing.assert_allclose(float(m_on["loss"]),
                                   float(m_off["loss"]), rtol=1e-5)

    v = cfg_on.model.total_vocab
    t_on = np.asarray(se.from_mod_sharded(
        state_on.params["embed"]["table"], T, v))
    t_off = np.asarray(se.from_mod_sharded(
        state_off.params["embed"]["table"], T, v))
    # streamed one-hot-MXU apply vs scatter: same math, different f32
    # accumulation order -> ~1e-6 noise on near-zero entries
    np.testing.assert_allclose(t_on, t_off, rtol=1e-4, atol=1e-5)
    a_on = np.asarray(se.from_mod_sharded(
        state_on.sparse_opt_state["embed"]["accum"], T, v))
    a_off = np.asarray(se.from_mod_sharded(
        state_off.sparse_opt_state["embed"]["accum"], T, v))
    np.testing.assert_allclose(a_on, a_off, rtol=1e-4, atol=1e-6)
    # untouched rows: streaming rewrites the whole table; rows no batch
    # ever referenced must come back bit-identical
    untouched = ~touched[:v]
    assert untouched.any()
    t0 = np.asarray(se.from_mod_sharded(jnp.asarray(table0), T, v))
    np.testing.assert_array_equal(t_on[untouched], t0[untouched])


def test_sharded_step_under_forced_overflow(eight_devices):
    """Capacity overflow hardening (VERDICT r2 #9): with
    id_capacity_factor < 1 the per-peer buckets provably cannot hold
    every unique id — overflowed ids read zero embeddings and drop
    their grads (sharded_embedding.build_routing). Training must stay
    finite, report the overflow count, and still learn on the ids that
    do fit."""
    cfg = _cfg(batch=4096)
    # vocabs big enough that per-peer uniques exceed the 128-slot
    # capacity floor once the factor squeezes the buckets; UNIFORM ids
    # (not _batch's Zipf) so nearly every id is distinct: ~2480 uniques
    # per device / 8 owner buckets ~ 310 > 128 slots
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, vocab_sizes=(8192,) * 5),
        sharding=dataclasses.replace(cfg.sharding, id_capacity_factor=0.25))
    mesh = make_mesh(T)
    state = create_sharded_state(cfg, jax.random.key(0), mesh)
    step = make_sharded_train_step(cfg, mesh)

    def _uniform_batch(seed):
        rng = np.random.default_rng(seed)
        b = cfg.data.batch_size
        ids_local = np.stack(
            [rng.integers(0, v, size=b) for v in cfg.model.vocab_sizes],
            axis=1).astype(np.int32)
        ids = jnp.asarray(
            ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
        labels = jnp.asarray((rng.random(b) < 0.4).astype(np.float32))
        return ids, labels

    losses, overflows = [], []
    for s in range(4):
        ids, labels = _uniform_batch(seed=s)
        state, m = step(state, ids, None, labels)
        losses.append(float(m["loss"]))
        overflows.append(int(m["overflow"]))
    assert all(np.isfinite(l) for l in losses), losses
    # the Zipf batch at factor 0.25 MUST overflow (otherwise this test
    # is vacuous) and the counter must surface it
    assert max(overflows) > 0, overflows
    # tables stay finite under dropped-grad updates
    assert bool(jnp.isfinite(state.params["embed"]["table"]).all())


def test_pick_capacity_covers_unique_bound_at_t1():
    """Sizing rule: at T=1 the capacity cap equals the static unique
    bound, so overflow is impossible and the no-overflow fast paths
    (sorted scatter hints, mask elision) engage."""
    from cffm_tpu.optim.rowwise import unique_bound

    vocabs = (64,) * 3 + (100_000,) * 4
    b = 4096
    n = b * len(vocabs)
    ub = unique_bound(vocabs, b)
    cap = se.pick_capacity(n, 1, 2.0, rows_per_shard=sum(vocabs),
                           max_unique=ub)
    assert cap >= min(n, ub)
    assert cap <= -(-min(n, ub) // 128) * 128
