"""Hierarchical (host-level dedup) exchange on the 2x4 virtual mesh
(SURVEY.md §5.3 distributed-without-a-cluster; VERDICT r4 next #1).

The hier path must be interchangeable with the flat path: identical
table storage layout, same lookups, same per-row updates — only the
exchange schedule differs (each host-distinct row crosses the "host"
axis once per direction instead of once per requesting chip)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from cffm_tpu.config import (DataConfig, ModelConfig, OptimizerConfig,
                             ShardingConfig, TrainConfig)
from cffm_tpu.models.cffm import field_offsets
from cffm_tpu.parallel import hier_embedding as he
from cffm_tpu.parallel import sharded_embedding as se
from cffm_tpu.parallel.dcn_mesh import make_mesh_2d
from cffm_tpu.parallel.mesh import make_mesh
from cffm_tpu.parallel.sharded_train import (
    create_sharded_state, make_sharded_eval_step,
    make_sharded_eval_step_hier, make_sharded_train_step,
    make_sharded_train_step_hier)

H, C = 2, 4
T = H * C
V = 4096
W = 16
HOST, CHIP = "host", "chip"


@pytest.fixture(scope="module")
def mesh2d(eight_devices):
    return make_mesh_2d(H, C)


def _natural_table(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(V, W)), jnp.float32)


def _zipf_ids(n_total, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.minimum(rng.zipf(1.5, size=n_total) - 1, V - 1),
                       jnp.int32)


def _caps(n_per, factor=2.0):
    vs = V // T
    return he.pick_capacities_hier(n_per, H, C, factor, vs,
                                   batch_unique=n_per + 1,
                                   host_unique=C * n_per + 1)


def test_hier_lookup_matches_take(mesh2d):
    table = _natural_table()
    storage = se.to_mod_sharded(table, T)
    n_per = 512
    ids = _zipf_ids(T * n_per)
    cap1, cap2 = _caps(n_per)
    vs = V // T

    def body(table_storage, ids_l):
        hr = he.build_routing_hier(ids_l, cap1, cap2, HOST, CHIP, vs)
        rows = he.hier_routed_lookup(table_storage, hr, HOST, CHIP)
        return rows, he.hier_overflow(hr)

    fn = jax.jit(shard_map(
        body, mesh=mesh2d,
        in_specs=(P((HOST, CHIP), None), P((HOST, CHIP))),
        out_specs=(P((HOST, CHIP)), P()),
        check_vma=False,
    ))
    rows, overflow = fn(storage, ids)
    assert int(overflow) == 0
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(want))


def test_hier_grad_return_matches_unsharded_update(mesh2d):
    from cffm_tpu.optim.rowwise import rowwise_init, rowwise_update

    opt = OptimizerConfig(sparse_optimizer="adagrad", sparse_lr=0.1)
    table = _natural_table()
    rng = np.random.default_rng(2)
    n_per = 256
    ids = _zipf_ids(T * n_per, seed=2)
    drows = jnp.asarray(rng.normal(size=(T * n_per, W)), jnp.float32)

    # unsharded ground truth
    state0 = rowwise_init(table, opt)
    want_table, want_state = rowwise_update(table, state0, ids, drows, opt)

    storage = se.to_mod_sharded(table, T)
    acc_storage = se.to_mod_sharded(state0["accum"], T)
    cap1, cap2 = _caps(n_per)
    vs = V // T

    def body(table_storage, accum, ids_l, drows_l):
        hr = he.build_routing_hier(ids_l, cap1, cap2, HOST, CHIP, vs)
        row_ids, row_grads = he.hier_grad_return(drows_l, hr, HOST, CHIP)
        new_table, new_state = rowwise_update(
            table_storage, {"accum": accum}, row_ids, row_grads, opt)
        return new_table, new_state["accum"]

    fn = jax.jit(shard_map(
        body, mesh=mesh2d,
        in_specs=(P((HOST, CHIP), None), P((HOST, CHIP), None),
                  P((HOST, CHIP)), P((HOST, CHIP))),
        out_specs=(P((HOST, CHIP), None), P((HOST, CHIP), None)),
        check_vma=False,
    ))
    new_storage, new_acc = fn(storage, acc_storage, ids, drows)
    got_table = se.from_mod_sharded(new_storage, T, V)
    got_acc = se.from_mod_sharded(new_acc, T, V)
    np.testing.assert_allclose(np.asarray(got_table), np.asarray(want_table),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_acc),
                               np.asarray(want_state["accum"]),
                               rtol=1e-5, atol=1e-6)


def _cfg(batch=256, **model_overrides):
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
            **model_overrides,
        ),
        optim=OptimizerConfig(sparse_optimizer="adagrad",
                              dense_optimizer="adam"),
        data=DataConfig(batch_size=batch),
        sharding=ShardingConfig(table_sharded=True, table_axis="hier"),
    )


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b = cfg.data.batch_size
    ids_local = np.stack(
        [np.minimum(rng.zipf(1.3, size=b) - 1, v - 1)
         for v in cfg.model.vocab_sizes], axis=1).astype(np.int32)
    ids = jnp.asarray(
        ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
    labels = jnp.asarray((rng.random(b) < 0.4).astype(np.float32))
    return ids, labels


def test_hier_step_matches_flat_step(eight_devices, mesh2d):
    """Full train step: hier exchange over (2,4) == flat exchange over
    the 8-device axis (same storage, same batch). Dedup sums associate
    differently (per-chip partials then host pre-sum), so f32 allclose
    rather than bit-equality."""
    cfg = _cfg()
    mesh_flat = make_mesh(8)
    state_h = create_sharded_state(cfg, jax.random.key(0), mesh2d,
                                   table_pspec=P((HOST, CHIP), None))
    state_f = create_sharded_state(cfg, jax.random.key(0), mesh_flat)

    step_h = make_sharded_train_step_hier(cfg, mesh2d)
    step_f = make_sharded_train_step(cfg, mesh_flat)
    ids, labels = _batch(cfg)

    new_h, m_h = step_h(state_h, ids, None, labels)
    new_f, m_f = step_f(state_f, ids, None, labels)

    assert int(m_h["overflow"]) == 0
    np.testing.assert_allclose(float(m_h["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_h.params["tower"][0]["w"]),
        np.asarray(new_f.params["tower"][0]["w"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(new_h.params["embed"]["table"]),
        np.asarray(new_f.params["embed"]["table"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_h.sparse_opt_state["embed"]["accum"]),
        np.asarray(new_f.sparse_opt_state["embed"]["accum"]),
        rtol=1e-5, atol=1e-6)

    # multi-step: loss keeps decreasing and stays finite
    state, losses = new_h, [float(m_h["loss"])]
    for i in range(1, 6):
        ids, labels = _batch(cfg, seed=i % 2)
        state, m = step_h(state, ids, None, labels)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_hier_step_separate_linear(eight_devices, mesh2d):
    """use_first_order without fused padding: the second routed lookup
    + second grad return ride the SAME hier routing."""
    cfg = _cfg(use_first_order=True)
    assert not cfg.model.fused_linear  # d=8, no lane padding
    mesh_flat = make_mesh(8)
    state_h = create_sharded_state(cfg, jax.random.key(3), mesh2d,
                                   table_pspec=P((HOST, CHIP), None))
    state_f = create_sharded_state(cfg, jax.random.key(3), mesh_flat)
    step_h = make_sharded_train_step_hier(cfg, mesh2d)
    step_f = make_sharded_train_step(cfg, mesh_flat)
    ids, labels = _batch(cfg, seed=7)
    new_h, m_h = step_h(state_h, ids, None, labels)
    new_f, m_f = step_f(state_f, ids, None, labels)
    np.testing.assert_allclose(float(m_h["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_h.params["linear"]["table"]),
        np.asarray(new_f.params["linear"]["table"]), rtol=1e-5, atol=1e-6)


def test_hier_step_forced_overflow(eight_devices, mesh2d):
    """Tiny capacity factor: both stages can drop uniques; training must
    stay finite and the (summed) overflow counter must report."""
    cfg = _cfg(batch=4096)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, vocab_sizes=(8192,) * 5),
        sharding=dataclasses.replace(cfg.sharding, id_capacity_factor=0.25))
    state = create_sharded_state(cfg, jax.random.key(0), mesh2d,
                                 table_pspec=P((HOST, CHIP), None))
    step = make_sharded_train_step_hier(cfg, mesh2d)

    rng = np.random.default_rng(0)
    b = cfg.data.batch_size
    ids_local = np.stack(
        [rng.integers(0, v, size=b) for v in cfg.model.vocab_sizes],
        axis=1).astype(np.int32)
    ids = jnp.asarray(
        ids_local + field_offsets(cfg.model)[None, :].astype(np.int32))
    labels = jnp.asarray((rng.random(b) < 0.4).astype(np.float32))
    overflows = []
    for _ in range(2):
        state, m = step(state, ids, None, labels)
        assert np.isfinite(float(m["loss"]))
        overflows.append(int(m["overflow"]))
    assert max(overflows) > 0, overflows
    assert bool(jnp.isfinite(state.params["embed"]["table"]).all())


def test_hier_step_bf16_exchange_finite_and_learns(eight_devices, mesh2d):
    """compute_dtype=bfloat16 on the hier path: BOTH grad exchanges
    (ICI partial sums + the DCN host pre-sum) ride bf16 payloads
    through the Pallas sorted-segment kernel twice; the step must stay
    finite, learn, and leave untouched rows bit-identical."""
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    state = create_sharded_state(cfg, jax.random.key(2), mesh2d,
                                 table_pspec=P((HOST, CHIP), None))
    t0 = np.asarray(state.params["embed"]["table"])
    step = make_sharded_train_step_hier(cfg, mesh2d)
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
    t = T
    for s in range(2):
        ids, _ = _batch(cfg, seed=s)
        flat = np.asarray(ids).reshape(-1)
        stor = (flat % t) * (t0.shape[0] // t) + flat // t
        touched[stor] = True
    t1 = np.asarray(state.params["embed"]["table"])
    np.testing.assert_array_equal(t1[~touched], t0[~touched])


def test_hier_eval_matches_flat_eval(eight_devices, mesh2d):
    from cffm_tpu import metrics

    cfg = _cfg()
    mesh_flat = make_mesh(8)
    state_h = create_sharded_state(cfg, jax.random.key(2), mesh2d,
                                   table_pspec=P((HOST, CHIP), None))
    state_f = create_sharded_state(cfg, jax.random.key(2), mesh_flat)
    ev_h = make_sharded_eval_step_hier(cfg, mesh2d)
    ev_f = make_sharded_eval_step(cfg, mesh_flat)
    a_h, a_f = metrics.auc_state_init(), metrics.auc_state_init()
    for i in range(2):
        ids, labels = _batch(cfg, seed=50 + i)
        a_h = ev_h(state_h, a_h, ids, None, labels)
        a_f = ev_f(state_f, a_f, ids, None, labels)
    out_h = metrics.auc_state_finalize(a_h)
    out_f = metrics.auc_state_finalize(a_f)
    np.testing.assert_allclose(float(out_h["auc"]), float(out_f["auc"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(out_h["logloss"]),
                               float(out_f["logloss"]), rtol=1e-6)


def test_cap_rows_override_semantics():
    """Measured-occupancy absolute capacity overrides (ShardingConfig.
    cap_rows/cap_rows_host): override binds at T>1, hard caps still
    apply, and T=1 always covers the full distinct bound (no silent
    single-chip drops, and the factor/override are ignored there)."""
    # T>1: override wins over the factor formula (lane-rounded)
    assert se.pick_capacity(319488, 8, 2.0, cap_rows=8192) == 8192
    # hard caps still bind above the override
    assert se.pick_capacity(1000, 8, 2.0, cap_rows=8192) == 1024
    assert se.pick_capacity(319488, 8, 2.0, max_unique=4000,
                            cap_rows=8192) == 4096
    # T=1: full coverage regardless of factor or override
    assert se.pick_capacity(1000, 1, 0.25, cap_rows=128) == 1024
    cap1, cap2 = he.pick_capacities_hier(
        8192 * 5, H, C, 2.0, rows_per_shard=100_000,
        batch_unique=10_000, host_unique=40_000,
        cap_rows=256, cap_rows_host=384)
    assert cap1 == 256 and cap2 == 384
    # the rows_per_shard hard cap still binds above the override
    _, cap2b = he.pick_capacities_hier(
        8192 * 5, H, C, 2.0, rows_per_shard=72,
        batch_unique=10_000, host_unique=40_000,
        cap_rows=256, cap_rows_host=384)
    assert cap2b == 128  # min(384, 72) -> 128-slot floor


def test_hier_step_with_pallas_kernel(eight_devices, mesh2d):
    """The flagship composition on the hier path: Pallas custom_vjp
    interaction kernel inside the two-stage exchange (interpret mode)
    vs the jnp reference interaction on the same path."""
    from cffm_tpu.ops.interaction_conv import make_interaction_fn

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_pallas=True))
    state_p = create_sharded_state(cfg, jax.random.key(5), mesh2d,
                                   table_pspec=P((HOST, CHIP), None))
    state_r = jax.tree.map(jnp.copy, state_p)

    step_p = make_sharded_train_step_hier(
        cfg, mesh2d, make_interaction_fn(use_pallas=True))
    step_r = make_sharded_train_step_hier(cfg, mesh2d, None)
    ids, labels = _batch(cfg, seed=3)
    sp, mp = step_p(state_p, ids, None, labels)
    sr, mr = step_r(state_r, ids, None, labels)
    np.testing.assert_allclose(float(mp["loss"]), float(mr["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sp.params["embed"]["table"]),
        np.asarray(sr.params["embed"]["table"]), rtol=1e-4, atol=1e-6)
