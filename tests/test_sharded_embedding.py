"""Row-sharded embedding engine on the 8-virtual-device CPU mesh
(SURVEY.md §5.3: distributed-without-a-cluster)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cffm_tpu.parallel import sharded_embedding as se
from cffm_tpu.parallel.mesh import make_mesh

AXIS = "data"
T = 8
V = 4096
W = 16


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh(8)


def _natural_table(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(V, W)), jnp.float32)


def _sharded_lookup_fn(mesh, capacity, n_per_shard):
    def body(table_storage, ids):
        routing = se.build_routing(ids, capacity, AXIS)
        rows = se.routed_lookup(table_storage, routing, AXIS)
        return rows, routing.overflow

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS), P()),
        check_vma=False,
    ))


def test_routed_lookup_matches_take(mesh):
    table = _natural_table()
    storage = se.to_mod_sharded(table, T)
    rng = np.random.default_rng(1)
    n_per = 512
    # zipf-ish ids with duplicates
    ids = jnp.asarray(np.minimum(rng.zipf(1.5, size=T * n_per) - 1, V - 1),
                      jnp.int32)
    capacity = se.pick_capacity(n_per, T, 2.0)
    fn = _sharded_lookup_fn(mesh, capacity, n_per)
    rows, overflow = fn(storage, ids)
    assert int(overflow) == 0
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(want), rtol=1e-6)


def test_overflow_counted(mesh):
    table = _natural_table()
    storage = se.to_mod_sharded(table, T)
    # all shards ask for distinct ids all owned by shard 0 -> overflow
    n_per = 256
    ids_np = np.arange(T * n_per, dtype=np.int32) * T % V  # all owner 0
    ids = jnp.asarray(ids_np)
    fn = _sharded_lookup_fn(mesh, 128, n_per)
    rows, overflow = fn(storage, ids)
    assert int(overflow) > 0


def test_grad_return_matches_unsharded_update(mesh):
    from cffm_tpu.config import OptimizerConfig
    from cffm_tpu.optim.rowwise import rowwise_init, rowwise_update

    opt = OptimizerConfig(sparse_optimizer="adagrad", sparse_lr=0.1)
    table = _natural_table()
    rng = np.random.default_rng(2)
    n_per = 256
    ids_np = np.minimum(rng.zipf(1.5, size=T * n_per) - 1, V - 1).astype(np.int32)
    ids = jnp.asarray(ids_np)
    drows = jnp.asarray(rng.normal(size=(T * n_per, W)), jnp.float32)

    # unsharded ground truth
    state0 = rowwise_init(table, opt)
    want_table, want_state = rowwise_update(table, state0, ids, drows, opt)

    # sharded: route grads to owners, rowwise update per shard
    storage = se.to_mod_sharded(table, T)
    acc_storage = se.to_mod_sharded(state0["accum"], T)
    capacity = se.pick_capacity(n_per, T, 2.0)

    def body(table_storage, accum, ids_l, drows_l):
        routing = se.build_routing(ids_l, capacity, AXIS)
        row_ids, row_grads = se.grad_return(drows_l, routing, AXIS)
        new_table, new_state = rowwise_update(
            table_storage, {"accum": accum}, row_ids, row_grads, opt)
        return new_table, new_state["accum"]

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS, None)),
        check_vma=False,
    ))
    new_storage, new_acc = fn(storage, acc_storage, ids, drows)
    got_table = se.from_mod_sharded(new_storage, T, V)
    got_acc = se.from_mod_sharded(new_acc, T, V)
    np.testing.assert_allclose(np.asarray(got_table), np.asarray(want_table),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_acc), np.asarray(want_state["accum"]),
                               rtol=1e-5, atol=1e-6)


def test_layout_roundtrip():
    table = _natural_table(3)
    st = se.to_mod_sharded(table, T)
    back = se.from_mod_sharded(st, T, V)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(table))
