"""Fused sorted-segment dedup kernel vs a numpy reference (interpret
mode on CPU via conftest)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cffm_tpu.ops.sorted_segment import EB, sorted_segment_sum_compact


def _ref(sid, grads):
    uids, first = np.unique(sid, return_index=True)
    sums = np.zeros((len(uids), grads.shape[1]), np.float32)
    inv = np.searchsorted(uids, sid)
    np.add.at(sums, inv, grads.astype(np.float32))
    return uids, sums


@pytest.mark.parametrize("n,seed", [(513, 0), (1024, 1), (200, 2)])
def test_matches_numpy_reference(n, seed):
    rng = np.random.default_rng(seed)
    v, w = 4096, 128
    sid = np.sort(rng.integers(0, v, size=n).astype(np.int32))
    # hot run: many duplicates spanning multiple blocks
    sid[: n // 3] = sid[n // 3]
    sid = np.sort(sid)
    grads = (rng.normal(size=(n, w)) * 0.1).astype(np.float32)

    m_pad = ((n + EB - 1) // EB) * EB + 2 * EB
    uids, gsum, count = sorted_segment_sum_compact(
        jnp.asarray(sid), jnp.asarray(grads), m_pad)
    uids, gsum = np.asarray(uids), np.asarray(gsum)

    ref_uids, ref_sums = _ref(sid, grads)
    assert int(count) == len(ref_uids)
    np.testing.assert_array_equal(uids[: len(ref_uids)], ref_uids)
    np.testing.assert_array_equal(uids[len(ref_uids):], -1)
    # grads pass through bf16: ~0.5% relative on sums
    scale = np.abs(ref_sums).max()
    np.testing.assert_allclose(gsum[: len(ref_uids)], ref_sums,
                               atol=0.01 * scale, rtol=0.02)
    np.testing.assert_array_equal(gsum[len(ref_uids):], 0.0)


def test_single_segment_hot_row():
    """One id repeated n times: revisit accumulation across many input
    blocks must stay f32-exact."""
    n, w = 1024, 128
    sid = np.full((n,), 7, np.int32)
    grads = np.ones((n, w), np.float32)
    m_pad = ((n + EB - 1) // EB) * EB + 2 * EB
    uids, gsum, count = sorted_segment_sum_compact(
        jnp.asarray(sid), jnp.asarray(grads), m_pad)
    assert int(count) == 1
    assert int(uids[0]) == 7
    np.testing.assert_allclose(np.asarray(gsum)[0], float(n), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(uids)[1:], -1)


def test_large_ids_exact():
    """Ids near 2^25 (criteo_full scale) must round-trip exactly
    through the base-256 encoding."""
    ids = np.array([0, 1, 255, 256, 65535, 16_777_215, 26_000_063],
                   np.int32)
    sid = np.sort(ids)
    grads = np.ones((len(ids), 128), np.float32)
    uids, _gsum, count = sorted_segment_sum_compact(
        jnp.asarray(sid), jnp.asarray(grads), 3 * EB)
    assert int(count) == len(ids)
    np.testing.assert_array_equal(np.asarray(uids)[: len(ids)], sid)


@pytest.mark.parametrize("n,seed", [(513, 3), (1024, 4)])
def test_by_seg_matches_compact(n, seed):
    """Rider-free by-seg variant == the compact kernel's gsum."""
    from cffm_tpu.ops.sorted_segment import sorted_segment_sum_by_seg

    rng = np.random.default_rng(seed)
    v, w = 4096, 128
    sid = np.sort(rng.integers(0, v, size=n).astype(np.int32))
    grads = (rng.normal(size=(n, w)) * 0.1).astype(np.float32)
    m_pad = ((n + EB - 1) // EB) * EB + 2 * EB

    _, want, _ = sorted_segment_sum_compact(
        jnp.asarray(sid), jnp.asarray(grads), m_pad)

    is_first = np.concatenate([[1], (sid[1:] != sid[:-1]).astype(np.int64)])
    seg = (np.cumsum(is_first) - 1).astype(np.int32)
    got = sorted_segment_sum_by_seg(
        jnp.asarray(seg), jnp.asarray(grads).astype(jnp.bfloat16), m_pad)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_grad_return_kernel_path_matches_f32_path():
    """sharded grad_return: bf16 Pallas-kernel path vs the exact-f32
    XLA segment_sum path, inside an 8-device shard_map (conftest CPU
    mesh). Covers build_routing's compact-slice bucket assembly — both
    paths slice the same (start, capacity) windows, so even the
    sentinel slots' garbage must agree across paths. Cites
    parallel/sharded_embedding.grad_return."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from cffm_tpu.parallel import sharded_embedding as se

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    T, W = 8, 128
    n_per = 256
    v = 1024
    rng = np.random.default_rng(11)
    ids = rng.integers(0, v, size=(T * n_per,)).astype(np.int32)
    drows = (rng.normal(size=(T * n_per, W)) * 0.1).astype(np.float32)
    mesh = Mesh(np.array(devs[:T]), ("data",))
    capacity = se.pick_capacity(n_per, T, 2.0)

    def run(drows_in):
        def body(ids_l, drows_l):
            routing = se.build_routing(ids_l, capacity, "data",
                                       max_unique=n_per + 1)
            return se.grad_return(drows_l, routing, "data",
                                  max_unique=n_per + 1)
        return shard_map(body, mesh=mesh,
                         in_specs=(P("data"), P("data")),
                         out_specs=(P("data"), P("data")),
                         check_vma=False)(jnp.asarray(ids), drows_in)

    rid_f32, g_f32 = run(jnp.asarray(drows))                      # XLA path
    rid_bf, g_bf = run(jnp.asarray(drows).astype(jnp.bfloat16))   # kernel path
    np.testing.assert_array_equal(np.asarray(rid_f32), np.asarray(rid_bf))
    # both paths round the per-unique f32 sums once to bf16 at the
    # exchange boundary; inputs differ by one pre-round, so compare
    # loosely in bf16 ulp terms
    a = np.asarray(g_f32, np.float32)
    b = np.asarray(g_bf, np.float32)
    np.testing.assert_allclose(a, b, atol=0.02 * max(np.abs(a).max(), 1e-6),
                               rtol=0.05)
