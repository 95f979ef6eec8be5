"""Streamed table-update kernel vs the exact XLA scatter path.

Runs in Pallas interpret mode on CPU (conftest). The streamed path's
only approximation is bf16 rounding of the per-row DELTA, so the table
is compared on the increment (new - old) at bf16-level relative
tolerance, while untouched rows and the f32 accumulator must match
(near-)exactly.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cffm_tpu.config import OptimizerConfig
from cffm_tpu.optim.rowwise import rowwise_init, rowwise_update

V, W = 1024, 128  # pick_tile(1024) = 512 -> 2 tiles


def _mk(seed, n_ids=600, v=V, w=W):
    rng = np.random.default_rng(seed)
    table = rng.normal(size=(v, w)).astype(np.float32)
    ids = rng.integers(0, v, size=n_ids).astype(np.int32)
    ids[::13] = -1  # sentinels
    ids[5] = ids[6] = ids[7]  # duplicates
    ids[10:40] = rng.integers(0, 8, size=30)  # hot rows near tile 0 start
    ids[50:60] = v - 1  # duplicates at the last row (tile boundary)
    grads = (rng.normal(size=(n_ids, w)) * 0.1).astype(np.float32)
    return table, ids, grads


def _run(opt, table, ids, grads):
    st = rowwise_init(jnp.asarray(table), opt)
    return rowwise_update(jnp.asarray(table), st, jnp.asarray(ids),
                          jnp.asarray(grads), opt)


@pytest.mark.parametrize("optimizer", ["adagrad", "sgd", "rowwise_adam"])
def test_streamed_matches_scatter_path(optimizer):
    table, ids, grads = _mk(0)
    on = OptimizerConfig(sparse_optimizer=optimizer, sparse_lr=0.05,
                         streamed_update="on")
    off = dataclasses.replace(on, streamed_update="off")

    t_on, s_on = _run(on, table, ids, grads)
    t_off, s_off = _run(off, table, ids, grads)

    d_on = np.asarray(t_on) - table
    d_off = np.asarray(t_off) - table
    # delta agrees to bf16 rounding; scale by the largest delta magnitude
    scale = np.abs(d_off).max()
    np.testing.assert_allclose(d_on, d_off, atol=0.01 * scale, rtol=0.01)

    touched = np.zeros(V, bool)
    touched[ids[ids >= 0]] = True
    # untouched rows: bit-exact
    np.testing.assert_array_equal(np.asarray(t_on)[~touched], table[~touched])
    if optimizer == "adagrad":
        # accum derives from bf16-rounded gradient sums: ~0.5% relative
        np.testing.assert_allclose(np.asarray(s_on["accum"]),
                                   np.asarray(s_off["accum"]),
                                   rtol=1e-2, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(s_on["accum"])[~touched],
            np.full((int((~touched).sum()), 1), on.adagrad_init, np.float32))
    if optimizer == "rowwise_adam":
        # m/v derive from bf16-rounded gradient sums: ~1% relative, and
        # duplicate-row sums can CANCEL (tiny totals from O(0.1) grads),
        # so allow the bf16 ulp of the inputs as absolute slack;
        # untouched rows keep m == v == 0 bit-exactly (no decay leak)
        np.testing.assert_allclose(np.asarray(s_on["m"]),
                                   np.asarray(s_off["m"]),
                                   rtol=1e-2, atol=3e-4)
        np.testing.assert_allclose(np.asarray(s_on["v"]),
                                   np.asarray(s_off["v"]),
                                   rtol=1e-2, atol=1e-7)
        assert int(s_on["t"]) == int(s_off["t"]) == 1
        np.testing.assert_array_equal(np.asarray(s_on["m"])[~touched], 0.0)
        np.testing.assert_array_equal(np.asarray(s_on["v"])[~touched], 0.0)


def test_streamed_all_sentinels_is_noop():
    table, ids, grads = _mk(1)
    ids[:] = -1
    opt = OptimizerConfig(sparse_optimizer="adagrad", streamed_update="on")
    t_on, s_on = _run(opt, table, ids, grads)
    np.testing.assert_array_equal(np.asarray(t_on), table)
    np.testing.assert_allclose(
        np.asarray(s_on["accum"]),
        np.full((V, 1), opt.adagrad_init, np.float32), rtol=0, atol=0)


def test_streamed_dense_touch_every_row():
    # every row touched (n_ids >> V): exercises full windows on all tiles
    table, _, _ = _mk(2)
    rng = np.random.default_rng(3)
    ids = np.concatenate([np.arange(V, dtype=np.int32),
                          rng.integers(0, V, size=2048).astype(np.int32)])
    grads = (rng.normal(size=(len(ids), W)) * 0.1).astype(np.float32)
    on = OptimizerConfig(sparse_optimizer="adagrad", sparse_lr=0.05,
                         streamed_update="on")
    off = dataclasses.replace(on, streamed_update="off")
    t_on, _ = _run(on, table, ids, grads)
    t_off, _ = _run(off, table, ids, grads)
    d_on = np.asarray(t_on) - table
    d_off = np.asarray(t_off) - table
    scale = np.abs(d_off).max()
    np.testing.assert_allclose(d_on, d_off, atol=0.01 * scale, rtol=0.01)


@pytest.mark.parametrize("optimizer", ["adagrad", "sgd"])
def test_streamed_partial_final_tile(optimizer):
    """V=1000 with r=512: the final tile covers only 488 rows; the
    sentinel id (1000) and the tile's padded region must be masked."""
    v = 1000
    table, ids, grads = _mk(4, n_ids=700, v=v)
    ids[50:70] = v - 1  # hot at the very last real row
    on = OptimizerConfig(sparse_optimizer=optimizer, sparse_lr=0.05,
                         streamed_update="on")
    off = dataclasses.replace(on, streamed_update="off")
    t_on, s_on = _run(on, table, ids, grads)
    t_off, s_off = _run(off, table, ids, grads)
    assert t_on.shape == (v, W)
    d_on = np.asarray(t_on) - table
    d_off = np.asarray(t_off) - table
    scale = np.abs(d_off).max()
    np.testing.assert_allclose(d_on, d_off, atol=0.01 * scale, rtol=0.01)
    touched = np.zeros(v, bool)
    touched[ids[ids >= 0]] = True
    np.testing.assert_array_equal(np.asarray(t_on)[~touched], table[~touched])
    if optimizer == "adagrad":
        np.testing.assert_allclose(np.asarray(s_on["accum"]),
                                   np.asarray(s_off["accum"]),
                                   rtol=1e-2, atol=1e-6)


def test_per_field_sort_matches_global():
    """field_offsets path (batched per-field sort, sentinel -> field
    start) must produce the same update as the global-argsort path."""
    rng = np.random.default_rng(7)
    f, b = 4, 256
    vocabs = [64, 200, 300, 460]  # sums to V=1024
    offs = np.concatenate([[0], np.cumsum(vocabs)[:-1]]).astype(np.int32)
    ids2d = np.stack(
        [offs[j] + rng.integers(0, vocabs[j], size=b) for j in range(f)],
        axis=1).astype(np.int32)
    ids2d[::17, 2] = -1  # sentinels in one field
    ids2d[3, :] = ids2d[4, :]  # duplicate example
    ids = ids2d.reshape(-1)
    grads = (rng.normal(size=(ids.size, W)) * 0.1).astype(np.float32)
    table, _, _ = _mk(5)
    opt = OptimizerConfig(sparse_optimizer="adagrad", sparse_lr=0.05,
                          streamed_update="on")
    st = rowwise_init(jnp.asarray(table), opt)
    t_pf, s_pf = rowwise_update(
        jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(grads), opt,
        field_offsets=tuple(int(o) for o in offs))
    t_gl, s_gl = rowwise_update(
        jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(grads), opt)
    np.testing.assert_allclose(np.asarray(t_pf), np.asarray(t_gl),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_pf["accum"]),
                               np.asarray(s_gl["accum"]),
                               rtol=1e-6, atol=1e-7)


def test_auto_heuristic_gates_small_tables():
    from cffm_tpu.optim.rowwise import _should_stream

    opt = OptimizerConfig(sparse_optimizer="adagrad")
    small = jnp.zeros((512, 128), jnp.float32)
    big = jnp.zeros((1 << 17, 256), jnp.float32)
    assert not _should_stream(small, opt, 4096, None)  # too small
    assert _should_stream(big, opt, 1 << 20, 1 << 17)  # big + dense
    assert not _should_stream(big, opt, 1 << 20, 1000)  # sparse touch
    assert not _should_stream(big, dataclasses.replace(
        opt, sparse_optimizer="adam"), 1 << 20, 1 << 17)  # adam unsupported
    odd = jnp.zeros((1 << 17, 130), jnp.float32)
    assert not _should_stream(odd, opt, 1 << 20, 1 << 17)  # width not 128x


@pytest.mark.parametrize("optimizer", ["adagrad", "sgd"])
def test_streamed_bf16_table(optimizer):
    """bf16 table through the streamed kernel: untouched rows bit-exact,
    touched rows within one bf16 ulp of the f32 streamed result.
    (Interpret mode rounds to nearest — the stochastic path needs the
    TPU PRNG; its math is covered by test_bf16_table.py on the scatter
    path and by the queued on-chip learn check.)"""
    import jax

    table, ids, grads = _mk(2)
    on = OptimizerConfig(sparse_optimizer=optimizer, sparse_lr=0.05,
                         streamed_update="on")

    tb16 = jnp.asarray(table).astype(jnp.bfloat16)
    st = rowwise_init(tb16, on)
    t_b16, s_b16 = rowwise_update(tb16, st, jnp.asarray(ids),
                                  jnp.asarray(grads), on,
                                  sr_key=jax.random.key(3))
    assert t_b16.dtype == jnp.bfloat16

    # f32 streamed run STARTED FROM the bf16-rounded table = exact math
    t_f32, _ = _run(on, np.asarray(tb16, np.float32), ids, grads)

    touched = np.zeros(V, bool)
    touched[ids[ids >= 0]] = True
    old = np.asarray(tb16, np.float32)
    new = np.asarray(t_b16, np.float32)
    np.testing.assert_array_equal(new[~touched], old[~touched])
    want = np.asarray(t_f32, np.float32)[touched]
    got = new[touched]
    ulp = np.maximum(np.abs(want) * 2.0 ** -7, 2.0 ** -133)
    assert np.all(np.abs(got - want) <= ulp + 1e-7)
    if optimizer == "adagrad":
        acc = np.asarray(s_b16["accum"])
        assert np.all(acc[~touched, 0] == float(on.adagrad_init))


# ---------------------------------------------------------------------------
# Bucketed apply (sharded grad-return contract): ids (T, C) ascending +
# unique per bucket with out-of-range sentinel; grads (T, C, W) per-bucket
# partial sums, GARBAGE in sentinel slots. Cross-bucket duplicates must be
# summed before the optimizer math (optim.rowwise.bucketed_rowwise_update).
# ---------------------------------------------------------------------------


def _mk_buckets(seed, t=4, c=256, v=V, w=W, dup_row=None):
    """Random per-bucket unique ascending ids + grads; sentinel tail with
    garbage grads. dup_row: a row id forced into EVERY bucket (cross-peer
    duplicate)."""
    rng = np.random.default_rng(seed)
    ids = np.full((t, c), v + 7, np.int32)  # sentinel (> v: stride-style)
    grads = rng.normal(size=(t, c, w)).astype(np.float32)  # garbage incl. tail
    flat_ids, flat_grads = [], []
    for o in range(t):
        cnt = int(rng.integers(c // 4, c - 1))
        uniq = np.sort(rng.choice(v, size=cnt, replace=False)).astype(np.int32)
        if dup_row is not None:
            uniq = np.unique(np.append(uniq, dup_row)).astype(np.int32)
            cnt = len(uniq)
        ids[o, :cnt] = uniq
        g = (rng.normal(size=(cnt, w)) * 0.1).astype(np.float32)
        grads[o, :cnt] = g
        flat_ids.append(uniq)
        flat_grads.append(g)
    return (ids, grads,
            np.concatenate(flat_ids), np.concatenate(flat_grads, axis=0))


@pytest.mark.parametrize("optimizer", ["adagrad", "sgd", "rowwise_adam"])
def test_bucketed_matches_flat_dedup(optimizer):
    """Bucketed streamed kernel == flat scatter path on the globally
    dedup-summed equivalent stream (incl. a row duplicated in every
    bucket: partials must sum BEFORE the nonlinear update)."""
    from cffm_tpu.optim.rowwise import bucketed_rowwise_update

    rng = np.random.default_rng(11)
    table = rng.normal(size=(V, W)).astype(np.float32)
    ids, grads, flat_ids, flat_grads = _mk_buckets(12, dup_row=77)

    on = OptimizerConfig(sparse_optimizer=optimizer, sparse_lr=0.05,
                         streamed_update="on")
    off = dataclasses.replace(on, streamed_update="off")

    st = rowwise_init(jnp.asarray(table), on)
    t_b, s_b = bucketed_rowwise_update(
        jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(grads), on)
    # ground truth: flat ids/grads (valid entries only), exact scatter path
    t_f, s_f = rowwise_update(jnp.asarray(table), st, jnp.asarray(flat_ids),
                              jnp.asarray(flat_grads), off)

    d_b = np.asarray(t_b) - table
    d_f = np.asarray(t_f) - table
    scale = np.abs(d_f).max()
    np.testing.assert_allclose(d_b, d_f, atol=0.015 * scale, rtol=0.015)
    touched = np.zeros(V, bool)
    touched[flat_ids] = True
    np.testing.assert_array_equal(np.asarray(t_b)[~touched], table[~touched])
    if optimizer == "adagrad":
        np.testing.assert_allclose(np.asarray(s_b["accum"]),
                                   np.asarray(s_f["accum"]),
                                   rtol=1.5e-2, atol=1e-6)
    if optimizer == "rowwise_adam":
        np.testing.assert_allclose(np.asarray(s_b["m"]), np.asarray(s_f["m"]),
                                   rtol=1.5e-2, atol=3e-4)
        np.testing.assert_allclose(np.asarray(s_b["v"]), np.asarray(s_f["v"]),
                                   rtol=1.5e-2, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(s_b["m"])[~touched], 0.0)


def test_bucketed_clip_matches_clipped_flat():
    """opt.clip_norm clips the CROSS-BUCKET total inside the kernel —
    must match clip_rows on the flat dedup-summed grads."""
    from cffm_tpu.optim.rowwise import bucketed_rowwise_update

    rng = np.random.default_rng(13)
    table = rng.normal(size=(V, W)).astype(np.float32)
    ids, grads, flat_ids, flat_grads = _mk_buckets(14, dup_row=9)
    # blow up the duplicate row's partials so only the TOTAL exceeds clip
    for o in range(ids.shape[0]):
        j = int(np.searchsorted(ids[o], 9))
        grads[o, j] = 0.4

    on = OptimizerConfig(sparse_optimizer="adagrad", sparse_lr=0.05,
                         streamed_update="on", clip_norm=1.0)
    off = dataclasses.replace(on, streamed_update="off")
    flat_grads2 = flat_grads.copy()
    flat_grads2[flat_ids == 9] = 0.4

    st = rowwise_init(jnp.asarray(table), on)
    t_b, s_b = bucketed_rowwise_update(
        jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(grads), on)
    t_f, s_f = rowwise_update(jnp.asarray(table), st, jnp.asarray(flat_ids),
                              jnp.asarray(flat_grads2), off)
    d_b = np.asarray(t_b) - table
    d_f = np.asarray(t_f) - table
    scale = np.abs(d_f).max()
    np.testing.assert_allclose(d_b, d_f, atol=0.015 * scale, rtol=0.015)
    np.testing.assert_allclose(np.asarray(s_b["accum"]),
                               np.asarray(s_f["accum"]),
                               rtol=1.5e-2, atol=1e-6)


def test_bucketed_fallback_flattens():
    """Unsupported bucket shapes (here: W=1 linear table) take the
    flatten->rowwise_update fallback and still drop sentinels."""
    from cffm_tpu.ops.streamed_update import bucketed_tile
    from cffm_tpu.optim.rowwise import bucketed_rowwise_update

    assert bucketed_tile(V, 1, 4, 256) == 0  # width not a 128-multiple
    assert bucketed_tile(V, W, 4, 200) == 0  # c not EB-aligned
    assert bucketed_tile(V, W, 4, 128) == 0  # c < winb*EB for every tile
    assert bucketed_tile(V, W, 4, 256) in (64, 128)
    assert bucketed_tile(V, W, 1, 1024) == 512

    rng = np.random.default_rng(15)
    table = rng.normal(size=(V, 1)).astype(np.float32)
    ids, grads, flat_ids, flat_grads = _mk_buckets(16, w=1)
    on = OptimizerConfig(sparse_optimizer="adagrad", sparse_lr=0.05,
                         streamed_update="on")
    st = rowwise_init(jnp.asarray(table), on)
    t_b, _ = bucketed_rowwise_update(
        jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(grads), on)
    t_f, _ = rowwise_update(jnp.asarray(table), st, jnp.asarray(flat_ids),
                            jnp.asarray(flat_grads), on)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_f),
                               rtol=1e-5, atol=1e-6)
