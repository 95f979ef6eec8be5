"""Hypothesis property tests (SURVEY.md §5.1) for the pure-function core."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np
from hypothesis import given, settings, strategies as st

from cffm_tpu.config import ModelConfig, OptimizerConfig
from cffm_tpu.data.hashing import bucketize_log2, hash_strings
from cffm_tpu.ops.cross import build_cross_map, pair_indices
from cffm_tpu.optim.rowwise import _dedup_sum

pytestmark = pytest.mark.slow


@given(st.lists(st.binary(min_size=0, max_size=12), min_size=1, max_size=50),
       st.integers(min_value=1, max_value=10_000))
@settings(max_examples=25, deadline=None)
def test_hashing_in_range_and_deterministic(strs, buckets):
    vals = np.array(strs, dtype="S12")
    h1 = hash_strings(vals, buckets)
    h2 = hash_strings(vals, buckets)
    np.testing.assert_array_equal(h1, h2)
    assert h1.min() >= 0 and h1.max() < buckets


@given(st.lists(st.integers(min_value=-5, max_value=10**9), min_size=1,
                max_size=100),
       st.integers(min_value=4, max_value=256))
@settings(max_examples=25, deadline=None)
def test_bucketize_monotone(vals, buckets):
    v = np.sort(np.asarray(vals, dtype=np.int64))
    out = bucketize_log2(v, buckets)
    assert (np.diff(out) >= 0).all()
    assert out.min() >= 0 and out.max() < buckets


@given(st.integers(min_value=2, max_value=10))
@settings(max_examples=9, deadline=None)
def test_pair_indices_cover_all_pairs(f):
    pi, pj = pair_indices(f)
    assert len(pi) == f * (f - 1) // 2
    assert (pi < pj).all()
    assert len({(int(a), int(b)) for a, b in zip(pi, pj)}) == len(pi)


@given(st.integers(min_value=1, max_value=64), st.integers(min_value=0, max_value=3))
@settings(max_examples=15, deadline=None)
def test_dedup_sum_mass_preserved(n, seed):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, 8, size=n), jnp.int32)
    grads = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    uids, ugrads, valid = _dedup_sum(ids, grads, 8)
    # total mass preserved
    np.testing.assert_allclose(
        np.asarray(ugrads).sum(axis=0), np.asarray(grads).sum(axis=0),
        rtol=1e-4, atol=1e-4)
    # valid unique ids match numpy unique
    nv = int(np.asarray(valid).sum())
    np.testing.assert_array_equal(
        np.sort(np.asarray(uids)[:nv]), np.unique(np.asarray(ids)))


@given(st.integers(min_value=2, max_value=6), st.integers(min_value=2, max_value=8),
       st.integers(min_value=0, max_value=5))
@settings(max_examples=10, deadline=None)
def test_cross_map_symmetry(f, d, seed):
    """Swapping the roles inside a pair leaves the map unchanged:
    p_ij = e_{i->j} * e_{j->i} is commutative in its two factors."""
    cfg = ModelConfig(num_fields=f, vocab_sizes=(8,) * f, embed_dim=d,
                      cross="field_aware")
    rng = np.random.default_rng(seed)
    e = jnp.asarray(rng.normal(size=(2, f, f, d)), jnp.float32)
    m1 = build_cross_map(e, cfg)
    e_swapped = jnp.swapaxes(e, 1, 2)  # e'[i,j] = e[j,i]
    m2 = build_cross_map(e_swapped, cfg)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)


@given(st.integers(min_value=1, max_value=300),
       st.integers(min_value=1, max_value=60),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=12, deadline=None)
def test_sorted_segment_mass_and_ids(n, vmax, seed):
    """Random sorted streams: segment count, id recovery, and gradient
    mass are exactly preserved by the fused dedup kernel (interpret)."""
    from cffm_tpu.ops.sorted_segment import EB, sorted_segment_sum_compact

    rng = np.random.default_rng(seed)
    sid = np.sort(rng.integers(0, vmax, size=n).astype(np.int32))
    grads = rng.normal(size=(n, 128)).astype(np.float32)
    m_pad = max(-(-n // EB), 1) * EB + EB
    uids, gsum, count = sorted_segment_sum_compact(
        jnp.asarray(sid), jnp.asarray(grads), m_pad)
    ref_uids = np.unique(sid)
    assert int(count) == len(ref_uids)
    np.testing.assert_array_equal(np.asarray(uids)[: len(ref_uids)], ref_uids)
    # mass: bf16 rounding per entry, so compare loosely but globally
    np.testing.assert_allclose(
        np.asarray(gsum, np.float32).sum(axis=0),
        grads.astype(np.dtype("float32")).sum(axis=0),
        rtol=2e-2, atol=2e-2 * max(1.0, np.abs(grads).sum() / 128))


@given(st.integers(min_value=64, max_value=96),
       st.integers(min_value=1, max_value=200),
       st.integers(min_value=0, max_value=3),
       st.sampled_from(["adagrad", "sgd"]))
@settings(max_examples=8, deadline=None)
def test_streamed_update_untouched_rows_invariant(v, n, seed, optimizer):
    """For any id set, rows not in the batch are bit-identical after the
    streamed update, and touched rows move (unless grads are zero)."""
    import dataclasses as _dc

    from cffm_tpu.optim.rowwise import rowwise_init, rowwise_update

    rng = np.random.default_rng(seed)
    table = rng.normal(size=(v, 128)).astype(np.float32)
    ids = rng.integers(0, v, size=n).astype(np.int32)
    grads = (rng.normal(size=(n, 128)) * 0.1).astype(np.float32)
    opt = OptimizerConfig(sparse_optimizer=optimizer, sparse_lr=0.05,
                          streamed_update="on")
    st_ = rowwise_init(jnp.asarray(table), opt)
    t_new, _ = rowwise_update(jnp.asarray(table), st_, jnp.asarray(ids),
                              jnp.asarray(grads), opt)
    touched = np.zeros(v, bool)
    touched[ids] = True
    np.testing.assert_array_equal(np.asarray(t_new)[~touched],
                                  table[~touched])


@given(st.integers(min_value=1, max_value=6),        # fields
       st.integers(min_value=0, max_value=3),        # dense
       st.integers(min_value=1, max_value=200),      # rows
       st.integers(min_value=1, max_value=64),       # read batch
       st.booleans())                                # shuffle
@settings(max_examples=25, deadline=None)
def test_prehashed_roundtrip_property(nf, nd, rows, batch, shuffle):
    """Arbitrary (F, D, N, B): write -> read preserves every word; the
    reader yields N // B exact batches plus the partial tail, covering
    ALL N rows
    as a set (shuffled or not)."""
    import dataclasses
    import tempfile, os
    from cffm_tpu.data.prehashed import (prehashed_batches, read_header,
                                         write_prehashed)
    from cffm_tpu.config import ModelConfig

    rng = np.random.default_rng(nf * 1000 + nd * 100 + rows)
    ids = rng.integers(0, 2**31 - 1, size=(rows, nf)).astype(np.int32)
    dense = rng.normal(size=(rows, nd)).astype(np.float32)
    lab = rng.integers(0, 2, size=rows).astype(np.float32)
    cfg = ModelConfig(num_fields=nf, vocab_sizes=(8,) * nf, num_dense=nd)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.cfb")
        # write in two uneven slices to exercise streaming
        cut = rows // 2
        n = write_prehashed(p, [
            (ids[:cut], dense[:cut] if nd else None, lab[:cut]),
            (ids[cut:], dense[cut:] if nd else None, lab[cut:]),
        ], nf, nd)
        assert n == rows and read_header(p) == (nf, nd, rows)
        got = list(prehashed_batches(p, cfg, batch, repeat=False,
                                     shuffle=shuffle, seed=1))
        # non-repeat mode flushes the partial tail as one extra batch
        # (full-pass eval must see every row)
        assert len(got) == rows // batch + (1 if rows % batch else 0)
        if not got:
            return
        sizes = sorted(len(g[0]) for g in got)
        want_sizes = sorted([batch] * (rows // batch)
                            + ([rows % batch] if rows % batch else []))
        assert sizes == want_sizes  # tail may shuffle anywhere in order
        gi = np.concatenate([g[0] for g in got])
        gl = np.concatenate([g[2] for g in got])
        order = np.lexsort(gi.T) if nf > 1 else np.argsort(gi[:, 0])
        ref_order = (np.lexsort(ids.T) if nf > 1
                     else np.argsort(ids[:, 0]))
        np.testing.assert_array_equal(gi[order], ids[ref_order])
        np.testing.assert_array_equal(gl[order], lab[ref_order])
        if nd:
            gd = np.concatenate([g[1] for g in got])
            np.testing.assert_array_equal(gd[order], dense[ref_order])
