"""Pallas gather / fused Adagrad scatter kernels vs jnp references
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from cffm_tpu.ops.embedding_kernels import adagrad_update_rows, gather_rows

V, W = 1024, 128


def test_gather_rows_matches_take():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, W)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, size=1536), jnp.int32)
    got = gather_rows(table, ids, group=256, interpret=True)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_gather_rows_cast_and_pad():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(V, W)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, size=700), jnp.int32)  # pad path
    got = gather_rows(table, ids, out_dtype=jnp.bfloat16, group=256, interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (700, W)
    want = jnp.take(table, ids, axis=0).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32), rtol=1e-2)


def test_adagrad_update_rows_matches_reference():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(V, W)), jnp.float32)
    accum = jnp.full((V, 1), 0.1, jnp.float32)
    n = 512
    ids_np = rng.permutation(V)[:n].astype(np.int32)  # unique ids
    ids_np[::7] = -1  # sentinel rows to skip
    ids = jnp.asarray(ids_np)
    grads = jnp.asarray(rng.normal(size=(n, W)), jnp.float32)
    lr, eps = 0.05, 1e-8

    new_table, new_accum = adagrad_update_rows(
        table, accum, ids, grads, lr, eps, group=256, interpret=True)

    # reference
    t_ref = np.asarray(table).copy()
    a_ref = np.asarray(accum).copy()
    for j, rid in enumerate(ids_np):
        if rid < 0:
            continue
        g = np.asarray(grads[j])
        a_ref[rid, 0] += np.mean(g * g)
        t_ref[rid] -= lr * g / (np.sqrt(a_ref[rid, 0]) + eps)
    np.testing.assert_allclose(np.asarray(new_table), t_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_accum), a_ref, rtol=1e-5, atol=1e-6)


def test_scatter_add_rows_matches_reference():
    from cffm_tpu.ops.embedding_kernels import scatter_add_rows
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.normal(size=(V, 128)), jnp.float32)
    n = 512
    nuniq = 300
    ids_np = np.concatenate([
        np.sort(rng.permutation(V)[:nuniq]).astype(np.int32),
        np.zeros(n - nuniq, np.int32)])
    deltas = jnp.asarray(rng.normal(size=(n, 128)), jnp.float32)
    got = scatter_add_rows(table, jnp.asarray(ids_np), jnp.int32(nuniq),
                           deltas, group=128, interpret=True)
    want = np.asarray(table).copy()
    for k in range(nuniq):
        want[ids_np[k]] += np.asarray(deltas[k])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
