"""Per-row sparse optimizers: dedup-sum semantics vs naive references."""

import jax.numpy as jnp
import numpy as np

from cffm_tpu.config import OptimizerConfig
from cffm_tpu.optim.rowwise import rowwise_init, rowwise_update

V, W = 256, 16


def _ref_adagrad(table, accum, ids, grads, lr, eps):
    t, a = table.copy(), accum.copy()
    uniq = {}
    for i, g in zip(ids, grads):
        if i < 0:
            continue
        uniq.setdefault(int(i), np.zeros(W, np.float32))
        uniq[int(i)] += g
    for i, g in uniq.items():
        a[i, 0] += np.mean(g * g)
        t[i] -= lr * g / (np.sqrt(a[i, 0]) + eps)
    return t, a


def test_adagrad_with_duplicates_and_sentinels():
    rng = np.random.default_rng(0)
    opt = OptimizerConfig(sparse_optimizer="adagrad", sparse_lr=0.1)
    table = rng.normal(size=(V, W)).astype(np.float32)
    ids = rng.integers(0, V, size=100).astype(np.int32)
    ids[::9] = -1
    ids[10] = ids[11] = ids[12]  # forced duplicates
    grads = rng.normal(size=(100, W)).astype(np.float32)

    state = rowwise_init(jnp.asarray(table), opt)
    new_table, new_state = rowwise_update(
        jnp.asarray(table), state, jnp.asarray(ids), jnp.asarray(grads), opt)
    want_t, want_a = _ref_adagrad(
        table, np.asarray(state["accum"]), ids, grads, opt.sparse_lr, opt.eps)
    np.testing.assert_allclose(np.asarray(new_table), want_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["accum"]), want_a,
                               rtol=1e-5, atol=1e-6)


def _ref_adam(table, m, v, t, ids, grads, lr, b1, b2, eps):
    tab, m, v = table.copy(), m.copy(), v.copy()
    t = t + 1
    uniq = {}
    for i, g in zip(ids, grads):
        if i < 0:
            continue
        uniq.setdefault(int(i), np.zeros(W, np.float32))
        uniq[int(i)] += g
    for i, g in uniq.items():
        m[i] = b1 * m[i] + (1 - b1) * g
        v[i] = b2 * v[i] + (1 - b2) * g * g
        mhat = m[i] / (1 - b1 ** t)
        vhat = v[i] / (1 - b2 ** t)
        tab[i] -= lr * mhat / (np.sqrt(vhat) + eps)
    return tab, m, v


def test_adam_with_duplicates_and_sentinels():
    rng = np.random.default_rng(2)
    opt = OptimizerConfig(sparse_optimizer="adam", sparse_lr=0.1)
    table = rng.normal(size=(V, W)).astype(np.float32)
    ids = rng.integers(1, V, size=100).astype(np.int32)  # never row 0
    ids[::9] = -1  # sentinels -> dedup tail maps them out of bounds
    ids[10] = ids[11] = ids[12]  # forced duplicates
    grads = rng.normal(size=(100, W)).astype(np.float32)

    state = rowwise_init(jnp.asarray(table), opt)
    # Pre-seed non-zero m/v so decay corruption (the round-1 bug: invalid
    # dedup-tail slots scattered b1/b2 decay onto row 0) would be visible.
    state = {"m": jnp.asarray(rng.normal(size=(V, W)), jnp.float32),
             "v": jnp.asarray(rng.uniform(0.1, 1.0, size=(V, W)), jnp.float32),
             "t": state["t"]}
    new_table, new_state = rowwise_update(
        jnp.asarray(table), state, jnp.asarray(ids), jnp.asarray(grads), opt)
    want_t, want_m, want_v = _ref_adam(
        table, np.asarray(state["m"]), np.asarray(state["v"]), 0,
        ids, grads, opt.sparse_lr, opt.adam_b1, opt.adam_b2, opt.eps)
    np.testing.assert_allclose(np.asarray(new_table), want_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["m"]), want_m, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["v"]), want_v, rtol=1e-5, atol=1e-6)
    # Row 0 is untouched by the batch: its state must be BIT-exact.
    assert bool(jnp.all(new_state["m"][0] == state["m"][0]))
    assert bool(jnp.all(new_state["v"][0] == state["v"][0]))
    assert bool(jnp.all(new_table[0] == jnp.asarray(table)[0]))


def test_sgd_and_adam_finite():
    rng = np.random.default_rng(1)
    for name in ("sgd", "adam"):
        opt = OptimizerConfig(sparse_optimizer=name, sparse_lr=0.01)
        table = jnp.asarray(rng.normal(size=(V, W)), jnp.float32)
        state = rowwise_init(table, opt)
        ids = jnp.asarray(rng.integers(0, V, size=64), jnp.int32)
        grads = jnp.asarray(rng.normal(size=(64, W)), jnp.float32)
        new_table, _ = rowwise_update(table, state, ids, grads, opt)
        assert bool(jnp.all(jnp.isfinite(new_table)))
        assert float(jnp.abs(new_table - table).sum()) > 0


def test_clip_rows_per_row_semantics():
    import dataclasses

    from cffm_tpu.optim.rowwise import clip_rows

    opt = OptimizerConfig(clip_norm=1.0)
    g = np.zeros((3, W), np.float32)
    g[0, 0] = 10.0   # norm 10 -> scaled to 1
    g[1, :] = 0.01   # norm 0.04 -> untouched
    g[2, 0] = -5.0   # sign preserved
    out = np.asarray(clip_rows(jnp.asarray(g), opt))
    assert abs(np.linalg.norm(out[0]) - 1.0) < 1e-5
    np.testing.assert_array_equal(out[1], g[1])
    assert abs(out[2, 0] + 1.0) < 1e-5
    # clip_norm=0 disables
    out2 = clip_rows(jnp.asarray(g), dataclasses.replace(opt, clip_norm=0.0))
    np.testing.assert_array_equal(np.asarray(out2), g)


def test_clip_applies_after_dedup_sum():
    # Two duplicate ids each with grad norm 0.6: the summed row grad
    # (norm 1.2) must be clipped to 1.0 — clip AFTER the segment sum.
    opt = OptimizerConfig(sparse_optimizer="sgd", sparse_lr=1.0,
                          clip_norm=1.0)
    table = jnp.zeros((8, W), jnp.float32)
    ids = jnp.asarray([3, 3], jnp.int32)
    g = np.zeros((2, W), np.float32)
    g[:, 0] = 0.6
    new_table, _ = rowwise_update(table, {}, ids, jnp.asarray(g), opt)
    got = float(np.asarray(new_table)[3, 0])
    assert abs(got + 1.0) < 1e-5, got  # -lr * clipped(1.2 -> 1.0)


def _ref_rowwise_adam(table, m, v, t, ids, grads, lr, b1, b2, eps):
    tab, m, v = table.copy(), m.copy(), v.copy()
    t = t + 1
    uniq = {}
    for i, g in zip(ids, grads):
        if i < 0:
            continue
        uniq.setdefault(int(i), np.zeros(W, np.float32))
        uniq[int(i)] += g
    for i, g in uniq.items():
        m[i] = b1 * m[i] + (1 - b1) * g
        v[i, 0] = b2 * v[i, 0] + (1 - b2) * np.mean(g * g)
        mhat = m[i] / (1 - b1 ** t)
        vhat = v[i, 0] / (1 - b2 ** t)
        tab[i] -= lr * mhat / (np.sqrt(vhat) + eps)
    return tab, m, v


def test_rowwise_adam_with_duplicates_and_sentinels():
    rng = np.random.default_rng(7)
    opt = OptimizerConfig(sparse_optimizer="rowwise_adam", sparse_lr=0.01)
    table = rng.normal(size=(V, W)).astype(np.float32)
    ids = rng.integers(0, V, size=100).astype(np.int32)
    ids[::9] = -1
    ids[10] = ids[11] = ids[12]
    grads = rng.normal(size=(100, W)).astype(np.float32)

    state = rowwise_init(jnp.asarray(table), opt)
    # seed non-trivial m/v so the decay path is exercised
    state["m"] = jnp.asarray(rng.normal(size=(V, W)).astype(np.float32))
    state["v"] = jnp.asarray(
        np.abs(rng.normal(size=(V, 1))).astype(np.float32))

    new_table, new_state = rowwise_update(
        jnp.asarray(table), state, jnp.asarray(ids), jnp.asarray(grads), opt)
    want_t, want_m, want_v = _ref_rowwise_adam(
        table, np.asarray(state["m"]), np.asarray(state["v"]), 0,
        ids, grads, opt.sparse_lr, opt.adam_b1, opt.adam_b2, opt.eps)
    np.testing.assert_allclose(np.asarray(new_table), want_t,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["m"]), want_m,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["v"]), want_v,
                               rtol=1e-5, atol=1e-6)
    # untouched rows (incl. row targets of sentinel slots) bit-exact
    touched = np.zeros(V, bool)
    touched[ids[ids >= 0]] = True
    np.testing.assert_array_equal(np.asarray(new_state["m"])[~touched],
                                  np.asarray(state["m"])[~touched])
    np.testing.assert_array_equal(np.asarray(new_state["v"])[~touched],
                                  np.asarray(state["v"])[~touched])
    assert int(new_state["t"]) == 1
