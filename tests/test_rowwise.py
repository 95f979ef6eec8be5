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
