import numpy as np
import pytest

from cffm_tpu import metrics

sklearn_metrics = pytest.importorskip("sklearn.metrics")


def test_auc_exact_vs_sklearn():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=2000).astype(np.float32)
    labels = (rng.random(2000) < 1.0 / (1.0 + np.exp(-scores * 0.7))).astype(np.float32)
    got = float(metrics.auc_exact(scores, labels))
    want = sklearn_metrics.roc_auc_score(labels, scores)
    assert abs(got - want) < 1e-5


def test_auc_exact_with_ties():
    scores = np.array([0.5, 0.5, 0.5, 0.2, 0.8], dtype=np.float32)
    labels = np.array([1, 0, 1, 0, 1], dtype=np.float32)
    got = float(metrics.auc_exact(scores, labels))
    want = sklearn_metrics.roc_auc_score(labels, scores)
    assert abs(got - want) < 1e-6


def test_streaming_auc_close_to_exact():
    rng = np.random.default_rng(1)
    logits = rng.normal(scale=2.0, size=8192).astype(np.float32)
    labels = (rng.random(8192) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float32)
    state = metrics.auc_state_init()
    # split across "hosts" then merge
    s1 = metrics.auc_state_update(metrics.auc_state_init(), logits[:4096], labels[:4096])
    s2 = metrics.auc_state_update(metrics.auc_state_init(), logits[4096:], labels[4096:])
    state = metrics.auc_state_merge(s1, s2)
    out = metrics.auc_state_finalize(state)
    p = 1.0 / (1.0 + np.exp(-logits))
    want = sklearn_metrics.roc_auc_score(labels, p)
    assert abs(float(out["auc"]) - want) < 2e-3
    want_ll = sklearn_metrics.log_loss(labels, p)
    assert abs(float(out["logloss"]) - want_ll) < 1e-5


def test_logloss_stability():
    logits = np.array([100.0, -100.0], dtype=np.float32)
    labels = np.array([1.0, 0.0], dtype=np.float32)
    assert float(metrics.logloss(logits, labels)) < 1e-6
    labels = np.array([0.0, 1.0], dtype=np.float32)
    assert np.isfinite(float(metrics.logloss(logits, labels)))


def test_calibration_metric():
    import jax.numpy as jnp

    from cffm_tpu import metrics as M

    # logits whose sigmoid-mean equals the label mean -> calibration 1
    labels = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    logits = jnp.zeros((4,))  # p = 0.5 everywhere; ctr = 0.5
    st = M.auc_state_update(M.auc_state_init(), logits, labels)
    out = M.auc_state_finalize(st)
    assert abs(float(out["calibration"]) - 1.0) < 1e-6

    # systematic over-prediction: p = 0.8 vs ctr = 0.5 -> 1.6
    logits = jnp.full((4,), float(jnp.log(0.8 / 0.2)))
    out = M.auc_state_finalize(
        M.auc_state_update(M.auc_state_init(), logits, labels))
    assert abs(float(out["calibration"]) - 1.6) < 1e-3

    # masked-out tail must not shift calibration
    labels2 = jnp.asarray([1.0, 0.0, 1.0, 0.0, 1.0, 1.0])
    logits2 = jnp.concatenate([jnp.zeros((4,)), jnp.full((2,), 5.0)])
    mask = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0, 0.0])
    out = M.auc_state_finalize(
        M.auc_state_update(M.auc_state_init(), logits2, labels2, mask=mask))
    assert abs(float(out["calibration"]) - 1.0) < 1e-6
