"""Loss and metrics: binary logloss, exact AUC, streaming binned AUC.

The streaming accumulator is a fixed-size histogram so per-host partial
sums can be psum/all-reduced at the end of eval (SURVEY.md §4.2) and so
eval stays jit-friendly (static shapes). Exact AUC (rank-sum) is used
for small eval sets and as the test oracle vs sklearn
(tests/test_metrics.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

AUC_NUM_BINS = 8192


def sigmoid_bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically stable binary cross-entropy with logits, per-example."""
    # max(x,0) - x*y + log1p(exp(-|x|))
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def logloss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean(sigmoid_bce_with_logits(logits.astype(jnp.float32), labels))


def auc_exact(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Exact ROC-AUC via the Mann-Whitney rank-sum statistic.

    Handles ties by assigning average ranks (matches sklearn).
    """
    scores = scores.astype(jnp.float64) if scores.dtype == jnp.float64 else scores.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    n = scores.shape[0]
    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    sorted_labels = labels[order]
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
    # Average ranks over tie groups: for each element, mean of min and max
    # rank among equal scores.
    # first index of each tie group
    is_new = jnp.concatenate([jnp.ones((1,), bool), sorted_scores[1:] != sorted_scores[:-1]])
    group_id = jnp.cumsum(is_new) - 1
    num_groups = n  # upper bound
    group_min = jax.ops.segment_min(ranks, group_id, num_segments=num_groups)
    group_max = jax.ops.segment_max(ranks, group_id, num_segments=num_groups)
    avg_rank = (group_min[group_id] + group_max[group_id]) / 2.0
    n_pos = jnp.sum(sorted_labels)
    n_neg = n - n_pos
    rank_sum_pos = jnp.sum(avg_rank * sorted_labels)
    auc = (rank_sum_pos - n_pos * (n_pos + 1) / 2.0) / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos == 0) | (n_neg == 0), jnp.nan, auc)


# ---------------------------------------------------------------------------
# Streaming (binned) AUC — fixed-shape accumulator, psum-able across hosts.
# ---------------------------------------------------------------------------


def calibration_offset(data_cfg) -> float:
    """Logit offset undoing train-time negative downsampling.

    Training on a stream whose negatives were kept with probability r
    inflates the model's odds by 1/r; adding ln(r) to the logit at
    eval/serving restores calibration against the true distribution.
    0.0 when no downsampling is configured."""
    import math

    r = float(getattr(data_cfg, "neg_downsample", 1.0))
    return math.log(r) if 0.0 < r < 1.0 else 0.0


def auc_state_init(num_bins: int = AUC_NUM_BINS) -> Dict[str, jax.Array]:
    return {
        "pos": jnp.zeros((num_bins,), jnp.float32),
        "neg": jnp.zeros((num_bins,), jnp.float32),
        "loss_sum": jnp.zeros((), jnp.float32),
        "p_sum": jnp.zeros((), jnp.float32),  # for calibration
        "count": jnp.zeros((), jnp.float32),
    }


def auc_state_update(
    state: Dict[str, jax.Array], logits: jax.Array, labels: jax.Array,
    mask: jax.Array | None = None,
) -> Dict[str, jax.Array]:
    """Bin sigmoid(logit) into [0,1) histogram buckets per class.

    mask (B,): optional 0/1 example weights — padded tail examples in a
    full-pass eval contribute exactly nothing (histogram, loss, count),
    so padding to a static batch shape never biases the metrics."""
    num_bins = state["pos"].shape[0]
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    idx = jnp.clip((p * num_bins).astype(jnp.int32), 0, num_bins - 1)
    labels = labels.astype(jnp.float32)
    m = (jnp.ones_like(labels) if mask is None
         else mask.astype(jnp.float32))
    pos = state["pos"].at[idx].add(labels * m)
    neg = state["neg"].at[idx].add((1.0 - labels) * m)
    loss = jnp.sum(
        sigmoid_bce_with_logits(logits.astype(jnp.float32), labels) * m)
    return {
        "pos": pos,
        "neg": neg,
        "loss_sum": state["loss_sum"] + loss,
        "p_sum": state["p_sum"] + jnp.sum(p * m),
        "count": state["count"] + jnp.sum(m),
    }


def auc_state_merge(a: Dict, b: Dict) -> Dict:
    return jax.tree.map(lambda x, y: x + y, a, b)


def auc_state_finalize(state: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Trapezoidal AUC from the class histograms (descending threshold)."""
    pos = state["pos"][::-1]  # high score -> low score
    neg = state["neg"][::-1]
    tp = jnp.cumsum(pos)
    fp = jnp.cumsum(neg)
    n_pos = tp[-1]
    n_neg = fp[-1]
    tpr = tp / jnp.maximum(n_pos, 1.0)
    fpr = fp / jnp.maximum(n_neg, 1.0)
    tpr = jnp.concatenate([jnp.zeros((1,)), tpr])
    fpr = jnp.concatenate([jnp.zeros((1,)), fpr])
    auc = jnp.sum((fpr[1:] - fpr[:-1]) * (tpr[1:] + tpr[:-1]) / 2.0)
    # Calibration = mean predicted CTR / observed CTR; 1.0 is perfectly
    # calibrated, the standard production-CTR health metric next to AUC.
    mean_p = state["p_sum"] / jnp.maximum(state["count"], 1.0)
    ctr = n_pos / jnp.maximum(state["count"], 1.0)
    return {
        "auc": jnp.where((n_pos == 0) | (n_neg == 0), jnp.nan, auc),
        "logloss": state["loss_sum"] / jnp.maximum(state["count"], 1.0),
        "calibration": jnp.where(n_pos > 0, mean_p / jnp.maximum(ctr, 1e-12),
                                 jnp.nan),
        "count": state["count"],
    }
