"""Confusion-matrix metrics (jit-able JAX).

Reference: ``Metrics/ConfusionMatrix_based_metrics.py`` — accuracy:4,
sensitivity:20, precision:35, specificity:50, auc_score:65. Same elementwise
mask-product formulas with eps=1e-7 denominators; ``auc_score`` reproduces
``sklearn.roc_auc_score`` (tie-aware trapezoidal ROC area) entirely on device,
with the reference's 0.0 fallback when only one class is present
(reference ``:78-82``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def confusion_counts(y_true, y_pred):
    """(TP, TN, FP, FN) as float sums over the full arrays."""
    yt = jnp.asarray(y_true, jnp.float32)
    yp = jnp.asarray(y_pred, jnp.float32)
    tp = jnp.sum(yt * yp)
    tn = jnp.sum((1.0 - yt) * (1.0 - yp))
    fp = jnp.sum((1.0 - yt) * yp)
    fn = jnp.sum(yt * (1.0 - yp))
    return tp, tn, fp, fn


@jax.jit
def accuracy(y_true, y_pred):
    """(TP + TN) / total. Reference ``:4-18`` (note: no eps on denominator)."""
    tp, tn, fp, fn = confusion_counts(y_true, y_pred)
    total = jnp.asarray(jnp.size(y_true), jnp.float32)
    return (tp + tn) / total


@jax.jit
def sensitivity(y_true, y_pred):
    """TP / (TP + FN + 1e-7). Reference ``:20-33``."""
    tp, _, _, fn = confusion_counts(y_true, y_pred)
    return tp / (tp + fn + _EPS)


@jax.jit
def precision(y_true, y_pred):
    """TP / (TP + FP + 1e-7). Reference ``:35-48``."""
    tp, _, fp, _ = confusion_counts(y_true, y_pred)
    return tp / (tp + fp + _EPS)


@jax.jit
def specificity(y_true, y_pred):
    """TN / (TN + FP + 1e-7). Reference ``:50-63``."""
    _, tn, fp, _ = confusion_counts(y_true, y_pred)
    return tn / (tn + fp + _EPS)


@jax.jit
def auc_score(y_true, y_score):
    """ROC AUC on device, matching ``sklearn.roc_auc_score`` semantics.

    Uses the pair-counting identity AUC·P·N = #{score_pos > score_neg}
    + ½·#{ties}, with tie groups resolved via segment reductions over the
    descending score sort — equivalent to sklearn's tie-grouped trapezoidal
    area. Single-class input returns 0.0 (the reference's ValueError fallback,
    ``ConfusionMatrix_based_metrics.py:78-82``).

    Fixed-shape, fully on device: sort + cumsum + two segment reductions.
    """
    yt = jnp.reshape(jnp.asarray(y_true), (-1)).astype(jnp.float32)
    ys = jnp.reshape(jnp.asarray(y_score), (-1)).astype(jnp.float32)
    n = yt.shape[0]

    order = jnp.argsort(-ys)  # descending scores
    yt_s = yt[order]
    ys_s = ys[order]

    ctp = jnp.cumsum(yt_s)  # positives with score >= current, inclusive
    ctp_prev = ctp - yt_s  # exclusive cumsum

    # Tie groups over equal scores.
    new_group = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (ys_s[1:] != ys_s[:-1]).astype(jnp.int32)]
    )
    gid = jnp.cumsum(new_group) - 1  # group index per element

    # Positives strictly above the group = exclusive cumsum at group start;
    # positives within the group = inclusive cumsum at group end minus that.
    g_start = jax.ops.segment_min(ctp_prev, gid, num_segments=n)
    g_end = jax.ops.segment_max(ctp, gid, num_segments=n)
    above = g_start[gid]
    tied = g_end[gid] - above

    is_neg = 1.0 - yt_s
    pair_sum = jnp.sum(is_neg * (above + 0.5 * tied))

    n_pos = jnp.sum(yt)
    n_neg = n - n_pos
    auc = pair_sum / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos == 0) | (n_neg == 0), 0.0, auc)
