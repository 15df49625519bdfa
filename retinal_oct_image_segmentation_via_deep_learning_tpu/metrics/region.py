"""Region-overlap metrics (jit-able JAX).

Reference: ``Metrics/Region_based_metrics.py`` — dice_coefficient:3,
iou_score:18, precision:33, recall:48. Note this family's precision/recall
use |pred| / |true| denominators (``:43-46``), intentionally different from
the confusion-matrix module's TP+FP / TP+FN forms — both are preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _sums(y_true, y_pred):
    yt = jnp.asarray(y_true, jnp.float32)
    yp = jnp.asarray(y_pred, jnp.float32)
    inter = jnp.sum(yt * yp)
    return inter, jnp.sum(yt), jnp.sum(yp)


@jax.jit
def dice_coefficient(y_true, y_pred):
    """2|X∩Y| / (|X|+|Y|+1e-7). Reference ``:3-16``."""
    inter, st, sp = _sums(y_true, y_pred)
    return 2.0 * inter / (st + sp + _EPS)


@jax.jit
def iou_score(y_true, y_pred):
    """|X∩Y| / (|X∪Y|+1e-7). Reference ``:18-31``."""
    inter, st, sp = _sums(y_true, y_pred)
    return inter / (st + sp - inter + _EPS)


@jax.jit
def precision(y_true, y_pred):
    """TP / (|pred|+1e-7). Reference ``:33-46``."""
    inter, _, sp = _sums(y_true, y_pred)
    return inter / (sp + _EPS)


@jax.jit
def recall(y_true, y_pred):
    """TP / (|true|+1e-7). Reference ``:48-61``."""
    inter, st, _ = _sums(y_true, y_pred)
    return inter / (st + _EPS)


from functools import partial


@partial(jax.jit, static_argnums=2)
def per_class_dice(y_true_labels, y_pred_labels, num_classes: int):
    """Per-class Dice over integer label maps — batched, one device pass.

    New capability (the reference computes Dice one binary mask at a time):
    one-hot-free formulation via bincount-style sums per class.
    """
    yt = jnp.reshape(y_true_labels, (-1))
    yp = jnp.reshape(y_pred_labels, (-1))
    inter = jnp.zeros((num_classes,), jnp.float32).at[yt].add(
        (yt == yp).astype(jnp.float32)
    )
    st = jnp.zeros((num_classes,), jnp.float32).at[yt].add(1.0)
    sp = jnp.zeros((num_classes,), jnp.float32).at[yp].add(1.0)
    return 2.0 * inter / (st + sp + _EPS)
