"""Volume-batch metric aggregation — eval never leaves the TPU.

BASELINE.json config 5: "Full on-device metrics suite: confusion-matrix,
Hausdorff, pixel-error, biomarker thickness maps over volume batches". This
module evaluates a whole (B, H, W) label volume against predictions in one
jit: per-class confusion counts via one fused bincount, Dice/IoU/accuracy/
sensitivity/specificity per class and mean, MSE, thickness maps — all
batched; the (host-assisted) contour metrics remain per-slice in
``metrics.contour``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-7


@partial(jax.jit, static_argnums=2)
def volume_confusion(y_true, y_pred, num_classes: int):
    """(num_classes, num_classes) confusion matrix over the whole volume.
    Rows = true class, cols = predicted."""
    yt = jnp.reshape(y_true, (-1)).astype(jnp.int32)
    yp = jnp.reshape(y_pred, (-1)).astype(jnp.int32)
    idx = yt * num_classes + yp
    counts = jnp.zeros((num_classes * num_classes,), jnp.float32).at[idx].add(1.0)
    return counts.reshape(num_classes, num_classes)


@partial(jax.jit, static_argnums=2)
def volume_metrics(y_true, y_pred, num_classes: int):
    """Dict of per-class + mean metrics from one confusion-matrix pass."""
    cm = volume_confusion(y_true, y_pred, num_classes)
    total = jnp.sum(cm)
    tp = jnp.diag(cm)
    fp = jnp.sum(cm, axis=0) - tp
    fn = jnp.sum(cm, axis=1) - tp
    tn = total - tp - fp - fn

    dice = 2 * tp / (2 * tp + fp + fn + _EPS)
    iou = tp / (tp + fp + fn + _EPS)
    sens = tp / (tp + fn + _EPS)
    spec = tn / (tn + fp + _EPS)
    prec = tp / (tp + fp + _EPS)
    acc = (tp + tn) / jnp.maximum(total, 1.0)
    return {
        "confusion": cm,
        "dice": dice,
        "mean_dice": jnp.mean(dice),
        "iou": iou,
        "mean_iou": jnp.mean(iou),
        "sensitivity": sens,
        "specificity": spec,
        "precision": prec,
        "accuracy_per_class": acc,
        "pixel_accuracy": jnp.sum(tp) / jnp.maximum(total, 1.0),
    }


@partial(jax.jit, static_argnums=2)
def volume_thickness_maps(labels, _unused=None, num_classes: int = 2):
    """(B, W, num_classes) per-class per-A-scan thickness profiles
    (batched form of the biomarker column sums, ``Biomarker...py:14-15``)."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return jnp.sum(onehot, axis=1)


@jax.jit
def volume_mse(y_true, y_pred):
    yt = jnp.asarray(y_true, jnp.float32)
    yp = jnp.asarray(y_pred, jnp.float32)
    return jnp.mean((yt - yp) ** 2)
