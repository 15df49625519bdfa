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


@partial(jax.jit, static_argnums=(2, 3))
def volume_boundary_metrics(y_true, y_pred, num_classes: int,
                            max_points: int = 1024):
    """Per-class contour + biomarker metrics over a (B, H, W) label volume,
    entirely on device.

    Returns dict of (B, num_classes) arrays: ``hd95`` / ``assd`` (on-device
    boundary-pixel variant, see ``metrics.contour.surface_distances_device``
    for the <=0.7 px approximation note), ``thickness_diff`` (mean per-A-scan
    |thickness| difference, reference ``Biomarker...py:14-21``), ``vi_diff``
    (vascularity-index |difference|, ``:34-38``), and ``valid`` — classes
    whose true AND predicted masks are non-empty on that slice (distance
    metrics are undefined otherwise and must be masked out of aggregates).
    """
    from .contour import surface_distances_device

    def per_slice(yt, yp):
        outs = {"hd95": [], "assd": [], "thickness_diff": [], "vi_diff": [],
                "valid": []}
        for c in range(num_classes):
            mt = (yt == c).astype(jnp.float32)
            mp = (yp == c).astype(jnp.float32)
            d1, d2, n_p, n_t = surface_distances_device(mt, mp, max_points)
            valid = (n_p > 0) & (n_t > 0)
            hd95 = jnp.maximum(
                jnp.nanpercentile(d1, 95.0), jnp.nanpercentile(d2, 95.0)
            )
            assd_v = (jnp.nanmean(d1) + jnp.nanmean(d2)) / 2.0
            td = jnp.mean(jnp.abs(jnp.sum(mt, 0) - jnp.sum(mp, 0)))
            vi = jnp.abs(jnp.mean(mt) - jnp.mean(mp))
            outs["hd95"].append(jnp.where(valid, hd95, jnp.nan))
            outs["assd"].append(jnp.where(valid, assd_v, jnp.nan))
            outs["thickness_diff"].append(td)
            outs["vi_diff"].append(vi)
            outs["valid"].append(valid)
        return {k: jnp.stack(v) for k, v in outs.items()}

    return jax.vmap(per_slice)(jnp.asarray(y_true), jnp.asarray(y_pred))
