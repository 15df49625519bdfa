"""Loss function golden tests (incl. the one-hot-free Dice formulation)."""

import numpy as np

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.training.losses import (
    dice_ce_loss,
    dice_loss,
    softmax_cross_entropy,
)


def _ref_dice(logits, labels, class_weights=None):
    nc = logits.shape[-1]
    probs = jax.nn.softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(jnp.asarray(labels), nc, dtype=jnp.float32)
    axes = tuple(range(probs.ndim - 1))
    inter = jnp.sum(probs * onehot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
    dice = (2 * inter + 1e-7) / (denom + 1e-7)
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        return 1.0 - jnp.sum(dice * w) / jnp.sum(w)
    return 1.0 - jnp.mean(dice)


def test_dice_matches_onehot_formulation(rng):
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (2, 16, 16)))
    got = float(dice_loss(logits, labels))
    want = float(_ref_dice(logits, labels))
    assert abs(got - want) < 1e-6


def test_dice_weighted(rng):
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (1, 8, 8)))
    w = [0.2, 1.0, 5.0]
    got = float(dice_loss(logits, labels, w))
    want = float(_ref_dice(logits, labels, w))
    assert abs(got - want) < 1e-6


def test_ce_weighted_matches_manual(rng):
    logits = jnp.asarray(rng.standard_normal((1, 4, 4, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (1, 4, 4)))
    w = np.array([1.0, 2.0, 0.5], np.float32)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    ll = np.take_along_axis(logp, np.asarray(labels)[..., None], -1)[..., 0]
    pix_w = w[np.asarray(labels)]
    want = -(ll * pix_w).sum() / pix_w.sum()
    got = float(softmax_cross_entropy(logits, labels, w))
    assert abs(got - want) < 1e-5


def test_dice_ce_perfect_prediction_low_loss(rng):
    labels = jnp.asarray(rng.integers(0, 3, (1, 8, 8)))
    logits = jax.nn.one_hot(labels, 3) * 20.0
    loss = float(dice_ce_loss(logits, labels))
    assert loss < 1e-3
