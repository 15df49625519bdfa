"""Fused Pallas dice_ce vs the XLA reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_loss import (
    dice_ce_loss_pallas,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.losses import (
    dice_ce_loss,
)


def _case(shape, nc, seed):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(
        rng.standard_normal(shape + (nc,)).astype(np.float32) * 3.0)
    labels = jnp.asarray(rng.integers(0, nc, shape[:3]), jnp.int32)
    return logits, labels


@pytest.mark.parametrize("nc,cw,dw", [
    (7, None, 1.0),
    (10, None, 0.5),
    (7, "weights", 1.0),
])
def test_loss_and_grad_match(nc, cw, dw):
    logits, labels = _case((2, 32, 128), nc, seed=0)
    weights = (None if cw is None
               else jnp.linspace(0.5, 2.0, nc).astype(jnp.float32))

    ref = dice_ce_loss(logits, labels, weights, dw)
    got = dice_ce_loss_pallas(logits, labels, weights, dw)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    g_ref = jax.grad(lambda t: dice_ce_loss(t, labels, weights, dw))(logits)
    g_got = jax.grad(
        lambda t: dice_ce_loss_pallas(t, labels, weights, dw))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-8)


def test_nchw_entry_matches_nhwc():
    logits, labels = _case((2, 32, 128), 5, seed=3)
    a = dice_ce_loss_pallas(logits, labels)
    b = dice_ce_loss_pallas(logits.transpose(0, 3, 1, 2), labels, nchw=True)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_bf16_logits():
    logits, labels = _case((1, 16, 128), 4, seed=5)
    lb = logits.astype(jnp.bfloat16)
    ref = dice_ce_loss(lb, labels)
    got = dice_ce_loss_pallas(lb, labels)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-2)
    g = jax.grad(lambda t: dice_ce_loss_pallas(t, labels))(lb)
    assert g.dtype == jnp.bfloat16
    g_ref = jax.grad(lambda t: dice_ce_loss(t, labels))(lb)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=0.1, atol=1e-6)


def test_unsupported_geometry_falls_back():
    logits, labels = _case((2, 16, 96), 6, seed=7)  # W % 128 != 0
    ref = dice_ce_loss(logits, labels)
    got = dice_ce_loss_pallas(logits, labels)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
