"""On-device preprocessing pipeline tests (ops/preprocess.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.preprocess import (
    estimate_surface,
    flatten_retina,
    gaussian_blur_3x3,
    preprocess,
    zscore,
)


def test_zscore(rng):
    x = jnp.asarray(rng.random((2, 16, 16, 1)).astype(np.float32) * 7 + 3)
    z = np.asarray(zscore(x))
    for i in range(2):
        assert abs(z[i].mean()) < 1e-4
        assert abs(z[i].std() - 1.0) < 1e-3


def test_gaussian_blur_preserves_mean(rng):
    x = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    b = gaussian_blur_3x3(x)
    assert abs(float(jnp.mean(b)) - float(jnp.mean(x))) < 0.01
    # blur reduces variance
    assert float(jnp.var(b)) < float(jnp.var(x))


def _synthetic_tilted_scan(H=64, W=64, slope=10.0):
    """Dark background with a bright band whose top edge tilts across W."""
    img = np.zeros((H, W), np.float32)
    for c in range(W):
        top = int(H * 0.3 + slope * c / W)
        img[top : top + 20, c] = 1.0
    return img


def test_estimate_surface_finds_bright_band():
    img = _synthetic_tilted_scan()
    surf = np.asarray(estimate_surface(jnp.asarray(img[None, :, :, None])))[0]
    cols = np.arange(64)
    expected = (64 * 0.3 + 10.0 * cols / 64).astype(int)
    # gradient argmax should land within a couple rows of the band top
    assert np.median(np.abs(surf - expected)) <= 3


def test_flatten_retina_levels_surface():
    img = _synthetic_tilted_scan()
    x = jnp.asarray(img[None, :, :, None])
    flat = flatten_retina(x)
    surf_after = np.asarray(estimate_surface(flat))[0]
    # after flattening the detected surface should be nearly constant
    assert surf_after.std() <= 2.0


def test_preprocess_fused(rng):
    x = jnp.asarray(rng.random((2, 48, 40, 1)).astype(np.float32))
    out = preprocess(x, out_hw=(32, 32), flatten=True, denoise=True,
                     normalize=True)
    assert out.shape == (2, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()
