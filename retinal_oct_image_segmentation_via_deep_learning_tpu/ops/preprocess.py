"""On-device B-scan preprocessing pipeline (jit-able, NHWC).

The reference's only data pipeline is host-side, per-image Python: cv2 read +
z-score (``FourierNet/trainTestModels.py:13-36``), no prefetch, no batching.
Here preprocessing is a fused on-device pipeline (BASELINE.json north star:
"B-scan preprocessing (retina flattening, speckle denoise, intensity
normalize, resize/pad) fuses into a single on-device pipeline ahead of
batched sliding-window inference"): one jit, XLA fuses the elementwise
stages, zero host round-trips.

Stages (each optional):
1. retina flattening — per-column retina surface estimate via vertical
   gradient argmax on a blurred copy, quadratic fit replaced by median
   offset, columns rolled to align the surface.
2. speckle denoise — 3x3 separable Gaussian (speckle-friendly light smoothing).
3. intensity normalize — per-image z-score, the reference's convention
   (``trainTestModels.py:17``).
4. resize — PyTorch-exact bilinear to the model input size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .resize import resize_bilinear


def zscore(x, axes=(1, 2, 3), eps=1e-7):
    """Per-image z-score (reference trainTestModels.py:17)."""
    m = jnp.mean(x, axis=axes, keepdims=True)
    s = jnp.std(x, axis=axes, keepdims=True)
    return (x - m) / (s + eps)


def gaussian_blur_3x3(x):
    """Separable [1,2,1]/4 blur; NHWC, reflect-ish edge handling via 'same'."""
    k = jnp.array([0.25, 0.5, 0.25], x.dtype)
    xv = (
        jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    )
    xv = k[0] * xv[:, :-2] + k[1] * xv[:, 1:-1] + k[2] * xv[:, 2:]
    xh = jnp.pad(xv, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    return k[0] * xh[:, :, :-2] + k[1] * xh[:, :, 1:-1] + k[2] * xh[:, :, 2:]


def estimate_surface(x):
    """Per-column retina surface row: argmax of the vertical intensity
    gradient of a blurred copy. Returns (B, W) int32 rows."""
    g = gaussian_blur_3x3(x)
    grad = g[:, 1:] - g[:, :-1]
    return jnp.argmax(jnp.mean(grad, axis=-1), axis=1).astype(jnp.int32)


def flatten_retina(x, surface=None):
    """Shift each column so the detected surface sits at its median row.

    The conv-net analog of the classic 'retina flattening' stage; columns are
    rolled (vectorized gather), keeping everything on device.
    """
    B, H, W, C = x.shape
    if surface is None:
        surface = estimate_surface(x)
    target = jnp.median(surface, axis=1, keepdims=True).astype(jnp.int32)
    shift = surface - target  # positive -> roll up
    rows = jnp.arange(H)[None, :, None]  # (1, H, 1)
    src = (rows + shift[:, None, :]) % H  # (B, H, W)
    return jnp.take_along_axis(x, src[..., None], axis=1)


@partial(jax.jit, static_argnames=("out_hw", "flatten", "denoise", "normalize"))
def preprocess(
    x,
    out_hw: tuple[int, int] | None = None,
    flatten: bool = False,
    denoise: bool = False,
    normalize: bool = True,
):
    """Fused preprocessing pipeline; one compiled program for the batch."""
    x = x.astype(jnp.float32)
    if flatten:
        x = flatten_retina(x)
    if denoise:
        x = gaussian_blur_3x3(x)
    if normalize:
        x = zscore(x)
    if out_hw is not None and out_hw != x.shape[1:3]:
        x = resize_bilinear(x, out_hw)
    return x
