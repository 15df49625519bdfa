"""PyTorch-exact image resize ops (NHWC).

The zoo's per-pixel fidelity contract requires the *exact* sampling grids of
``torch.nn.functional.interpolate`` — ``jax.image.resize`` uses different
conventions (no ``align_corners`` split, different nearest rounding). Used by
e.g. RetiFluidNet (`interpolate(..., mode='nearest')`, reference
``RetiFluidNet_pytorch_2022.py:90``), MGUNet (`bilinear` upsamples,
``MGUNet_2021.py:172-190``), M2SNet (`bilinear` pyramid), LightReSeg.

Sampling grids:
- nearest:                  src = floor(dst * H_in / H_out)
- bilinear, align=False:    src = (dst + 0.5) * H_in/H_out - 0.5, clamped
- bilinear, align=True:     src = dst * (H_in - 1) / (H_out - 1)

Implemented as two one-dimensional gathers + lerps (separable), which XLA
fuses into a tight gather kernel; no host work, static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _nearest_indices(out_size: int, in_size: int):
    # torch 'nearest' (legacy): floor(i * in/out)
    idx = jnp.floor(jnp.arange(out_size) * (in_size / out_size)).astype(jnp.int32)
    return jnp.clip(idx, 0, in_size - 1)


def resize_nearest(x, out_hw):
    """NHWC nearest resize matching torch ``interpolate(mode='nearest')``."""
    H_out, W_out = out_hw
    H_in, W_in = x.shape[-3], x.shape[-2]
    ri = _nearest_indices(H_out, H_in)
    ci = _nearest_indices(W_out, W_in)
    return x[..., ri, :, :][..., ci, :]


def _linear_weights(out_size: int, in_size: int, align_corners: bool):
    if out_size == 1:
        # torch maps a single output to src 0 (align) / center (not align);
        # both reduce to a clamped gather at floor position.
        src = jnp.zeros((1,))
        if not align_corners:
            src = jnp.full((1,), (0.5) * (in_size / out_size) - 0.5)
    elif align_corners:
        src = jnp.arange(out_size) * ((in_size - 1) / (out_size - 1))
    else:
        src = (jnp.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(jnp.float32)
    return lo, hi, w_hi


def resize_bilinear(x, out_hw, align_corners: bool = False):
    """NHWC bilinear resize matching torch ``interpolate(mode='bilinear')``."""
    H_out, W_out = out_hw
    H_in, W_in = x.shape[-3], x.shape[-2]
    dt = x.dtype
    xf = x.astype(jnp.float32)

    rlo, rhi, rw = _linear_weights(H_out, H_in, align_corners)
    clo, chi, cw = _linear_weights(W_out, W_in, align_corners)

    top = xf[..., rlo, :, :]
    bot = xf[..., rhi, :, :]
    xf = top + (bot - top) * rw[:, None, None]
    left = xf[..., clo, :]
    right = xf[..., chi, :]
    out = left + (right - left) * cw[:, None]
    return out.astype(dt)


def upsample(x, scale: int = 2, mode: str = "nearest", align_corners: bool = False):
    """Integer-factor upsample (NHWC), torch-parity sampling."""
    H, W = x.shape[-3], x.shape[-2]
    out_hw = (H * scale, W * scale)
    if mode == "nearest":
        return resize_nearest(x, out_hw)
    if mode == "bilinear":
        return resize_bilinear(x, out_hw, align_corners)
    raise ValueError(f"unknown mode {mode}")
