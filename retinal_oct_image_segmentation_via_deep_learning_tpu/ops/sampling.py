"""Bilinear grid sampling + rotation (NHWC), torch ``grid_sample`` parity.

Used by the FFC stack's ``LearnableSpatialTransformWrapper`` (reference
``Lesions_Segment/EdgeAL_2021.py:73-106`` / ``YNet_2022.py:36-75``): reflect
pad -> rotate by a learnable angle -> wrapped module -> inverse rotate ->
crop. The reference ``rotate`` builds its sampling grid with a transposed
meshgrid + flat reinterpretation (``YNet_2022.py:57-67``) — reproduced
bit-exactly here for parity, quirks included.

Implementation is a pair of gathers + lerp (VPU work, fully fused by XLA);
reflection coordinate folding matches torch ``padding_mode='reflection'``
with ``align_corners=True``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _reflect_coord(x, lo, hi):
    """Reflect x into [lo, hi] (torch 'reflection', align_corners=True)."""
    span = hi - lo
    if span == 0:
        return jnp.zeros_like(x)
    x = jnp.abs(x - lo) % (2 * span)
    return hi - jnp.abs(x - span)


def grid_sample_bilinear(x, grid, padding_mode: str = "reflection",
                         align_corners: bool = True):
    """torch.nn.functional.grid_sample parity (bilinear, NHWC input).

    ``grid``: (N, Ho, Wo, 2) with last dim (gx, gy) in [-1, 1].
    """
    N, H, W, C = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (W - 1)
        iy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((gx + 1.0) * W - 1.0) * 0.5
        iy = ((gy + 1.0) * H - 1.0) * 0.5
    if padding_mode == "reflection":
        ix = _reflect_coord(ix, 0.0, float(W - 1))
        iy = _reflect_coord(iy, 0.0, float(H - 1))

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0

    def gather(yy, xx):
        yy = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xx = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        flat = x.reshape(N, H * W, C)
        idx = yy * W + xx  # (N, Ho, Wo)
        return jnp.take_along_axis(
            flat, idx.reshape(N, -1)[..., None], axis=1
        ).reshape(idx.shape + (C,))

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 + (v01 - v00) * wx[..., None]
    bot = v10 + (v11 - v10) * wx[..., None]
    out = top + (bot - top) * wy[..., None]

    if padding_mode == "zeros":
        valid = (
            (ix >= -1) & (ix <= W) & (iy >= -1) & (iy <= H)
        )  # approximate OOB zeroing; exact per-corner masking
        out = jnp.where(valid[..., None], out, 0.0)
    return out


def reference_rotate(x, angle_degrees):
    """The FFC stack's ``rotate`` (reference ``YNet_2022.py:36-75``),
    including its transposed-meshgrid grid construction, reproduced exactly."""
    N, H, W, C = x.shape
    theta = angle_degrees * jnp.pi / 180.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)

    lin_w = jnp.linspace(-1.0, 1.0, W)
    lin_h = jnp.linspace(-1.0, 1.0, H)
    # reference builds points p = i*H + j -> (x=lin_w[i], y=lin_h[j]) ...
    px = jnp.repeat(lin_w, H)
    py = jnp.tile(lin_h, W)
    rx = cos * px - sin * py
    ry = sin * px + cos * py
    # ... then reinterprets the flat (W*H, 2) buffer as (H, W, 2).
    grid = jnp.stack([rx, ry], axis=1).reshape(H, W, 2)
    grid = jnp.broadcast_to(grid[None], (N, H, W, 2))
    return grid_sample_bilinear(
        x, grid, padding_mode="reflection", align_corners=True
    )
