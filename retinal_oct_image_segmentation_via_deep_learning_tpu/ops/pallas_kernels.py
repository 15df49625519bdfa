"""Pallas TPU kernels for column-wise (A-scan) reductions.

The SDNet LayerEngine performs three H-axis passes per boundary channel —
column softmax, soft-argmax position, and positional std
(``layer_engine.py:100-103`` in the reference; ``models/sdnet/layer_engine``
here). XLA emits them as separate reduction/elementwise stages re-reading the
(B, H, W, L) tensor from HBM; this kernel fuses all three into ONE VMEM pass
per (batch, layer, W-tile) block: the tile is read once, and softmax,
position, and std come out together.

Grid: (B*L, W/128). Block: the full H extent x 128 lanes, fp32 in VMEM.
Falls back to interpreter mode off-TPU (tests) via ``interpret=...``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(x_ref, sm_ref, pos_ref, std_ref):
    x = x_ref[0].astype(jnp.float32)  # (H, LANES)
    H = x.shape[0]
    m = jnp.max(x, axis=0, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    sm = e / s
    # int iota then cast — Mosaic rejects float iota
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 0).astype(jnp.float32)
    pos = jnp.sum(sm * rows, axis=0, keepdims=True)  # (1, LANES)
    var = jnp.sum(sm * (rows - pos) ** 2, axis=0, keepdims=True)
    sm_ref[0] = sm
    pos_ref[0] = pos
    std_ref[0] = jnp.sqrt(var)


def _pad_lanes(x, axis):
    size = x.shape[axis]
    pad = (-size) % LANES
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


@partial(jax.jit, static_argnames=("interpret",))
def fused_column_softargmax(x, interpret: bool = False):
    """x: (B, H, W, L) boundary logits ->
    (softmax (B,H,W,L), positions (B,W,L), std (B,W,L)), fused on TPU.
    """
    B, H, W, L = x.shape
    # (B, H, W, L) -> (B*L, H, W): put the reduced axis in sublanes and W in
    # lanes.
    xt = x.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(B * L, H, W)
    xt, W0 = _pad_lanes(xt, 2)
    Wp = xt.shape[2]

    grid = (B * L, Wp // LANES)
    sm, pos, std = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, H, LANES), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec((1, H, LANES), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * L, H, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B * L, 1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B * L, 1, Wp), jnp.float32),
        ],
        interpret=interpret,
    )(xt)

    sm = sm[:, :, :W0].reshape(B, L, H, W0).transpose(0, 2, 3, 1)
    pos = pos[:, 0, :W0].reshape(B, L, W0).transpose(0, 2, 1)
    std = std[:, 0, :W0].reshape(B, L, W0).transpose(0, 2, 1)
    return sm, pos, std


def reference_column_softargmax(x):
    """Plain-XLA equivalent (what LayerEngine computes step by step)."""
    x = x.astype(jnp.float32)
    sm = jax.nn.softmax(x, axis=1)
    rows = jnp.arange(x.shape[1], dtype=jnp.float32)[None, :, None, None]
    pos = jnp.sum(sm * rows, axis=1)
    std = jnp.sqrt(jnp.sum(sm * (rows - pos[:, None]) ** 2, axis=1))
    return sm, pos, std
