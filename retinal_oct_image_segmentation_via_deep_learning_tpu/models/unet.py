"""U-Net and Y-Net (spatiospectral dual-encoder) — NHWC Flax.

Capability source: reference ``SOTAS/Lesions_Segment/YNet_2022.py`` —
``UNet``:509 (4-level encoder [f,2f,4f,8f], 16f bottleneck, k2s2
transpose-conv decoder with skip concats, 1x1 head + Softmax2d) and
``YNet_general``:605 (second spectral encoder of 1x1-kernel FFC_BN_ACT
stages carrying a (local, global) stream, ``cat_merge`` bottleneck fusion,
optional ``skip_ffc`` dual-skip decoder). The Layers_Segment extensionless
``YNet_2022`` file is the same network (num_classes=9 default) and is served
by this single implementation.

Forward returns **logits** by default (``apply_softmax=False``); the
reference applies ``Softmax2d`` in-graph (``YNet_2022.py:602,843``) — set
``apply_softmax=True`` for per-pixel parity with reference outputs.

TPU design notes: NHWC layout; channel widths are multiples of 32 for f>=32
(lane-friendly); pooling via ``lax.reduce_window``; the decoder's
transpose-convs use the torch-exact input-dilated form (blocks.ConvTranspose)
so converted torch weights reproduce reference outputs per-pixel.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from .blocks import BatchNorm, Conv, ConvTranspose
from .ffc import FFC_BN_ACT, concat_stream
from ..ops.pooling import max_pool


class UNetBlock(nn.Module):
    """conv3x3(no bias)-BN-ReLU twice (reference ``_block``, YNet_2022.py:846)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = Conv(self.features, 3, 1, 1, use_bias=False, dtype=self.dtype)(x)
            # Tag for UNet(remat_policy="conv_out"): under that policy the
            # MXU work (convs) is saved as residuals while the BN/relu
            # chains — the step's bandwidth bottleneck — are recomputed.
            x = checkpoint_name(x, "conv_out")
            x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """Vanilla 4-level U-Net (reference ``UNet``, YNet_2022.py:509-602)."""

    out_channels: int = 1
    init_features: int = 32
    apply_softmax: bool = False
    # Per-stage rematerialization for training at large batch: each
    # UNetBlock's internals (conv outs, BN pre-activations) are recomputed
    # in the backward, so only stage-boundary tensors persist as residuals.
    # A single whole-forward jax.checkpoint does NOT lower peak HBM (the
    # recompute regenerates every residual at once before the backward
    # consumes them); per-stage boundaries do — 512^2 b32 OOM'd 16G by
    # ~255 MB without this, fits with it.
    remat_stages: bool = False
    # remat_policy="conv_out" (with remat_stages): save each block's conv
    # outputs (the MXU results) and recompute only the BN/relu elementwise
    # chains in the backward — cheaper recompute than full-block remat at
    # a modest residual-memory cost (bf16 conv outs only, ~1/3 of the
    # no-remat residual set, which OOMs 16G at 512^2 b32).
    remat_policy: str | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.init_features
        remat_kwargs = {}
        if self.remat_policy == "conv_out":
            remat_kwargs["policy"] = (
                jax.checkpoint_policies.save_only_these_names("conv_out")
            )
        elif self.remat_policy is not None:
            raise ValueError(f"unknown remat_policy {self.remat_policy!r}")
        Block = (
            nn.remat(UNetBlock, static_argnums=(2,), **remat_kwargs)
            if self.remat_stages else UNetBlock
        )
        enc1 = Block(f, self.dtype)(x, train)
        enc2 = Block(f * 2, self.dtype)(max_pool(enc1, 2), train)
        enc3 = Block(f * 4, self.dtype)(max_pool(enc2, 2), train)
        enc4 = Block(f * 8, self.dtype)(max_pool(enc3, 2), train)
        bott = Block(f * 16, self.dtype)(max_pool(enc4, 2), train)

        d = ConvTranspose(f * 8, 2, 2, dtype=self.dtype)(bott)
        d = Block(f * 8, self.dtype)(
            jnp.concatenate([d, enc4], axis=-1), train
        )
        d = ConvTranspose(f * 4, 2, 2, dtype=self.dtype)(d)
        d = Block(f * 4, self.dtype)(
            jnp.concatenate([d, enc3], axis=-1), train
        )
        d = ConvTranspose(f * 2, 2, 2, dtype=self.dtype)(d)
        d = Block(f * 2, self.dtype)(
            jnp.concatenate([d, enc2], axis=-1), train
        )
        d = ConvTranspose(f, 2, 2, dtype=self.dtype)(d)
        d = Block(f, self.dtype)(
            jnp.concatenate([d, enc1], axis=-1), train
        )
        logits = Conv(self.out_channels, 1, 1, 0, dtype=self.dtype)(d)
        if self.apply_softmax:
            return nn.softmax(logits, axis=-1)
        return logits


def _cat_merge_interleave(a, b):
    """The reference's ``cat_merge`` bottleneck fusion (YNet_2022.py:774-787).

    Flattens both tensors in NCHW element order, interleaves them pairwise,
    and reinterprets the result as an NCHW concat — NOT a plain channel
    concat. Reproduced bit-exactly (NHWC arrays are transposed through NCHW
    order for the reshape); one-off at the smallest spatial scale, so cost is
    negligible.
    """
    N, H, W, Ca = a.shape
    Cb = b.shape[-1]
    af = a.transpose(0, 3, 1, 2).reshape(-1)
    bf = b.transpose(0, 3, 1, 2).reshape(-1)
    inter = jnp.stack([af, bf], axis=1).reshape(N, Ca + Cb, H, W)
    return inter.transpose(0, 2, 3, 1)


class YNet(nn.Module):
    """Y-Net dual-encoder U-Net (reference ``YNet_general``, YNet_2022.py:605).

    ``ffc=True`` uses the spectral FFC encoder (1x1 FFC_BN_ACT chain with
    (local, global) streams, per-stream max-pooling, reference ``:733-765``);
    ``ffc=False`` duplicates the spatial encoder. ``cat_merge`` applies the
    reference's interleaving bottleneck fusion.
    """

    num_classes: int = 1
    init_features: int = 32
    ratio_in: float = 0.5
    ffc: bool = True
    skip_ffc: bool = False
    cat_merge: bool = True
    apply_softmax: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.init_features

        # --- spatial encoder (enc4 is 4f, not 8f: reference :626) ---
        enc1 = UNetBlock(f, self.dtype)(x, train)
        enc2 = UNetBlock(f * 2, self.dtype)(max_pool(enc1, 2), train)
        enc3 = UNetBlock(f * 4, self.dtype)(max_pool(enc2, 2), train)
        enc4 = UNetBlock(f * 4, self.dtype)(max_pool(enc3, 2), train)
        enc4_2 = max_pool(enc4, 2)

        # --- second (spectral or duplicate-spatial) encoder ---
        def pool_stream(s):
            l, g = s
            return (
                max_pool(l, 2) if l is not None else None,
                max_pool(g, 2) if g is not None else None,
            )

        if self.ffc:
            r = self.ratio_in
            enc1_f = FFC_BN_ACT(f, 1, 0.0, r, dtype=self.dtype)((x, None), train)
            enc2_f = FFC_BN_ACT(f * 2, 1, r, r, dtype=self.dtype)(
                pool_stream(enc1_f), train
            )
            enc3_f = FFC_BN_ACT(f * 4, 1, r, r, dtype=self.dtype)(
                pool_stream(enc2_f), train
            )
            enc4_f = FFC_BN_ACT(f * 4, 1, r, r, dtype=self.dtype)(
                pool_stream(enc3_f), train
            )
            enc4_f2 = concat_stream(pool_stream(enc4_f))
            skips_f = [concat_stream(s) for s in (enc1_f, enc2_f, enc3_f, enc4_f)]
        else:
            e1 = UNetBlock(f, self.dtype)(x, train)
            e2 = UNetBlock(f * 2, self.dtype)(max_pool(e1, 2), train)
            e3 = UNetBlock(f * 4, self.dtype)(max_pool(e2, 2), train)
            e4 = UNetBlock(f * 4, self.dtype)(max_pool(e3, 2), train)
            enc4_f2 = max_pool(e4, 2)
            skips_f = [e1, e2, e3, e4]

        # --- bottleneck fusion (reference :774-787) ---
        if self.cat_merge:
            bott_in = _cat_merge_interleave(enc4_2, enc4_f2)
        else:
            bott_in = jnp.concatenate([enc4_2, enc4_f2], axis=-1)
        bott = UNetBlock(f * 16, self.dtype)(bott_in, train)

        # --- decoder ---
        skips = [enc1, enc2, enc3, enc4]
        widths = [f, f * 2, f * 4, f * 8]
        d = ConvTranspose(f * 8, 2, 2, dtype=self.dtype)(bott)
        for lvl in (3, 2, 1, 0):
            skip = skips[lvl]
            if self.skip_ffc:
                skip = jnp.concatenate([skip, skips_f[lvl]], axis=-1)
            d = jnp.concatenate([d, skip], axis=-1)
            d = UNetBlock(widths[lvl], self.dtype)(d, train)
            if lvl > 0:
                d = ConvTranspose(widths[lvl - 1], 2, 2, dtype=self.dtype)(d)
        logits = Conv(self.num_classes, 1, 1, 0, dtype=self.dtype)(d)
        if self.apply_softmax:
            return nn.softmax(logits, axis=-1)
        return logits


# --- registry constructors (mirror reference get_model, YNet_2022.py:496) ---


def build_unet(in_channels: int = 1, num_classes: int = 9, **kw):
    del in_channels  # NHWC modules infer input channels
    return UNet(out_channels=num_classes, **kw)


def build_ynet(in_channels: int = 1, num_classes: int = 9, **kw):
    del in_channels
    return YNet(num_classes=num_classes, ffc=False, **kw)


def build_ynet_ffc(
    in_channels: int = 1, num_classes: int = 9, ratio: float = 0.5, **kw
):
    del in_channels
    return YNet(num_classes=num_classes, ffc=True, ratio_in=ratio, **kw)
