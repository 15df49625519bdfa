"""WAT-Net (Wang & Gan 2022) — wavelet-attention U-Net, NHWC Flax.

Capability source: reference ``SOTAS/Layers_Segment/WAT_SegNet_2022.py``.
U-Net (64..1024) with a **wavelet-attention SE gate** at every scale:
``WAT`` (``:41-68``) Haar-DWTs the feature map, squeezes spatial mean of
(cA + cH), excites through FC -> ReLU -> FC -> sigmoid, and gates the
*undecomposed* input channels. The decoder **reuses the same WAT modules**
as the encoder (``:131-146`` call DWT4..DWT1 again) — weights shared, which
this implementation preserves via setup-bound submodules.

The reference's ``DWT_2D`` import is broken (missing external package,
``:15``); the native Haar transform lives in ``ops.dwt`` (pure reshape
arithmetic — no conv).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv, ConvTranspose
from ..ops.dwt import haar_dwt2d
from ..ops.pooling import max_pool


class X2Conv(nn.Module):
    """conv3(no bias)-BN-ReLU x2 with inner = out//2 (reference ``x2conv``,
    :30-39)."""

    features: int
    inner: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner = self.inner if self.inner is not None else self.features // 2
        for f in (inner, self.features):
            x = Conv(f, 3, 1, 1, use_bias=False, dtype=self.dtype)(x)
            x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
        return x


class WAT(nn.Module):
    """Wavelet-attention SE gate (reference ``WAT``, :41-68)."""

    reduction_ratio: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ca, ch, _, _ = haar_dwt2d(x.astype(jnp.float32))
        squeeze = jnp.mean(ca + ch, axis=(1, 2))  # (B, C)
        s = nn.Dense(c // self.reduction_ratio, dtype=self.dtype)(
            squeeze.astype(x.dtype)
        )
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class WATNet(nn.Module):
    """Reference ``WATNet`` (:70-150); returns NHWC logits."""

    num_classes: int = 4
    dtype: Any = None

    def setup(self):
        self.start_conv = X2Conv(64, dtype=self.dtype)
        self.convs = [X2Conv(f, dtype=self.dtype) for f in (128, 256, 512, 1024)]
        self.middle_conv = X2Conv(1024, dtype=self.dtype)
        # One WAT per width; shared between encoder and decoder (:131-146).
        self.wats = [WAT(dtype=self.dtype) for _ in range(4)]
        self.uppools = [
            ConvTranspose(f, 2, 2, dtype=self.dtype) for f in (512, 256, 128, 64)
        ]
        self.dec_convs = [
            X2Conv(f, dtype=self.dtype) for f in (512, 256, 128, 64)
        ]
        self.final_conv = Conv(self.num_classes, 1, 1, 0, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        skips = []
        h = self.start_conv(x, train)
        h = self.wats[0](h)
        skips.append(h)
        for i in range(3):
            h = max_pool(h, 2)
            h = self.convs[i](h, train)
            h = self.wats[i + 1](h)
            skips.append(h)
        h = max_pool(h, 2)
        h = self.convs[3](h, train)
        h = self.middle_conv(h, train)

        for i in range(4):
            lvl = 3 - i
            h = self.uppools[i](h)
            h = jnp.concatenate([skips[lvl], h], axis=-1)
            h = self.dec_convs[i](h, train)
            h = self.wats[lvl](h)
        return self.final_conv(h)


def build_watnet(in_channels: int = 3, num_classes: int = 4, **kw):
    del in_channels
    return WATNet(num_classes=num_classes, **kw)
