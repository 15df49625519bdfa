"""SD_Layer_Net U-Net backbones (reference ``SD_Layer_Net/unet.py``).

``U_Net`` (:8-75), ``AttU_Net`` (:76-152, attention gates on every skip),
``AttU_Net4`` (:153-214, 4-level variant). Residual conv blocks and bilinear
up-convs from ``common``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..blocks import Conv
from ...ops.pooling import max_pool
from .common import AttentionGate, ResConvBlock, UpConv


class UNetBackbone(nn.Module):
    out_channels: int = 1
    channels: Sequence[int] = (64, 128, 256, 512, 1024)
    attention: bool = False
    drop_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = list(self.channels)
        levels = len(chans)

        skips = []
        h = x
        for i, c in enumerate(chans):
            if i > 0:
                h = max_pool(h, 2)
            h = ResConvBlock(c, 3, self.drop_rate, self.dtype)(h, train)
            skips.append(h)

        for lvl in range(levels - 2, -1, -1):
            h = UpConv(chans[lvl], self.drop_rate, self.dtype)(h, train)
            skip = skips[lvl]
            if self.attention:
                skip = AttentionGate(chans[lvl] // 2, self.dtype)(
                    h, skip, train
                )
            h = jnp.concatenate([skip, h], axis=-1)
            h = ResConvBlock(chans[lvl], 3, self.drop_rate, self.dtype)(
                h, train
            )
        return Conv(self.out_channels, 1, 1, 0, dtype=self.dtype)(h)


def U_Net(output_ch=1, channels=(64, 128, 256, 512, 1024), drop_rate=0.0,
          dtype=None):
    return UNetBackbone(output_ch, tuple(channels), False, drop_rate, dtype)


def AttU_Net(output_ch=1, channels=(64, 128, 256, 512, 1024), drop_rate=0.0,
             dtype=None):
    return UNetBackbone(output_ch, tuple(channels), True, drop_rate, dtype)


def AttU_Net4(output_ch=1, channels=(64, 128, 256, 512), drop_rate=0.0,
              dtype=None):
    return UNetBackbone(output_ch, tuple(channels), True, drop_rate, dtype)
