"""ReLayNet (Roy et al. 2017) — retinal layer + fluid FCN, NHWC Flax.

Capability source: reference ``SOTAS/Lesions_Segment/ReLayNet_2017.py`` —
3 encoder blocks + bottleneck + 3 decoder blocks. Each block is a single
asymmetric 7x3 conv (padding (3,1)) -> BN -> PReLU
(``ReLayNet_2017.py:151-159``); encoders max-pool with indices (``:171``),
decoders MaxUnpool with those indices then concat [skip, unpooled]
(``:182-187`` — note skip comes FIRST in the concat); 1x1 classifier head
returns logits (softmax commented out in the reference, ``:199-201``).

TPU notes: the index unpool uses the reshape/argmax formulation in
``ops.pooling`` (vectorized one-hot scatter, no torch-style global flat
indices needed); 7x3 convs map to MXU fine in NHWC.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv, PReLU
from ..ops.pooling import max_pool_argmax, max_unpool


class ReLayNetBlock(nn.Module):
    """7x3 conv -> BN -> PReLU (reference ``BasicBlock``, :133-165)."""

    features: int
    kernel_h: int = 7
    kernel_w: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ph, pw = (self.kernel_h - 1) // 2, (self.kernel_w - 1) // 2
        x = Conv(
            self.features, (self.kernel_h, self.kernel_w), 1, (ph, pw),
            dtype=self.dtype,
        )(x)
        x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        return PReLU()(x)


class ReLayNet(nn.Module):
    """Reference ``ReLayNet`` (:21-116); returns NHWC logits."""

    num_classes: int = 10
    num_filters: int = 64
    kernel_h: int = 7
    kernel_w: int = 3
    pool: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, kh, kw = self.num_filters, self.kernel_h, self.kernel_w
        block = lambda: ReLayNetBlock(f, kh, kw, self.dtype)

        skips, indices = [], []
        for _ in range(3):
            s = block()(x, train)
            x, idx = max_pool_argmax(s, self.pool)
            skips.append(s)
            indices.append(idx)

        x = block()(x, train)  # bottleneck

        for s, idx in zip(reversed(skips), reversed(indices)):
            up = max_unpool(x, idx, self.pool)
            x = block()(jnp.concatenate([s, up], axis=-1), train)

        return Conv(self.num_classes, 1, 1, 0, dtype=self.dtype)(x)


def build_relaynet(in_channels: int = 1, num_classes: int = 10, **kw):
    del in_channels
    return ReLayNet(num_classes=num_classes, **kw)
