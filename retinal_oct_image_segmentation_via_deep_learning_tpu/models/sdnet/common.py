"""SD_Layer_Net shared blocks (reference ``SD_Layer_Net/common.py``).

- ``ResConvBlock`` (:6-26): init_conv + (conv-BN-drop-act-conv-BN-drop)
  residual add + final activation.
- ``UpConv`` (:28-41): bilinear(align_corners=True) x2 + conv-BN-drop-act.
- ``straight_through_round`` (:43-53): round forward, identity backward —
  the ``stop_gradient`` formulation.
- Attention gate: the reference ``Attention_block`` (:64-89) cannot be
  constructed as written (its constructor keywords mismatch the call sites in
  ``unet.py:92-104`` — SURVEY.md §7 hard-part 8); the intended Oktay-style
  gate semantics are implemented here.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..blocks import BatchNorm, Conv
from ...ops.resize import upsample


def straight_through_round(x):
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


class Drop2d(nn.Module):
    """torch Dropout2d: drops whole channels."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0:
            return x
        return nn.Dropout(self.rate, broadcast_dims=(1, 2),
                          deterministic=not train)(x)


class ResConvBlock(nn.Module):
    features: int
    kernel_size: int = 3
    drop_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        init = Conv(self.features, k, 1, k // 2, dtype=self.dtype)(x)
        h = Conv(self.features, k, 1, k // 2, dtype=self.dtype)(init)
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = Drop2d(self.drop_rate)(h, train)
        h = nn.relu(h)
        h = Conv(self.features, k, 1, k // 2, dtype=self.dtype)(h)
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = Drop2d(self.drop_rate)(h, train)
        return nn.relu(h + init)


class UpConv(nn.Module):
    features: int
    drop_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample(x, 2, "bilinear", align_corners=True)
        x = Conv(self.features, 3, 1, 1, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        x = Drop2d(self.drop_rate)(x, train)
        return nn.relu(x)


class AttentionGate(nn.Module):
    f_int: int
    dtype: Any = None

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        def cb(h, feats):
            h = Conv(feats, 1, 1, 0, dtype=self.dtype)(h)
            return BatchNorm(dtype=self.dtype)(h, use_running_average=not train)

        g1 = cb(g, self.f_int)
        x1 = cb(x, self.f_int)
        psi = nn.relu(g1 + x1)
        psi = cb(psi, 1)
        return x * nn.sigmoid(psi)
