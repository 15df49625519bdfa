"""BioNet (Zhang et al. 2020) — knowledge-infused choroid segmentation.

Capability source: reference ``SOTAS/Layers_Segment/BioNet_2020.py``.
Two-stage cascade + biomarker regularizer:
- GMS U-Net segments global layers (``:101``); its output concats with the
  input into the LCS U-Net for choroid (``:104,119-122``);
- input + seg feeds a ResNet-18 regression head (1x1 conv -> resnet features
  -> GAP -> FC(512,1)) as the biomarker regularization signal (``:77-94``).
Forward returns ``(seg_pred, gms_out, bio_out)`` (``:128``).

Internal U-Net is the reference's 3-level variant (``:24-75``: 4 encoder
stages, 3 decoder stages). The ResNet-18 is the native NHWC implementation in
``models.resnet`` (torchvision pretrained weights are unavailable in this
environment; structure is torchvision-compatible for later checkpoint import
— documented divergence from ``pretrained=True``, ``:82``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv, ConvTranspose
from .resnet import ResNetFeatures
from ..ops.pooling import max_pool


class _ConvBlock(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = Conv(self.features, 3, 1, 1, dtype=self.dtype)(x)
            x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
        return x


class BioUNet(nn.Module):
    """Reference internal ``UNet`` (BioNet_2020.py:24-75)."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        e1 = _ConvBlock(64, self.dtype)(x, train)
        e2 = _ConvBlock(128, self.dtype)(max_pool(e1, 2), train)
        e3 = _ConvBlock(256, self.dtype)(max_pool(e2, 2), train)
        e4 = _ConvBlock(512, self.dtype)(max_pool(e3, 2), train)

        d = ConvTranspose(256, 2, 2, dtype=self.dtype)(e4)
        d = _ConvBlock(256, self.dtype)(jnp.concatenate([e3, d], -1), train)
        d = ConvTranspose(128, 2, 2, dtype=self.dtype)(d)
        d = _ConvBlock(128, self.dtype)(jnp.concatenate([e2, d], -1), train)
        d = ConvTranspose(64, 2, 2, dtype=self.dtype)(d)
        d = _ConvBlock(64, self.dtype)(jnp.concatenate([e1, d], -1), train)
        return Conv(self.out_channels, 1, 1, 0, dtype=self.dtype)(d)


class BioRegularization(nn.Module):
    """1x1 to 3ch -> ResNet-18 features -> GAP -> FC(512, 1)
    (reference :77-94)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(3, 1, 1, 0, dtype=self.dtype)(x)
        x = ResNetFeatures(dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(1, dtype=self.dtype)(x)


class BioNet(nn.Module):
    num_classes: int = 1
    gms_channels: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        gms_out = BioUNet(self.gms_channels, self.dtype)(x, train)
        lcs_in = jnp.concatenate([x, gms_out], axis=-1)
        seg_pred = BioUNet(self.num_classes, self.dtype)(lcs_in, train)
        bio_in = jnp.concatenate([x, seg_pred], axis=-1)
        bio_out = BioRegularization(self.dtype)(bio_in, train)
        return seg_pred, gms_out, bio_out


def build_bionet(in_channels: int = 1, num_classes: int = 1,
                 gms_channels: int = 2, **kw):
    del in_channels
    return BioNet(num_classes=num_classes, gms_channels=gms_channels, **kw)
