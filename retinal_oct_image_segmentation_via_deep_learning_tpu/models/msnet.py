"""MSNet / M2SNet (Zhao et al., MICCAI 2021) — multi-scale subtraction nets.

Capability source: reference ``SOTAS/Layers_Segment/M2SNet_2021.py``.
- Res2Net-50 backbone (missing external dep in the reference; native
  implementation in ``models.res2net``) produces 5 feature maps which are
  projected to 64ch (``:69-72``).
- **MSNet** (``:58-150``): cascaded pairwise subtraction pyramid —
  |upsample(hi) - lo| conv units over 4 levels, aggregated top-down with
  upsample+add conv heads.
- **M2SNet** (``:154-354``): adds intra-scale multi-kernel subtraction using
  *shared* grouped 3x3/5x5 conv-BN-ReLU filters (``CNN1``, :38-56;
  conv_3/conv_5 shared across all subtraction units): each unit sums
  |a-b| + |c3(a)-c3(b)| + |c5(a)-c5(b)|.
- **LossNet** (``:341-375``): VGG-16-slice perceptual loss (native VGG
  features; torchvision pretrained weights unavailable here — documented
  divergence), frozen, summing MSE over 4 feature depths.

All upsamples are bilinear align_corners=False (torch ``F.upsample``
default), PyTorch-exact via ``ops.resize``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv
from .res2net import Res2Net50Features
from ..ops.resize import resize_bilinear


class ConvBR(nn.Module):
    """conv3-BN-ReLU projection (the reference's ubiquitous Sequential)."""

    features: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, 3, 1, 1, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        return nn.relu(x)


class CNN1(nn.Module):
    """Shared grouped conv-BN-ReLU filter (reference ``CNN1``, :38-56)."""

    kernel: int
    pad: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = Conv(c, self.kernel, 1, self.pad, feature_group_count=c,
                 dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        return nn.relu(x)


class _MSNetBase(nn.Module):
    num_classes: int = 1
    multi_kernel: bool = False  # False -> MSNet, True -> M2SNet
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_hw = x.shape[1:3]
        x1, x2, x3, x4, x5 = Res2Net50Features(dtype=self.dtype)(x, train)

        if self.multi_kernel:
            conv_3 = CNN1(3, 1, self.dtype)
            conv_5 = CNN1(5, 2, self.dtype)

            def sub(hi, lo):
                hi_up = resize_bilinear(hi, lo.shape[1:3])
                d = jnp.abs(hi_up - lo)
                d = d + jnp.abs(conv_3(hi_up, train) - conv_3(lo, train))
                d = d + jnp.abs(conv_5(hi_up, train) - conv_5(lo, train))
                return d
        else:
            def sub(hi, lo):
                return jnp.abs(resize_bilinear(hi, lo.shape[1:3]) - lo)

        dem5 = ConvBR(dtype=self.dtype)(x5, train)
        dem4 = ConvBR(dtype=self.dtype)(x4, train)
        dem3 = ConvBR(dtype=self.dtype)(x3, train)
        dem2 = ConvBR(dtype=self.dtype)(x2, train)

        unit = lambda: ConvBR(dtype=self.dtype)

        x5_4 = unit()(sub(dem5, dem4), train)
        x4_3 = unit()(sub(dem4, dem3), train)
        x3_2 = unit()(sub(dem3, dem2), train)
        x2_1 = unit()(sub(dem2, x1), train)

        x5_4_3 = unit()(sub(x5_4, x4_3), train)
        x4_3_2 = unit()(sub(x4_3, x3_2), train)
        x3_2_1 = unit()(sub(x3_2, x2_1), train)

        x5_4_3_2 = unit()(sub(x5_4_3, x4_3_2), train)
        x4_3_2_1 = unit()(sub(x4_3_2, x3_2_1), train)

        x5_dem_4 = unit()(x5_4_3_2, train)
        x5_4_3_2_1 = unit()(sub(x5_dem_4, x4_3_2_1), train)

        level4 = x5_4
        level3 = unit()(x4_3 + x5_4_3, train)
        level2 = unit()(x3_2 + x4_3_2 + x5_4_3_2, train)
        level1 = unit()(x2_1 + x3_2_1 + x4_3_2_1 + x5_4_3_2_1, train)

        x5_dem_5 = ConvBR(dtype=self.dtype)(x5, train)
        out = unit()(
            resize_bilinear(x5_dem_5, level4.shape[1:3]) + level4, train
        )
        out = unit()(resize_bilinear(out, level3.shape[1:3]) + level3, train)
        out = unit()(resize_bilinear(out, level2.shape[1:3]) + level2, train)
        out = Conv(self.num_classes, 3, 1, 1, dtype=self.dtype)(
            resize_bilinear(out, level1.shape[1:3]) + level1
        )
        return resize_bilinear(out, in_hw)


class VGG16Slices(nn.Module):
    """VGG-16 ``features[:23]`` split at indices 4/9/16/23 (LossNet, :344-348).
    Random init (no pretrained weights available) — structure-faithful."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.pooling import max_pool

        feats = []
        cfg = [  # (channels per conv, pool-after)
            ([64, 64], False),          # features[:4] = conv relu conv relu
            ([128, 128], True),         # [4:9] = pool conv relu conv relu
            ([256, 256, 256], True),    # [9:16]
            ([512, 512, 512], True),    # [16:23]
        ]
        h = x
        for convs, pool_first in cfg:
            if pool_first:
                h = max_pool(h, 2)
            for c in convs:
                h = Conv(c, 3, 1, 1, dtype=self.dtype)(h)
                h = nn.relu(h)
            feats.append(h)
        return feats


class LossNet(nn.Module):
    """Perceptual loss (reference ``LossNet``, :341-375)."""

    resize: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, target):
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])

        def prep(t):
            if t.shape[-1] != 3:
                t = jnp.tile(t, (1, 1, 1, 3))
            t = (t - mean) / std
            if self.resize:
                t = resize_bilinear(t, (224, 224))
            return t

        vgg = VGG16Slices(dtype=self.dtype)
        fx = vgg(prep(inputs))
        fy = vgg(prep(target))
        loss = 0.0
        for a, b in zip(fx, fy):
            loss = loss + jnp.mean(
                (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2
            )
        return loss


def build_msnet(in_channels: int = 3, num_classes: int = 1, **kw):
    del in_channels
    return _MSNetBase(num_classes=num_classes, multi_kernel=False, **kw)


def build_m2snet(in_channels: int = 3, num_classes: int = 1, **kw):
    del in_channels
    return _MSNetBase(num_classes=num_classes, multi_kernel=True, **kw)
