"""ISLAM (Islam et al., MIDL 2024) — probabilistic-SDF ResUNet++, NHWC Flax.

Capability source: reference ``SOTAS/Layers_Segment/ISLAM_2024.py``.
- SE-gated stem + five SE-residual stride-2 encoder stages 16->512
  (``:32-80,232-238``), pre-activation residual blocks with 1x1 shortcut.
- ASPP bottleneck: four dilated 3x3 conv+BN branches (rates 1/6/12/18)
  summed then 1x1 (``:82-133``); grouped + GroupNorm variant for the
  single-head decoder.
- Attention-gated decoder blocks: gate = maxpooled skip conv + upstream conv
  -> conv -> multiply; nearest x2 upsample, concat skip, SE-residual block
  (``:135-203``).
- Output modes (``:249-311``): multi-head = three ``CustomHead``s (Decoder +
  ASPP + 1x1), optionally with three ReLU log-variance heads for the
  Gaussian/probabilistic SDF output; single-head = grouped(3) decoder chain
  81 -> 27 -> 9 -> num_classes. Optional input InstanceNorm (``:278-279``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv
from ..ops.pooling import max_pool


def instance_norm(x, eps=1e-5):
    """torch InstanceNorm2d default (no affine, no running stats)."""
    m = jnp.mean(x, axis=(1, 2), keepdims=True)
    v = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - m) / jnp.sqrt(v + eps)


class SqueezeExcitation(nn.Module):
    """GAP -> Linear/r -> ReLU -> Linear -> sigmoid gate (reference :13-30)."""

    r: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(c // self.r, use_bias=False, dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(c, use_bias=False, dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class StemBlock(nn.Module):
    """conv-BN-ReLU-conv + 1x1-BN shortcut, SE gate (reference :32-54)."""

    features: int
    strides: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv(self.features, 3, self.strides, 1, dtype=self.dtype)(x)
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = Conv(self.features, 3, 1, 1, dtype=self.dtype)(h)
        s = Conv(self.features, 1, self.strides, 0, dtype=self.dtype)(x)
        s = BatchNorm(dtype=self.dtype)(s, use_running_average=not train)
        return SqueezeExcitation(dtype=self.dtype)(h + s)


class ResNetBlock(nn.Module):
    """Pre-activation residual block + SE gate (reference :56-80)."""

    features: int
    strides: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        h = nn.relu(h)
        h = Conv(self.features, 3, self.strides, 1, dtype=self.dtype)(h)
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = Conv(self.features, 3, 1, 1, dtype=self.dtype)(h)
        s = Conv(self.features, 1, self.strides, 0, dtype=self.dtype)(x)
        s = BatchNorm(dtype=self.dtype)(s, use_running_average=not train)
        return SqueezeExcitation(dtype=self.dtype)(h + s)


class ASPP(nn.Module):
    """Summed dilated branches + 1x1 (reference :82-133)."""

    features: int
    rates: tuple = (1, 6, 12, 18)
    groups: int = 1
    group_norm: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        acc = None
        for r in self.rates:
            y = Conv(self.features, 3, 1, r, kernel_dilation=r,
                     feature_group_count=self.groups, dtype=self.dtype)(x)
            if self.group_norm:
                y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                                 dtype=self.dtype)(y)
            else:
                y = BatchNorm(dtype=self.dtype)(y, use_running_average=not train)
            acc = y if acc is None else acc + y
        return Conv(self.features, 1, 1, 0,
                    feature_group_count=self.groups, dtype=self.dtype)(acc)


class AttentionBlock(nn.Module):
    """Gate from (encoder skip g, upstream x) (reference :135-165)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        gp = BatchNorm(dtype=self.dtype)(g, use_running_average=not train)
        gp = nn.relu(gp)
        gp = Conv(self.features, 3, 1, 1, dtype=self.dtype)(gp)
        gp = max_pool(gp, 2)
        xc = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        xc = nn.relu(xc)
        xc = Conv(self.features, 3, 1, 1, dtype=self.dtype)(xc)
        gc = BatchNorm(dtype=self.dtype)(gp + xc, use_running_average=not train)
        gc = nn.relu(gc)
        gc = Conv(self.features, 3, 1, 1, dtype=self.dtype)(gc)
        return gc * x


class DecoderBlock(nn.Module):
    """attention -> nearest x2 -> concat skip -> SE-residual (reference :190-203)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        d = AttentionBlock(x.shape[-1], self.dtype)(g, x, train)
        d = jnp.repeat(jnp.repeat(d, 2, axis=1), 2, axis=2)  # nearest x2
        d = jnp.concatenate([d, g], axis=-1)
        return ResNetBlock(self.features, 1, self.dtype)(d, train)


class CustomHead(nn.Module):
    """Decoder + ASPP + 1x1 head (reference :167-188)."""

    num_class: int = 1
    activation: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, c1, d5, train: bool = False):
        d6 = DecoderBlock(32, self.dtype)(c1, d5, train)
        out = ASPP(8, dtype=self.dtype)(d6, train)
        out = Conv(self.num_class, 1, 1, 0, dtype=self.dtype)(out)
        return nn.relu(out) if self.activation else out


class ISLAM(nn.Module):
    """Reference ``ISLAM`` (:205-311)."""

    num_classes: int = 3
    gaussian_output: bool = False
    out_act: bool = False
    group_norm: bool = False
    use_multi_head: bool = False
    use_input_instance_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_input_instance_norm:
            x = instance_norm(x)
        c1 = StemBlock(16, 1, self.dtype)(x, train)
        c2 = ResNetBlock(32, 2, self.dtype)(c1, train)
        c3 = ResNetBlock(64, 2, self.dtype)(c2, train)
        c4 = ResNetBlock(128, 2, self.dtype)(c3, train)
        c5 = ResNetBlock(256, 2, self.dtype)(c4, train)
        c6 = ResNetBlock(512, 2, self.dtype)(c5, train)

        b1 = ASPP(1024, dtype=self.dtype)(c6, train)

        d2 = DecoderBlock(512, self.dtype)(c5, b1, train)
        d3 = DecoderBlock(256, self.dtype)(c4, d2, train)
        d4 = DecoderBlock(128, self.dtype)(c3, d3, train)

        if self.use_multi_head:
            d5 = DecoderBlock(64, self.dtype)(c2, d4, train)
            heads = [
                CustomHead(1, self.out_act, self.dtype)(c1, d5, train)
                for _ in range(3)
            ]
            out = jnp.concatenate(heads, axis=-1)
            if self.gaussian_output:
                log_vars = [
                    CustomHead(1, True, self.dtype)(c1, d5, train)
                    for _ in range(3)
                ]
                return out, jnp.concatenate(log_vars, axis=-1)
            return out
        d5 = DecoderBlock(81, self.dtype)(c2, d4, train)
        d6 = DecoderBlock(81, self.dtype)(c1, d5, train)
        out = ASPP(27, groups=3, group_norm=self.group_norm,
                   dtype=self.dtype)(d6, train)
        out = Conv(9, 1, 1, 0, feature_group_count=3, dtype=self.dtype)(out)
        if self.group_norm:
            out = nn.GroupNorm(num_groups=3, epsilon=1e-5, dtype=self.dtype)(out)
        return Conv(self.num_classes, 1, 1, 0, dtype=self.dtype)(out)


def build_islam(in_channels: int = 1, num_classes: int = 3, **kw):
    del in_channels
    return ISLAM(num_classes=num_classes, **kw)
