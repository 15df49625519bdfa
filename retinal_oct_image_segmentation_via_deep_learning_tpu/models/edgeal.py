"""EdgeAL FFC-ResNet generator (NHWC Flax).

Capability source: reference ``SOTAS/Lesions_Segment/EdgeAL_2021.py:411-494``
(an FFC-ResNet generator, LaMa-style): ReflectionPad(3) + 7x7 FFC stem ->
3 stride-2 FFC downsamples (last switches ratio_gout to the resnet ratio) ->
9 FFC resnet blocks -> stream concat -> 3 ConvTranspose k3s2 upsamples with
BN+ReLU -> ReflectionPad(3) + 7x7 conv head -> tanh. Default channel ratios
ratio_gin = ratio_gout = 0.75 (``:418``), ReLU activations throughout.

The FFC primitives live in ``models.ffc`` (single shared implementation —
the reference duplicates the stack three times). The optional
``LearnableSpatialTransformWrapper`` path (``:73-106``) is available via
``ops.sampling.reference_rotate``; the default configuration
(``spatial_transform_layers=None``) does not use it, matching the reference.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv, ConvTranspose
from .ffc import FFC_BN_ACT, FFCResnetBlock, concat_stream
from ..ops.padding import reflect_pad_2d


class EdgeAL(nn.Module):
    num_classes: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    ratio_gin: float = 0.75
    ratio_gout: float = 0.75
    max_features: int = 1024
    add_out_act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ngf, mf = self.ngf, self.max_features
        r_in, r_out = self.ratio_gin, self.ratio_gout

        h = reflect_pad_2d(x, 3)
        stream = FFC_BN_ACT(
            ngf, 7, 0.0, r_out, padding=0, act="relu", dtype=self.dtype,
        )((h, None), train)

        for i in range(self.n_downsampling):
            gout = r_in if i == self.n_downsampling - 1 else r_out
            stream = FFC_BN_ACT(
                min(mf, ngf * 2 ** (i + 1)), 3, r_in, gout,
                strides=2, padding=1, act="relu", dtype=self.dtype,
            )(stream, train)

        feats = min(mf, ngf * 2**self.n_downsampling)
        for _ in range(self.n_blocks):
            stream = FFCResnetBlock(
                feats, r_in, r_in, act="relu", dtype=self.dtype,
            )(stream, train)

        h = concat_stream(stream)

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTranspose(
                min(mf, int(ngf * mult / 2)), 3, 2, 1, output_padding=1,
                dtype=self.dtype,
            )(h)
            h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
            h = nn.relu(h)

        h = reflect_pad_2d(h, 3)
        h = Conv(self.num_classes, 7, 1, 0, dtype=self.dtype)(h)
        return jnp.tanh(h) if self.add_out_act else h


def build_edgeal(in_channels: int = 3, num_classes: int = 3, **kw):
    del in_channels
    return EdgeAL(num_classes=num_classes, **kw)
