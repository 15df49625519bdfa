"""Native ResNet backbones (NHWC Flax), torchvision-layout compatible.

The reference pulls pretrained backbones from torchvision: ResNet-18 in
BioNet (``BioNet_2020.py:82``) and Res2Net-50 in M2SNet (missing external
dep ``basics.res2net``, ``M2SNet_2021.py:18``). This module implements both
families natively with the exact torchvision module structure/order so that
``utils.torch_compat`` can import torchvision checkpoints when they are
available (no pretrained weights ship in this zero-egress environment; random
init is used otherwise, documented divergence).
"""

from __future__ import annotations

from typing import Any, Sequence

from flax import linen as nn

from .blocks import BatchNorm, Conv, kaiming_normal_init
from ..ops.pooling import max_pool


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = Conv(self.features, 3, self.strides, 1, use_bias=False,
                 kernel_init=kaiming_normal_init, dtype=self.dtype)(x)
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = Conv(self.features, 3, 1, 1, use_bias=False,
                 kernel_init=kaiming_normal_init, dtype=self.dtype)(h)
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        if self.downsample:
            identity = Conv(self.features, 1, self.strides, 0, use_bias=False,
                            kernel_init=kaiming_normal_init,
                            dtype=self.dtype)(x)
            identity = BatchNorm(dtype=self.dtype)(
                identity, use_running_average=not train
            )
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    features: int  # width of the 3x3; output is features * 4
    strides: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = Conv(self.features, 1, 1, 0, use_bias=False,
                 kernel_init=kaiming_normal_init, dtype=self.dtype)(x)
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = Conv(self.features, 3, self.strides, 1, use_bias=False,
                 kernel_init=kaiming_normal_init, dtype=self.dtype)(h)
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = Conv(self.features * 4, 1, 1, 0, use_bias=False,
                 kernel_init=kaiming_normal_init, dtype=self.dtype)(h)
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        if self.downsample:
            identity = Conv(self.features * 4, 1, self.strides, 0,
                            use_bias=False, kernel_init=kaiming_normal_init,
                            dtype=self.dtype)(x)
            identity = BatchNorm(dtype=self.dtype)(
                identity, use_running_average=not train
            )
        return nn.relu(h + identity)


class ResNetFeatures(nn.Module):
    """torchvision resnet up to (and excluding) avgpool/fc — the
    ``children()[:-2]`` slice BioNet uses (``BioNet_2020.py:83``).

    Returns the final feature map; ``capture_stages=True`` returns the list
    of per-stage maps [stem, layer1..layer4] (what M2SNet's multi-scale
    pyramid consumes)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # resnet18
    block: str = "basic"  # basic | bottleneck
    capture_stages: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv(64, 7, 2, 3, use_bias=False,
                 kernel_init=kaiming_normal_init, dtype=self.dtype)(x)
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        stem = h
        h = max_pool(h, 3, 2, padding=1)

        Block = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        stages = []
        in_ch = 64
        for i, n_blocks in enumerate(self.stage_sizes):
            width = 64 * 2**i
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                needs_ds = j == 0 and (strides != 1 or in_ch != width * expansion)
                h = Block(width, strides, needs_ds, self.dtype)(h, train)
                in_ch = width * expansion
            stages.append(h)
        if self.capture_stages:
            return [stem] + stages
        return h
