"""Res2Net-50 v1b (26w x 4s) backbone — native NHWC Flax.

MSNet/M2SNet import ``res2net50_v1b_26w_4s`` from an external ``basics``
package that is missing from the reference repo (``M2SNet_2021.py:18``; see
SURVEY.md §2.3), so the backbone is implemented natively from the public
Res2Net-v1b architecture (Gao et al., TPAMI 2021):

- deep stem: three 3x3 convs (32, 32, 64) stride 2-1-1 + BN/ReLU + maxpool;
- Bottle2neck: 1x1 -> width*scale (width = planes*26/64, scale = 4), splits
  processed hierarchically (split_i + prev -> 3x3 conv), 'stage' blocks
  avg-pool the last split; 1x1 expansion x4;
- v1b downsample: AvgPool(stride) -> 1x1 conv -> BN.

No pretrained weights are available in this environment (documented
divergence from ``pretrained=...``); the structure keeps torch layout for
later checkpoint import.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv, kaiming_normal_init
from ..ops.pooling import avg_pool, max_pool


def _avg_pool_pad(x, k, stride, padding):
    import jax

    x = jnp.pad(
        x, ((0, 0), (padding, padding), (padding, padding), (0, 0))
    )
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, k, k, 1), (1, stride, stride, 1), "VALID",
    )
    return (s / (k * k)).astype(x.dtype)


class Bottle2neck(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    base_width: int = 26
    scale: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * self.base_width / 64.0)
        stage = self.downsample  # 'stage' style when a downsample exists

        def bn(h):
            return BatchNorm(dtype=self.dtype)(h, use_running_average=not train)

        out = Conv(width * self.scale, 1, 1, 0, use_bias=False,
                   kernel_init=kaiming_normal_init, dtype=self.dtype)(x)
        out = nn.relu(bn(out))

        splits = jnp.split(out, self.scale, axis=-1)
        outs = []
        sp = None
        for i in range(self.scale - 1):
            sp = splits[i] if (i == 0 or stage) else sp + splits[i]
            sp = Conv(width, 3, self.strides, 1, use_bias=False,
                      kernel_init=kaiming_normal_init, dtype=self.dtype)(sp)
            sp = nn.relu(bn(sp))
            outs.append(sp)
        if stage:
            last = (
                _avg_pool_pad(splits[-1], 3, self.strides, 1)
                if self.strides > 1
                else splits[-1]
            )
        else:
            last = splits[-1]
        outs.append(last)
        out = jnp.concatenate(outs, axis=-1)

        out = Conv(self.planes * 4, 1, 1, 0, use_bias=False,
                   kernel_init=kaiming_normal_init, dtype=self.dtype)(out)
        out = bn(out)

        identity = x
        if self.downsample:
            identity = (
                avg_pool(x, self.strides, self.strides)
                if self.strides > 1
                else x
            )
            identity = Conv(self.planes * 4, 1, 1, 0, use_bias=False,
                            kernel_init=kaiming_normal_init,
                            dtype=self.dtype)(identity)
            identity = bn(identity)
        return nn.relu(out + identity)


class Res2Net50Features(nn.Module):
    """Stem + layer1..4, returning [x1 (post-maxpool), x2, x3, x4, x5] —
    the five maps MSNet consumes (``M2SNet_2021.py:100-113``)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h):
            return BatchNorm(dtype=self.dtype)(h, use_running_average=not train)

        # v1b deep stem
        h = Conv(32, 3, 2, 1, use_bias=False,
                 kernel_init=kaiming_normal_init, dtype=self.dtype)(x)
        h = nn.relu(bn(h))
        h = Conv(32, 3, 1, 1, use_bias=False,
                 kernel_init=kaiming_normal_init, dtype=self.dtype)(h)
        h = nn.relu(bn(h))
        h = Conv(64, 3, 1, 1, use_bias=False,
                 kernel_init=kaiming_normal_init, dtype=self.dtype)(h)
        h = nn.relu(bn(h))
        x1 = max_pool(h, 3, 2, padding=1)

        stages = []
        h = x1
        in_ch = 64
        for i, n_blocks in enumerate((3, 4, 6, 3)):
            planes = 64 * 2**i
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                needs_ds = j == 0 and (strides != 1 or in_ch != planes * 4)
                h = Bottle2neck(planes, strides, needs_ds,
                                dtype=self.dtype)(h, train)
                in_ch = planes * 4
            stages.append(h)
        return [x1] + stages
