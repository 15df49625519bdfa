"""MGU-Net (Li et al. 2021) — multi-scale graph-reasoning U-Net, NHWC Flax.

Capability source: reference ``SOTAS/Layers_Segment/MGUNet_2021.py``.
- ``GloRe_Unit`` (:110-148): 1x1 state/proj projections N->M, soft adjacency
  softmax(bmm(state, projT)/sqrt(HW)) of shape (M, M), aggregation
  bmm(adj, proj), 1x1 extend M->N, residual add.
- ``MGR_Module`` (:150-194): four parallel branches at pool scales 1/2/3/5,
  each Basconv -> (pool -> Basconv) -> GloRe (M = C, C, C/2, C/2), bilinear
  (align_corners=True) upsample back, concat, 1x1 fuse to in_channels.
- ``MGUNet`` (:198-252): filters [64..1024]/feature_scale, pools 2/4/4,
  decoder ConvTranspose k4s4, k4s4, k2s2 with skip concat;
  ``MGUNet_2`` (:255-341) uses uniform 2/2/2 pools and k2s2 decoders.
- Kaiming-normal conv init; BN scale ~ N(1, 0.02), bias 0 (:334-352).

TPU notes: the GloRe attention is an (M, M) matmul over HW-token features —
pure MXU work; branches are computed sequentially but XLA overlaps them.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv, ConvTranspose, kaiming_normal_init
from ..ops.pooling import max_pool
from ..ops.resize import resize_bilinear

_bn_scale_init = nn.initializers.normal(stddev=0.02)


def _bn(x, train, dtype):
    # BN with N(1, 0.02) scale init to mirror the reference's kaiming pass.
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        scale_init=lambda k, s, d: 1.0 + _bn_scale_init(k, s, d),
        dtype=dtype,
    )(x)


class Basconv(nn.Module):
    """conv-BN-ReLU (reference ``Basconv``, :30-40)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, self.kernel_size, 1, self.padding,
                 kernel_init=kaiming_normal_init, dtype=self.dtype)(x)
        x = _bn(x, train, self.dtype)
        return nn.relu(x)


class UnetConv(nn.Module):
    """(conv3-BN-ReLU) x2 (reference ``UnetConv``, :42-70)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = Conv(self.features, 3, 1, 1,
                     kernel_init=kaiming_normal_init, dtype=self.dtype)(x)
            x = _bn(x, train, self.dtype)
            x = nn.relu(x)
        return x


class GloReUnit(nn.Module):
    """Global reasoning unit (reference ``GloRe_Unit``, :110-148)."""

    m: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        state = Conv(self.m, 1, 1, 0, kernel_init=kaiming_normal_init,
                     dtype=self.dtype)(x)
        proj = Conv(self.m, 1, 1, 0, kernel_init=kaiming_normal_init,
                    dtype=self.dtype)(x)
        hw = H * W
        s = state.reshape(N, hw, self.m).astype(jnp.float32)  # (n, hw, M)
        p = proj.reshape(N, hw, self.m).astype(jnp.float32)
        adj = jnp.einsum("nhm,nhk->nmk", s, p) / (hw**0.5)  # (n, M, M)
        adj = nn.softmax(adj, axis=-1)
        agg = jnp.einsum("nmk,nhk->nhm", adj, p)  # (n, hw, M)
        agg = agg.reshape(N, H, W, self.m).astype(x.dtype)
        return x + Conv(C, 1, 1, 0, kernel_init=kaiming_normal_init,
                        dtype=self.dtype)(agg)


class MGRModule(nn.Module):
    """Multi-scale graph reasoning (reference ``MGR_Module``, :150-194)."""

    features: int  # branch width (reference out_channels)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1:3]
        C_in = x.shape[-1]
        f = self.features

        g0 = GloReUnit(f, self.dtype)(Basconv(f, dtype=self.dtype)(x, train))

        outs = [g0]
        for pool, m in ((2, f), (3, f // 2), (5, f // 2)):
            b = Basconv(f, dtype=self.dtype)(x, train)
            b = max_pool(b, pool)
            b = Basconv(f, dtype=self.dtype)(b, train)
            g = GloReUnit(m, self.dtype)(b)
            outs.append(resize_bilinear(g, (H, W), align_corners=True))

        cat = jnp.concatenate(outs, axis=-1)
        return Basconv(C_in, 1, 0, dtype=self.dtype)(cat, train)


class MGUNet(nn.Module):
    """Reference ``MGUNet`` (:198-252) with pools (2, 4, 4); ``uniform_pool``
    selects the ``MGUNet_2`` variant (:255-341, pools 2/2/2)."""

    num_classes: int = 11
    feature_scale: int = 4
    uniform_pool: bool = False
    is_deconv: bool = True  # False -> bilinear(align_corners) + 1x1 (:78-82)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        filters = [int(c / self.feature_scale) for c in (64, 128, 256, 512)]
        pools = (2, 2, 2) if self.uniform_pool else (2, 4, 4)

        skips = []
        h = x
        for f, p in zip(filters[:3], pools):
            c = UnetConv(f, self.dtype)(h, train)
            skips.append(c)
            h = max_pool(c, p)

        h = MGRModule(filters[3], self.dtype)(h, train)
        h = UnetConv(filters[3], self.dtype)(h, train)  # center

        for lvl, p in zip((2, 1, 0), reversed(pools)):
            if self.is_deconv:
                up = ConvTranspose(filters[lvl], p, p, dtype=self.dtype)(h)
            else:
                up = resize_bilinear(
                    h, (h.shape[1] * p, h.shape[2] * p), align_corners=True
                )
                up = Conv(filters[lvl], 1, 1, 0,
                          kernel_init=kaiming_normal_init,
                          dtype=self.dtype)(up)
            h = UnetConv(filters[lvl], self.dtype)(
                jnp.concatenate([skips[lvl], up], axis=-1), train
            )

        return Conv(self.num_classes, 1, 1, 0,
                    kernel_init=kaiming_normal_init, dtype=self.dtype)(h)


def build_mgunet(in_channels: int = 1, num_classes: int = 11, **kw):
    del in_channels
    return MGUNet(num_classes=num_classes, **kw)


def build_mgunet_2(in_channels: int = 1, num_classes: int = 11, **kw):
    del in_channels
    return MGUNet(num_classes=num_classes, uniform_pool=True, **kw)
