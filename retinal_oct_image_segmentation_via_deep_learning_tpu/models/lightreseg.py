"""LightReSeg (He et al. 2024) — lightweight encoder + ViT bottleneck, NHWC.

Capability source: reference ``SOTAS/Layers_Segment/LightReSeg_2024.py``.
- Encoder 16->128 via conv-ReLU-BN x2 blocks (``contracting_block``,
  :108-117 — note ReLU *before* BN, preserved) and separable-conv stride-2
  downsampling (``SeparableConv2d``, :154-188).
- ViT bottleneck (:288-322): 1x1-patch embedding of the 1/16-scale 128-ch
  map, cls token + learned pos embedding, 3-layer/8-head/64-dim-head
  pre-norm transformer (ViT-style, :52-105), tokens reshaped back and
  residual-added, then a conv bottleneck to 256.
- Decoder (:119-152): transpose-conv k3s2 halving channels; additive skips
  gated by multi-scale strip-conv attention, ``e = 0.8*attn(e) + e``
  (``AttentionModule`` with 7/11/3 strip kernels + four
  ``ChannelAttentionModule`` heads with zero-init gamma, :190-250).
- Head: 1x1 conv + ReLU + BN (``final_block``, :146-152).

**Documented divergence** (SURVEY.md §7): the reference hardcodes the token
grid height (``h=32``, :293-294) and a 1445-token pos embedding — input-size
coupled. Here the grid is derived from the input shape; ``num_positions``
defaults to the reference's 1445 (sliced to n+1) so converted weights match.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv, ConvTranspose

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
_trunc_init = nn.initializers.truncated_normal(stddev=0.02)


class ContractingBlock(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = Conv(self.features, 3, 1, 1, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        return x


class SeparableDown(nn.Module):
    """Reference ``SeparableConv2d`` (:154-188): dw3(s2)+pw+BN+ReLU then
    dw1+pw+BN+ReLU."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = Conv(c, 3, 2, 1, feature_group_count=c, use_bias=False,
                 kernel_init=_conv_init, dtype=self.dtype)(x)
        x = Conv(self.features, 1, 1, 0, use_bias=False,
                 kernel_init=_conv_init, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        x = nn.relu(x)
        x = Conv(self.features, 1, 1, 0,
                 feature_group_count=self.features, use_bias=False,
                 kernel_init=_conv_init, dtype=self.dtype)(x)
        x = Conv(self.features, 1, 1, 0, use_bias=False,
                 kernel_init=_conv_init, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        return nn.relu(x)


class ViTAttention(nn.Module):
    heads: int = 8
    dim_head: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, kernel_init=_trunc_init,
                       dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head**-0.5)
        attn = nn.softmax(dots.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return nn.Dense(D, kernel_init=_trunc_init, dtype=self.dtype)(out)


class ViTBlockStack(nn.Module):
    """Pre-norm transformer (reference ``Transformer``, :82-105)."""

    depth: int = 3
    mlp_dim: int = 768
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for _ in range(self.depth):
            h = nn.LayerNorm(dtype=self.dtype)(x)
            x = ViTAttention(dtype=self.dtype)(h) + x
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = nn.Dense(self.mlp_dim, kernel_init=_trunc_init,
                         dtype=self.dtype)(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(x.shape[-1], kernel_init=_trunc_init,
                         dtype=self.dtype)(h)
            x = h + x
        return x


class ChannelAttentionModule(nn.Module):
    """max-subtracted channel affinity, zero-init gamma (reference :190-220)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        t = x.reshape(N, H * W, C).astype(jnp.float32)
        energy = jnp.einsum("bnc,bnd->bcd", t, t)  # (N, C, C)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum("bcd,bnd->bnc", attn, t).reshape(N, H, W, C)
        return gamma.astype(x.dtype) * out.astype(x.dtype) + x


class AttentionModule(nn.Module):
    """Multi-scale strip-conv attention (reference :222-250)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        dw = lambda k, p: Conv(c, k, 1, p, feature_group_count=c,
                               dtype=self.dtype)
        u = x
        attn = dw(5, 2)(x)
        a0 = dw((1, 7), (0, 3))(attn)
        a0 = dw((7, 1), (3, 0))(a0)
        a1 = dw((1, 11), (0, 5))(attn)
        a1 = dw((11, 1), (5, 0))(a1)
        a2 = dw((1, 3), (0, 1))(attn)
        a2 = dw((3, 1), (1, 0))(a2)
        cat = jnp.concatenate(
            [
                ChannelAttentionModule(self.dtype)(attn),
                ChannelAttentionModule(self.dtype)(a0),
                ChannelAttentionModule(self.dtype)(a1),
                ChannelAttentionModule(self.dtype)(a2),
            ],
            axis=-1,
        )
        gate = Conv(c, 1, 1, 0, dtype=self.dtype)(cat)
        return gate * u


class ExpansiveBlock(nn.Module):
    """convT k3s2 + attention-gated additive skip (reference :119-144)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, e, d, train: bool = False):
        c = d.shape[-1]
        d = ConvTranspose(c // 2, 3, 2, 1, output_padding=1,
                          dtype=self.dtype)(d)
        e = 0.8 * AttentionModule(self.dtype)(e) + e
        return e + d


class LightReSeg(nn.Module):
    num_classes: int = 7
    num_positions: int = 1445  # reference pos-embedding length (:295)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_blocks, pooled = [], x
        for f in (16, 32, 64, 128):
            b = ContractingBlock(f, self.dtype)(pooled, train)
            enc_blocks.append(b)
            pooled = SeparableDown(f, self.dtype)(b, train)

        B, h, w, C = pooled.shape
        tokens = nn.Dense(128, kernel_init=_trunc_init, dtype=self.dtype)(
            pooled.reshape(B, h * w, C)
        )
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, 128), jnp.float32)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.num_positions, 128), jnp.float32)
        n = tokens.shape[1]
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(tokens.dtype), (B, 1, 128)), tokens],
            axis=1,
        )
        tokens = tokens + pos[:, : n + 1].astype(tokens.dtype)
        tokens = ViTBlockStack(dtype=self.dtype)(tokens)[:, 1:]
        pooled = tokens.reshape(B, h, w, 128) + pooled

        bott = ContractingBlock(256, self.dtype)(pooled, train)

        d = bott
        for lvl in (3, 2, 1, 0):
            d = ExpansiveBlock(self.dtype)(enc_blocks[lvl], d, train)

        out = Conv(self.num_classes, 1, 1, 0, dtype=self.dtype)(d)
        out = nn.relu(out)
        return BatchNorm(dtype=self.dtype)(out, use_running_average=not train)


def build_lightreseg(in_channels: int = 1, num_classes: int = 7, **kw):
    del in_channels
    return LightReSeg(num_classes=num_classes, **kw)
