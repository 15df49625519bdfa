"""FourierNet (cascaded FD-regression + segmentation U-Net), NHWC Flax.

Capability source: reference ``SOTAS/Layers_Segment/FourierNet/deepModels.py``.
Two-stage cascade (``cascaded``, :59-89): a shared 4-level encoder
(``oneEncoderPath``, :25) feeds one decoder *per Fourier-descriptor channel*
regressing 1-channel FD maps with linear heads ("interO_i", MSE loss); the
FD outputs concat with the raw input (:80-81) into a second full U-Net
(``CasUNet``, :43-57) emitting 2-class softmax. Blocks are
conv-relu-dropout-conv-relu with he_uniform init and Keras 'same' padding
(``unetOneBlock``, :7-13); decoder = nearest UpSampling2D + skip concat
(:20-23).

Forward returns ``(fd_maps list, final_probs)`` — the reference Keras model's
output list ``[interO1..k, finalO]``. Training (per-head MSE + categorical
cross-entropy, Adadelta) lives in ``training.fouriernet_pipeline``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv
from ..ops.pooling import max_pool
from ..ops.resize import resize_nearest

he_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


class UNetBlock2(nn.Module):
    """conv-relu-dropout-conv-relu (reference ``unetOneBlock``, :7-13)."""

    features: int
    dropout: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, 3, 1, "SAME", kernel_init=he_uniform,
                 dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = Conv(self.features, 3, 1, "SAME", kernel_init=he_uniform,
                 dtype=self.dtype)(x)
        return nn.relu(x)


class _Encoder(nn.Module):
    features: Sequence[int]
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        for f in self.features[:4]:
            x = UNetBlock2(f, self.dropout, self.dtype)(x, train)
            skips.append(x)
            x = max_pool(x, 2)
        return skips, x


class _Decoder(nn.Module):
    features: Sequence[int]
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        for lvl in (3, 2, 1, 0):
            up = resize_nearest(x, tuple(s * 2 for s in x.shape[1:3]))
            x = jnp.concatenate([up, skips[lvl]], axis=-1)
            x = UNetBlock2(self.features[lvl], self.dropout, self.dtype)(
                x, train
            )
        return x


class CasUNet(nn.Module):
    """Stage-2 full U-Net (reference ``CasUNet``, :43-57)."""

    out_channels: int
    features: Sequence[int]
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips, h = _Encoder(self.features, self.dropout, self.dtype)(x, train)
        h = UNetBlock2(self.features[4], self.dropout, self.dtype)(h, train)
        h = _Decoder(self.features, self.dropout, self.dtype)(h, skips, train)
        logits = Conv(self.out_channels, 1, 1, 0, kernel_init=he_uniform,
                      dtype=self.dtype)(h)
        if self.out_channels == 2:
            return nn.softmax(logits, axis=-1)
        return logits  # linear head (outputNo == 1, :53-55)


class FourierNet(nn.Module):
    fd_channel: int = 1
    features: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: float = 0.2
    final_classes: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips, pooled = _Encoder(self.features, self.dropout, self.dtype)(
            x, train
        )
        bott = UNetBlock2(self.features[4], self.dropout, self.dtype)(
            pooled, train
        )

        fd_maps = []
        for _ in range(self.fd_channel):
            d = _Decoder(self.features, self.dropout, self.dtype)(
                bott, skips, train
            )
            fd_maps.append(
                Conv(1, 1, 1, 0, kernel_init=he_uniform, dtype=self.dtype)(d)
            )

        stage2_in = jnp.concatenate([x] + fd_maps, axis=-1)
        final = CasUNet(
            self.final_classes, self.features, self.dropout, self.dtype
        )(stage2_in, train)
        return fd_maps, final


def build_fouriernet(in_channels: int = 1, num_classes: int = 2,
                     fd_channel: int = 1, **kw):
    del in_channels
    return FourierNet(fd_channel=fd_channel, final_classes=num_classes, **kw)
