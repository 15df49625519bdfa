"""Masood 2024 — hybrid learned + handcrafted choroid segmentation.

Capability source: reference ``SOTAS/Layers_Segment/Masood_2024.py``.
- four parallel 5-conv CNN branches (64ch out each; 3 maxpools then bilinear
  align_corners=True restore, ``:146-188``);
- Gabor bank: 6 orientations x 8 frequencies, fixed kernels (``:18-46``) —
  one fused bank conv on device (``ops.gabor``), not 48 python-loop convs;
- Haar bank: 3 fixed 2x2 kernels (``:48-71``);
- GLCM texture statistics, broadcast to full spatial size (``:73-144``) —
  fully on-device scatter-add histograms (``ops.glcm``) instead of the
  reference's per-image skimage host loop;
- concat(4x64 + 48 + 3 + 64) -> 1x1 conv -> sigmoid (``:237-241``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv
from ..ops.gabor import conv_same_torch, gabor_bank, haar_bank
from ..ops.glcm import glcm_feature_vector
from ..ops.pooling import max_pool
from ..ops.resize import resize_bilinear


class CNNBranch(nn.Module):
    """5-conv branch with 3 maxpools + bilinear restore (reference :146-188)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_hw = x.shape[1:3]
        widths = (64, 128, 256, 128, 64)
        for i, w in enumerate(widths):
            x = Conv(w, 3, 1, 1, dtype=self.dtype)(x)
            x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
            if i < 3:
                x = max_pool(x, 2)
        return resize_bilinear(x, in_hw, align_corners=True)


class Masood2024(nn.Module):
    num_classes: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cnn = [CNNBranch(self.dtype)(x, train) for _ in range(4)]

        xf = x.astype(jnp.float32)
        gabor = conv_same_torch(xf, gabor_bank())
        haar = conv_same_torch(xf, haar_bank())
        glcm = glcm_feature_vector(xf[..., 0])  # (B, 64)
        B, H, W, _ = x.shape
        glcm = jnp.broadcast_to(
            glcm[:, None, None, :], (B, H, W, glcm.shape[-1])
        )

        combined = jnp.concatenate(
            cnn + [gabor.astype(x.dtype), haar.astype(x.dtype),
                   glcm.astype(x.dtype)],
            axis=-1,
        )
        out = Conv(self.num_classes, 1, 1, 0, dtype=self.dtype)(combined)
        return nn.sigmoid(out)


def build_masood(in_channels: int = 1, num_classes: int = 1, **kw):
    del in_channels
    return Masood2024(num_classes=num_classes, **kw)
