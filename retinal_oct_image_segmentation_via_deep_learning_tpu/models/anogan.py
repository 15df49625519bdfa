"""f-AnoGAN (Schlegl et al. 2019) — unsupervised anomaly detection GAN.

Capability source: reference ``SOTAS/Lesions_Segment/AnoGAN_2019.py``.
Encoder: 4x4 convs (s2,s2,s2,s1-VALID) 1->32->64->64->64, LeakyReLU(0.2), BN
from stage 2 (``:19-29``); Decoder mirrors with transpose convs + sigmoid
(``:39-51``); Generator = enc+dec returning (features, recon) (``:58-72``);
Discriminator = Encoder + 1x1x2 classifier head -> (features, pred)
(``:76-88``). ``AnoGAN.__call__(mode='train')`` returns the adversarial
tensor dict (``:98-116``); ``encode``/``decode`` helpers exposed via
``method`` dispatch.

Training uses the two-optimizer adversarial step in
``training/adversarial.py``.
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from .blocks import BatchNorm, Conv, ConvTranspose


class Encoder(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(32, 4, 2, 1, use_bias=False, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        for _ in range(2):
            x = Conv(64, 4, 2, 1, use_bias=False, dtype=self.dtype)(x)
            x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
            x = nn.leaky_relu(x, 0.2)
        return Conv(64, 4, 1, 0, use_bias=False, dtype=self.dtype)(x)


class Decoder(nn.Module):
    out_channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvTranspose(64, 4, 1, 0, use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        x = nn.relu(x)
        for feats in (64, 32):
            x = ConvTranspose(feats, 4, 2, 1, use_bias=False, dtype=self.dtype)(x)
            x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
        x = ConvTranspose(self.out_channels, 4, 2, 1, use_bias=False,
                          dtype=self.dtype)(x)
        return nn.sigmoid(x)


class Generator(nn.Module):
    out_channels: int = 1
    dtype: Any = None

    def setup(self):
        self.encoder = Encoder(self.dtype)
        self.decoder = Decoder(self.out_channels, self.dtype)

    def __call__(self, x, train: bool = False):
        features = self.encoder(x, train)
        recon = self.decoder(features, train)
        return features, recon


class Discriminator(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = Encoder(self.dtype)(x, train)
        pred = Conv(32, 1, 1, 0, dtype=self.dtype)(features)
        pred = Conv(1, 1, 1, 0, dtype=self.dtype)(pred)
        return features, pred


class AnoGAN(nn.Module):
    """Composite G+D (reference ``AnoGAN``, :92-124)."""

    out_channels: int = 1
    dtype: Any = None

    def setup(self):
        self.G = Generator(self.out_channels, self.dtype)
        self.D = Discriminator(self.dtype)

    def __call__(self, x, train: bool = False, mode: str = "train"):
        if mode == "train":
            g_features, fake = self.G(x, train)
            d_feat_real, d_pred_real = self.D(x, train)
            d_feat_fake, d_pred_fake = self.D(fake, train)
            return {
                "g_features": g_features,
                "fake_images": fake,
                "d_features_real": d_feat_real,
                "d_pred_real": d_pred_real,
                "d_features_fake": d_feat_fake,
                "d_pred_fake": d_pred_fake,
            }
        _, recon = self.G(x, train)
        return recon

    def encode(self, x, train: bool = False):
        """Reference ``AnoGAN.encode`` (:118-120)."""
        return self.G.encoder(x, train)

    def decode(self, z, train: bool = False):
        """Reference ``AnoGAN.decode`` (:122-124)."""
        return self.G.decoder(z, train)


def build_anogan(in_channels: int = 1, num_classes: int = 1, **kw):
    del in_channels
    return AnoGAN(out_channels=num_classes, **kw)
