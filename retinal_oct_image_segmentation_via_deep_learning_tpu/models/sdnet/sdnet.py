"""SDNet composite — semi-supervised layer disentanglement system.

Capability source: reference ``SD_Layer_Net/sdnet.py:11-77``. Wires together:
AttU_Net feature body (1->64, channels [32..512], :20-22); 11x11-kernel conv
heads for layer boundaries (n_classes-1 ch) and extra anatomical surfaces
(:24-32); LayerEngine topology cleanup (:38,53-65); straight-through
rounding to hard anatomy (:63); modality VAE + FiLM reconstruction + z
re-estimation cycle (:42-51).

The forward (``__call__``) runs the full disentanglement pass and returns a
dict mirroring the reference's method outputs; individual stages are exposed
as methods for the composite training loop (``training/sdnet_pipeline.py``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..blocks import Conv
from .common import ResConvBlock, straight_through_round
from .layer_engine import LayerEngine
from .modality import FiLMDecoder, ModalityEncoder
from .unet import UNetBackbone


class PredictorHead(nn.Module):
    """conv_block(64->32, k=11) + 1x1 head (reference :24-32)."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ResConvBlock(32, 11, 0.0, self.dtype)(x, train)
        return Conv(self.out_channels, 1, 1, 0, dtype=self.dtype)(h)


class SDNet(nn.Module):
    img_size: int = 256
    n_encoder_latent: int = 15
    n_classes: int = 4
    n_anatomical_factors: int = 12
    channels: Sequence[int] = (32, 64, 128, 256, 512)
    drop_rate: float = 0.0
    dtype: Any = None

    @property
    def extra_factors(self) -> int:
        return self.n_anatomical_factors - self.n_classes

    def setup(self):
        self.u_net = UNetBackbone(
            64, tuple(self.channels), attention=True,
            drop_rate=self.drop_rate, dtype=self.dtype,
        )
        self.layer_predictor = PredictorHead(self.n_classes - 1, self.dtype)
        if self.extra_factors > 0:
            self.surface_predictor = PredictorHead(
                self.extra_factors, self.dtype
            )
        self.modality_encoder = ModalityEncoder(
            self.n_encoder_latent, dtype=self.dtype
        )
        self.decoder = FiLMDecoder(dtype=self.dtype)
        self.layer_engine = LayerEngine(self.img_size, self.n_classes)

    # -- stages (reference method-for-method) ---------------------------
    def get_layer_anatomical_factors(self, input_img, train: bool = False):
        features = self.u_net(input_img, train)
        layers = self.layer_predictor(features, train)
        prob_map, positions, clean_masks, extra_losses = self.layer_engine(
            layers
        )
        if self.extra_factors > 0:
            surfaces = self.surface_predictor(features, train)
            non_layers = nn.sigmoid(surfaces)
            anatomy = jnp.concatenate([clean_masks, non_layers], axis=-1)
        else:
            anatomy = clean_masks
        hard_anatomy = straight_through_round(anatomy)
        return prob_map, positions, clean_masks, hard_anatomy, extra_losses

    def get_modalities(self, input_img, anatomy, train: bool = False):
        return self.modality_encoder(input_img, anatomy, train)

    def get_reconstructed_img(self, hard_anatomy, modalities):
        return self.decoder(hard_anatomy, modalities)

    def get_z_estimate(self, reconstructed, anatomy, train: bool = False):
        z_mean, _, _ = self.modality_encoder(reconstructed, anatomy, train)
        return z_mean

    # -- full pass ------------------------------------------------------
    def __call__(self, input_img, train: bool = False):
        (prob_map, positions, clean_masks, hard_anatomy,
         extra_losses) = self.get_layer_anatomical_factors(input_img, train)
        z_mean, z_logvar, sampled_z = self.get_modalities(
            input_img, hard_anatomy, train
        )
        recon = self.get_reconstructed_img(hard_anatomy, sampled_z)
        z_estimate = self.get_z_estimate(recon, hard_anatomy, train)
        return {
            "prob_map": prob_map,
            "layer_positions": positions,
            "clean_masks": clean_masks,
            "hard_anatomy": hard_anatomy,
            "extra_losses": extra_losses,
            "z_mean": z_mean,
            "z_logvar": z_logvar,
            "sampled_z": sampled_z,
            "reconstruction": recon,
            "z_estimate": z_estimate,
        }


def build_sdnet(in_channels: int = 1, num_classes: int = 4, **kw):
    del in_channels
    return SDNet(n_classes=num_classes, **kw)
