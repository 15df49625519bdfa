"""Modality VAE encoder + FiLM decoder (reference
``SD_Layer_Net/modality_encoder.py`` / ``decoder.py`` / ``film.py``).

Encoder (:6-51): concat(image, anatomy factors) -> 4 stride-2
conv-BN-LeakyReLU(0.2) stages (16ch) -> dense 32 (BN+LeakyReLU) ->
z_mean / z_logvar heads with reparameterized sampling.

Decoder: 4 stacked FiLM layers conditioning anatomy maps on the modality
latent — per layer: conv-lrelu, conv-lrelu, dense->(gamma, beta), spatial
tile, ``x*gamma + beta`` residual (film.py:29-58) — then 3x3 conv + tanh
reconstruction (decoder.py:17-24).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..blocks import BatchNorm, Conv


class ModalityEncoder(nn.Module):
    n_latent: int = 15
    n_channels: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, image, anatomy, train: bool = False):
        h = jnp.concatenate([image, anatomy], axis=-1)
        for _ in range(4):
            h = Conv(self.n_channels, 3, 2, 1, dtype=self.dtype)(h)
            h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
            h = nn.leaky_relu(h, 0.2)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(32, dtype=self.dtype)(h)
        # BatchNorm1d over the dense features
        h = BatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.leaky_relu(h, 0.2)
        z_mean = nn.Dense(self.n_latent, dtype=self.dtype)(h)
        z_logvar = nn.Dense(self.n_latent, dtype=self.dtype)(h)
        eps = jax.random.normal(
            self.make_rng("latent") if self.has_rng("latent")
            else jax.random.PRNGKey(0),
            z_mean.shape,
            jnp.float32,
        )
        sampled = z_mean + eps * jnp.exp(0.5 * z_logvar)
        return z_mean, z_logvar, sampled


class FiLMLayer(nn.Module):
    n_filters: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, modalities):
        conv1 = nn.leaky_relu(
            Conv(self.n_filters, 3, 1, 1, dtype=self.dtype)(x), 0.2
        )
        conv2 = nn.leaky_relu(
            Conv(self.n_filters, 3, 1, 1, dtype=self.dtype)(conv1), 0.2
        )
        d = nn.Dense(2 * self.n_filters, dtype=self.dtype)(modalities)
        d = nn.leaky_relu(d, 0.2)
        d = nn.Dense(2 * self.n_filters, dtype=self.dtype)(d)
        d = nn.leaky_relu(d, 0.2)
        gamma = d[:, : self.n_filters][:, None, None, :]
        beta = d[:, self.n_filters :][:, None, None, :]
        film = nn.leaky_relu(conv2 * gamma + beta, 0.2)
        return conv1 + film


class FiLMDecoder(nn.Module):
    n_filters: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, anatomy, modalities):
        h = anatomy
        for _ in range(4):
            h = FiLMLayer(self.n_filters, self.dtype)(h, modalities)
        h = Conv(1, 3, 1, 1, dtype=self.dtype)(h)
        return jnp.tanh(h)
