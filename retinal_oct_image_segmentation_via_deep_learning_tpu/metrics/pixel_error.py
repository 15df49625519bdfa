"""Pixel-error metrics (jit-able JAX).

Reference: ``Metrics/PixelError_based_metrics.py`` — mean_squared_error:3,
root_mean_squared_error:21. Float-cast masks, plain mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def mean_squared_error(y_true, y_pred):
    yt = jnp.asarray(y_true, jnp.float32)
    yp = jnp.asarray(y_pred, jnp.float32)
    return jnp.mean((yt - yp) ** 2)


@jax.jit
def root_mean_squared_error(y_true, y_pred):
    return jnp.sqrt(mean_squared_error(y_true, y_pred))
