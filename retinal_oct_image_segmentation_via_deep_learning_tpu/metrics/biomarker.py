"""Biomarker metrics (jit-able JAX).

Reference: ``Metrics/Biomarker_based_metrics.py`` — thickness_difference:3,
vascularity_index:23. Thickness is per-A-scan (per-column) layer pixel count:
``np.sum(mask, axis=0)`` on an (H, W) mask (reference ``:14-15``); here axis
``-2`` so batched (..., H, W) inputs work unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def thickness_difference(y_true, y_pred):
    """Mean |column-thickness difference|. Reference ``:3-21``."""
    yt = jnp.asarray(y_true, jnp.float32)
    yp = jnp.asarray(y_pred, jnp.float32)
    t_true = jnp.sum(yt, axis=-2)
    t_pred = jnp.sum(yp, axis=-2)
    return jnp.mean(jnp.abs(t_true - t_pred))


@jax.jit
def vascularity_index(y_true, y_pred):
    """|positive-fraction difference|. Reference ``:23-38``."""
    yt = jnp.asarray(y_true, jnp.float32)
    yp = jnp.asarray(y_pred, jnp.float32)
    vi_true = jnp.sum(yt) / jnp.size(yt)
    vi_pred = jnp.sum(yp) / jnp.size(yp)
    return jnp.abs(vi_true - vi_pred)


@jax.jit
def thickness_map(mask):
    """Per-column thickness profile (new helper; reference computes inline)."""
    return jnp.sum(jnp.asarray(mask, jnp.float32), axis=-2)
