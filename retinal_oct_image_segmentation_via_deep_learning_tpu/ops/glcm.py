"""On-device GLCM (gray-level co-occurrence matrix) texture features.

The reference computes GLCM stats on CPU via skimage per image per
angle/distance inside ``forward`` (``Masood_2024.py:106-144``) — a host
round-trip per batch. Here the joint histogram is a vectorized scatter-add
(``.at[idx].add``) entirely on device, vmapped over (batch, offsets); the
property reductions are closed-form sums over the 256x256 matrix.

Semantics matched to the reference call
``graycomatrix(img, [d], [angle], levels=256, symmetric=True, normed=True)``:
- offsets are ``(round(sin(a)*d), round(cos(a)*d))`` — with the reference's
  angle values {0, 90, -45, -135} interpreted in *radians*, exactly as
  skimage does (the reference passes degrees into a radians API; reproduced
  faithfully).
- properties per skimage ``graycoprops``: contrast, dissimilarity,
  homogeneity, energy, correlation, ASM — plus the reference's manual
  entropy (log2) and row-index variance (``:95-110``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

LEVELS = 256
REFERENCE_ANGLES = (0.0, 90.0, -45.0, -135.0)  # radians, per the reference
REFERENCE_DISTANCES = (1, 2)


def reference_offsets():
    """(row, col) offsets for the reference's angle/distance grid."""
    offs = []
    for a in REFERENCE_ANGLES:
        for d in REFERENCE_DISTANCES:
            offs.append(
                (int(round(np.sin(a) * d)), int(round(np.cos(a) * d)))
            )
    return offs


def quantize_reference(img):
    """Min-max normalize then quantize to uint8 levels (reference :84-91)."""
    lo = jnp.min(img)
    hi = jnp.max(img)
    img = (img - lo) / (hi - lo + 1e-8)
    return (img * 255).astype(jnp.int32)


def _glcm_single(q, row_off: int, col_off: int):
    """Normalized symmetric co-occurrence matrix for one offset. ``q`` is an
    (H, W) int32 level map."""
    H, W = q.shape
    # valid start region such that (r+row_off, c+col_off) stays in bounds
    r0, r1 = max(0, -row_off), H - max(0, row_off)
    c0, c1 = max(0, -col_off), W - max(0, col_off)
    a = q[r0:r1, c0:c1]
    b = q[r0 + row_off : r1 + row_off, c0 + col_off : c1 + col_off]
    idx = (a * LEVELS + b).reshape(-1)
    hist = jnp.zeros((LEVELS * LEVELS,), jnp.float32).at[idx].add(1.0)
    glcm = hist.reshape(LEVELS, LEVELS)
    glcm = glcm + glcm.T  # symmetric=True
    return glcm / jnp.maximum(jnp.sum(glcm), 1.0)


_I = np.arange(LEVELS, dtype=np.float32)
_II, _JJ = np.meshgrid(_I, _I, indexing="ij")
_DIFF = _II - _JJ


def glcm_properties(glcm):
    """The reference's 8 per-matrix features, in its emission order
    (contrast, dissimilarity, homogeneity, energy, correlation, ASM,
    entropy, variance)."""
    diff = jnp.asarray(_DIFF)
    contrast = jnp.sum(glcm * diff**2)
    dissimilarity = jnp.sum(glcm * jnp.abs(diff))
    homogeneity = jnp.sum(glcm / (1.0 + diff**2))
    asm = jnp.sum(glcm**2)
    energy = jnp.sqrt(asm)

    ii = jnp.asarray(_II)
    jj = jnp.asarray(_JJ)
    mu_i = jnp.sum(ii * glcm)
    mu_j = jnp.sum(jj * glcm)
    var_i = jnp.sum((ii - mu_i) ** 2 * glcm)
    var_j = jnp.sum((jj - mu_j) ** 2 * glcm)
    denom = jnp.sqrt(var_i * var_j)
    corr = jnp.where(
        denom < 1e-15,
        1.0,
        jnp.sum(glcm * (ii - mu_i) * (jj - mu_j)) / jnp.maximum(denom, 1e-15),
    )

    g = glcm + 1e-8
    entropy = -jnp.sum(g * jnp.log2(g))
    variance = var_i  # reference's manual row-index variance (:106-110)
    return jnp.stack(
        [contrast, dissimilarity, homogeneity, energy, corr, asm,
         entropy, variance]
    )


@jax.jit
def glcm_feature_vector(images):
    """(B, H, W) float images -> (B, n_offsets*8) feature vectors, fully on
    device (replaces the reference's per-image host loop)."""

    def per_image(img):
        q = quantize_reference(img)
        feats = []
        for row_off, col_off in reference_offsets():
            glcm = _glcm_single(q, row_off, col_off)
            feats.append(glcm_properties(glcm))
        return jnp.concatenate(feats)

    return jax.vmap(per_image)(images)
