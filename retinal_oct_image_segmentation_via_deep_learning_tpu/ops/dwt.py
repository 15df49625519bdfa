"""2D Haar discrete wavelet transform (NHWC, jit-able).

WAT-Net depends on an external ``DWT_2D`` layer that is missing from the
reference repo (``WAT_SegNet_2022.py:15`` imports
``models.blocks.dwt_modules.DWT_IDWT_layer`` after a sys.path hack — the
package ships nowhere in the repo; see SURVEY.md §2.3). This is the native
TPU equivalent: orthonormal Haar analysis/synthesis as pure reshape
arithmetic (no convolutions needed for Haar) — a handful of fused VPU adds,
much cheaper than a conv-based DWT.

Convention (pywt 'haar'): low = (x_even + x_odd)/sqrt(2),
high = (x_odd - x_even)/sqrt(2); subband order (LL, LH, HL, HH) with the
first letter the row (height) filter — matching the WaveCNet layer the
reference intended to import.
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT2 = 1.4142135623730951


def haar_dwt2d(x):
    """(N,H,W,C) -> (ll, lh, hl, hh), each (N,H/2,W/2,C)."""
    x0 = x[:, 0::2]
    x1 = x[:, 1::2]
    lo_r = (x0 + x1) / _SQRT2  # low along rows (height)
    hi_r = (x1 - x0) / _SQRT2
    ll = (lo_r[:, :, 0::2] + lo_r[:, :, 1::2]) / _SQRT2
    lh = (lo_r[:, :, 1::2] - lo_r[:, :, 0::2]) / _SQRT2
    hl = (hi_r[:, :, 0::2] + hi_r[:, :, 1::2]) / _SQRT2
    hh = (hi_r[:, :, 1::2] - hi_r[:, :, 0::2]) / _SQRT2
    return ll, lh, hl, hh


def haar_idwt2d(ll, lh, hl, hh):
    """Inverse of :func:`haar_dwt2d`."""
    lo_r_even = (ll - lh) / _SQRT2
    lo_r_odd = (ll + lh) / _SQRT2
    hi_r_even = (hl - hh) / _SQRT2
    hi_r_odd = (hl + hh) / _SQRT2

    def interleave(a, b, axis):
        stacked = jnp.stack([a, b], axis=axis + 1)
        shape = list(a.shape)
        shape[axis] *= 2
        return stacked.reshape(shape)

    lo_r = interleave(lo_r_even, lo_r_odd, 2)
    hi_r = interleave(hi_r_even, hi_r_odd, 2)
    x_even = (lo_r - hi_r) / _SQRT2
    x_odd = (lo_r + hi_r) / _SQRT2
    return interleave(x_even, x_odd, 1)
