"""Fixed Gabor / Haar filter banks as on-device convolutions.

The reference rebuilds its Gabor kernels in NumPy on every forward and runs
49 separate 1-channel convs (``Masood_2024.py:22-46``); here the banks are
precomputed once as a single (k, k, 1, N) filter tensor and applied as ONE
grouped conv — the whole bank is a single MXU pass.

Kernel construction is bit-faithful to the reference, including its
asymmetric ``mgrid[-k//2 : k//2+1]`` grid (kernel_size=7 with sigma=1 yields
an 8x8 kernel over offsets [-4, 3]) and torch's 'same' padding for even
kernels (left pad total//2, right pad the remainder).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

GABOR_ORIENTATIONS = (0, 45, 90, 135, -45, -135)  # degrees (reference :23)
GABOR_FREQUENCIES = (0.1, 0.25, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
GABOR_SIGMA = 1.0


def gabor_kernel(frequency: float, theta_deg: float, sigma: float = GABOR_SIGMA):
    """Reference ``_gabor_kernel`` (:40-46)."""
    theta = theta_deg / 180.0 * np.pi
    kernel_size = int(2 * np.ceil(2.5 * sigma) + 1)
    y, x = np.mgrid[
        -kernel_size // 2 : kernel_size // 2 + 1,
        -kernel_size // 2 : kernel_size // 2 + 1,
    ]
    x_t = x * np.cos(theta) + y * np.sin(theta)
    y_t = -x * np.sin(theta) + y * np.cos(theta)
    return np.exp(-0.5 * (x_t**2 + y_t**2) / sigma**2) * np.cos(
        2 * np.pi * frequency * x_t
    )


def gabor_bank():
    """(k, k, 1, 48) filter stack ordered orientation-major (reference loop
    order, :31-37)."""
    ks = [
        gabor_kernel(f, t)
        for t in GABOR_ORIENTATIONS
        for f in GABOR_FREQUENCIES
    ]
    return np.stack(ks, axis=-1)[:, :, None, :].astype(np.float32)


HAAR_KERNELS = (
    np.array([[1.0, 1.0], [-1.0, -1.0]]),  # horizontal (reference :65)
    np.array([[1.0, -1.0], [1.0, -1.0]]),  # vertical
    np.array([[1.0, -1.0], [-1.0, 1.0]]),  # diagonal
)


def haar_bank():
    """(2, 2, 1, 3) filter stack."""
    return np.stack(HAAR_KERNELS, axis=-1)[:, :, None, :].astype(np.float32)


def conv_same_torch(x, filters):
    """Single-channel bank conv with torch F.conv2d(padding='same')
    semantics: for even kernels torch pads ``total//2`` on the left/top and
    the remainder on the right/bottom. NHWC x (N,H,W,1); filters (k,k,1,F)."""
    import jax

    kh, kw = filters.shape[:2]
    th, tw = kh - 1, kw - 1
    pad_h = (th // 2, th - th // 2)
    pad_w = (tw // 2, tw - tw // 2)
    return jax.lax.conv_general_dilated(
        x,
        jnp.asarray(filters, x.dtype),
        (1, 1),
        [pad_h, pad_w],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
