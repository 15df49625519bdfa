"""Fourier-descriptor label precompute (host-side, vectorized NumPy).

Capability source: reference
``SOTAS/Layers_Segment/FourierNet/calculateFourierDescriptors.py``. Offline
pipeline that converts binary gold masks into per-pixel FD amplitude maps
consumed as regression targets by FourierNet:

1. find contours of the mask (cv2 ``findContours`` RETR_TREE/CHAIN_APPROX_NONE
   when cv2 is available; a NumPy Moore boundary trace otherwise);
2. per contour: centroid-distance deltas between consecutive points and
   cumulative arc length (reference ``:21-35``);
3. first-N Fourier amplitude coefficients sqrt(a^2 + b^2) of the delta
   sequence (``:48-57``) — the reference's O(N * len) Python loop becomes one
   (N, len) outer-product matmul;
4. iteratively zero the contour pixels and repeat until no contours remain,
   accumulating amplitude maps (``:66-81``).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def fourier_coefficients(contour_pts: np.ndarray, n: int) -> np.ndarray:
    """First-n FD amplitudes for one contour.

    ``contour_pts``: (L, 2) array of (row, col) points in boundary order.
    Vectorized form of the reference's per-point loops (``:21-57``).
    """
    pts = contour_pts.astype(np.float64)
    center = pts.mean(axis=0)
    nxt = np.roll(pts, -1, axis=0)
    d1 = np.sqrt(((pts - center) ** 2).sum(1))
    d2 = np.sqrt(((nxt - center) ** 2).sum(1))
    delta = d1 - d2
    seg = np.sqrt(((pts - nxt) ** 2).sum(1))
    l = np.cumsum(seg)
    L = l[-1]
    if L == 0:
        return np.zeros((n,))
    k = np.arange(1, n + 1)[:, None]
    phase = 2 * np.pi * k * l[None, :] / L
    a = (delta[None, :] * np.sin(phase)).sum(1) / (k[:, 0] * np.pi)
    b = -(delta[None, :] * np.cos(phase)).sum(1) / (k[:, 0] * np.pi)
    return np.sqrt(a * a + b * b)


def _find_contours_cv2(mask_u8):
    contours, _ = cv2.findContours(
        mask_u8, cv2.RETR_TREE, cv2.CHAIN_APPROX_NONE
    )
    # cv2 points are (x=col, y=row); reference swaps to (row, col) (:27-28)
    return [c[:, 0, ::-1] for c in contours]


def _find_contours_trace(mask_u8):  # pragma: no cover - cv2 present here
    """Minimal Moore-neighbour boundary trace fallback (outer contours)."""
    from ..metrics.contour import find_contours as ms_contours

    return [np.rint(c).astype(np.int64) for c in ms_contours(mask_u8, 0.5)]


def fd_maps(mask: np.ndarray, n: int = 1) -> np.ndarray:
    """Binary (H, W) mask -> (H, W, n) accumulated FD amplitude maps
    (the reference's shrinking-contour script, ``:60-85``)."""
    h, w = mask.shape
    maps = np.zeros((h, w, n))
    shrinked = (mask > 0).astype(np.uint8)
    find = _find_contours_cv2 if _HAS_CV2 else _find_contours_trace
    while True:
        contours = find(shrinked)
        if not contours:
            break
        layer = np.zeros((h, w, n))
        for pts in contours:
            if len(pts) == 0:
                continue
            amp = fourier_coefficients(pts, n)
            rows, cols = pts[:, 0], pts[:, 1]
            layer[rows, cols, :] = amp
            shrinked[rows, cols] = 0
        maps += layer
    return maps
