"""Spatial (halo-exchange) sharding — the conv-net analog of context
parallelism.

New capability vs the reference (which has no distributed execution at all,
SURVEY.md §2.6): for volumes whose activations exceed per-chip HBM, the H
axis of a B-scan batch is sharded over the mesh "space" axis.

Design (round 2 — exact): instead of one big input halo sized to the whole
network's receptive field (whose borders cannot match unsharded semantics —
after the first conv+BN the halo rows are nonzero, while the unsharded conv
zero-pads), every spatial conv exchanges exactly its own padding's worth of
rows with its neighbors via ``lax.ppermute`` under the
``spatial_partitioning`` context (consulted by ``models.blocks.Conv``).
Global-edge shards pad with zeros — bit-matching the unsharded 'same'
zero-padding — so ``spatial_shard_infer(model) == single-device forward``
everywhere, borders included (tested on the registry U-Net in
``tests/test_parallel.py``). Pooling / k==s transpose-convs are local ops
when the shard height divides their stride, so they need no exchange.

Supported ops under spatial partitioning: stride/dilated convs with explicit
symmetric padding where the shard height is divisible by the stride (the
whole U-Net family); non-overlapping (k == s, p == 0) transpose convs;
windowed pooling. Globally-coupled ops (FFT in FFC, global pooling in SE,
full-image attention) would need their own collectives and are not routed
through this path.

Standard path for normal sizes remains plain batched DP inference;
``sliding_window_infer`` below is the single-chip tiling fallback.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import SPACE_AXIS

# Trace-time context: while non-empty, spatially-aware layers (blocks.Conv)
# exchange halos over the named mesh axis. The axis name is static, so plain
# Python state is correct under jit/shard_map tracing.
_SPATIAL_AXIS_STACK: list[str] = []


@contextmanager
def spatial_partitioning(axis_name: str = SPACE_AXIS):
    """Within this context, model convs halo-exchange over ``axis_name``."""
    _SPATIAL_AXIS_STACK.append(axis_name)
    try:
        yield
    finally:
        _SPATIAL_AXIS_STACK.pop()


def current_spatial_axis() -> str | None:
    return _SPATIAL_AXIS_STACK[-1] if _SPATIAL_AXIS_STACK else None


def halo_exchange(x, halo: int, axis_name: str = SPACE_AXIS,
                  edge: str = "zero"):
    """Extend each H-shard with ``halo`` rows from its neighbors.

    x: local (B, H_shard, W, C). Returns (B, H_shard + 2*halo, W, C). The
    outermost shards take ``edge`` rows: "zero" (matches unsharded conv
    zero-padding — the exact-inference default) or "replicate".
    """
    assert halo <= x.shape[1], (halo, x.shape)
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    top_rows = x[:, :halo]  # rows my top neighbor needs
    bot_rows = x[:, -halo:]

    # send my bottom rows down -> received from the previous (upper) shard
    from_up = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # send my top rows up -> received from the next (lower) shard
    from_down = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )

    if edge == "zero":
        edge_top = jnp.zeros_like(from_up)
        edge_bot = jnp.zeros_like(from_down)
    else:  # replicate
        edge_top = jnp.repeat(x[:, :1], halo, axis=1)
        edge_bot = jnp.repeat(x[:, -1:], halo, axis=1)
    top = jnp.where(idx == 0, edge_top, from_up)
    bot = jnp.where(idx == n - 1, edge_bot, from_down)
    return jnp.concatenate([top, x, bot], axis=1)


def spatial_shard_infer(apply_fn, variables, images, mesh: Mesh):
    """Run ``apply_fn(variables, x)`` with H sharded over the "space" axis.

    Exact: inside the shard the model runs under ``spatial_partitioning``,
    so each conv halo-exchanges its own padding rows (zeros at the global
    border) — the result equals the unsharded forward everywhere. The shard
    height must stay divisible by every stride in the network (e.g.
    H / n_space a multiple of 16 for a 4-pool U-Net).
    """
    n_space = mesh.shape[SPACE_AXIS]
    H = images.shape[1]
    assert H % n_space == 0, (H, n_space)

    def local_fn(variables, x_local):
        with spatial_partitioning(SPACE_AXIS):
            return apply_fn(variables, x_local)

    spec_x = P(None, SPACE_AXIS, None, None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), spec_x),
        out_specs=spec_x,
    )
    images = jax.device_put(images, NamedSharding(mesh, spec_x))
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    return jax.jit(fn)(variables, images)


def sliding_window_infer(apply_fn, variables, images, tile: int = 512,
                         overlap: int = 64, batch_tiles: int = 8):
    """Single-chip tiled inference over oversized B-scans (H only), averaging
    logits in overlap regions. Host-side loop, device compute."""
    B, H, W, C = images.shape
    if H <= tile:
        return apply_fn(variables, images)
    stride = tile - overlap
    starts = list(range(0, max(H - tile, 0) + 1, stride))
    if starts[-1] + tile < H:
        starts.append(H - tile)

    out_acc = None
    w_acc = None
    fwd = jax.jit(apply_fn)
    for s in starts:
        patch = images[:, s : s + tile]
        logits = fwd(variables, patch)
        if out_acc is None:
            out_acc = jnp.zeros((B, H, W, logits.shape[-1]), logits.dtype)
            w_acc = jnp.zeros((1, H, 1, 1), logits.dtype)
        out_acc = out_acc.at[:, s : s + tile].add(logits)
        w_acc = w_acc.at[:, s : s + tile].add(1.0)
    return out_acc / w_acc
