"""Spatial (halo-exchange) sharding — the conv-net analog of context
parallelism.

New capability vs the reference (which has no distributed execution at all,
SURVEY.md §2.6): for volumes whose activations exceed per-chip HBM, the H
axis of a B-scan batch is sharded over the mesh "space" axis. Each shard
exchanges ``halo`` boundary rows with its neighbors via ``lax.ppermute``
(ICI neighbor traffic only), runs the full model on its extended tile, and
crops — valid whenever the network's receptive field fits in the halo and
the output is same-resolution (true for the segmentation zoo).

Standard path for normal sizes remains plain batched DP inference;
``sliding_window_infer`` below is the single-chip tiling fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import SPACE_AXIS


def halo_exchange(x, halo: int, axis_name: str = SPACE_AXIS):
    """Extend each H-shard with ``halo`` rows from its neighbors.

    x: local (B, H_shard, W, C). Returns (B, H_shard + 2*halo, W, C); the
    outermost shards are edge-padded (replicate) instead.
    """
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

    # edge shards replicate their own boundary rows instead of wrapping
    edge_top = jnp.repeat(x[:, :1], halo, axis=1)
    edge_bot = jnp.repeat(x[:, -1:], halo, axis=1)
    top = jnp.where(idx == 0, edge_top, from_up)
    bot = jnp.where(idx == n - 1, edge_bot, from_down)
    return jnp.concatenate([top, x, bot], axis=1)


def spatial_shard_infer(apply_fn, variables, images, mesh: Mesh,
                        halo: int = 32):
    """Run ``apply_fn(variables, x)`` with H sharded over the "space" axis.

    ``apply_fn`` must be shape-preserving in H (segmentation forward). The
    halo must cover the receptive field /2; tiles overlap by ``halo`` and the
    overlap is cropped after the local forward.
    """
    n_space = mesh.shape[SPACE_AXIS]
    H = images.shape[1]
    assert H % n_space == 0, (H, n_space)

    def local_fn(variables, x_local):
        ext = halo_exchange(x_local, halo)
        out = apply_fn(variables, ext)
        return out[:, halo:-halo]

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
