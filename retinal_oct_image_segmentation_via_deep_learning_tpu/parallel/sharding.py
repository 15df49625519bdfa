"""NamedSharding helpers for the data-parallel pjit path.

XLA emits the gradient all-reduce automatically once batch inputs are sharded
over the "data" axis and parameters are replicated — no hand-written
collectives on this path (they live in ``parallel.halo`` for spatial
sharding).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over "data"; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of batch arrays with leading-dim sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
    )


def shard_params(mesh: Mesh, params):
    """Replicate a parameter pytree across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)
