"""Data-parallel serving over a device mesh.

XLA's SPMD partitioner cannot split a Pallas custom call, so a pjit with a
batch-sharded input would replicate (or reject) the quantized serving
kernels. The correct TPU shape is explicit per-device execution:
``shard_map`` the whole serving forward over the "data" axis — every chip
runs the full kernel graph on its local batch shard, results concatenate
along batch, and no collectives are needed (inference has no gradient).

Works with any serving forward (bf16 model apply, ``unet_int8_forward``,
``unet_packed_forward``); qparams/variables are replicated (weights are
small), images/labels are batch-sharded.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dp_serve(forward, mesh: Mesh, axis: str = "data"):
    """-> jitted fn(params, images) running ``forward`` per device shard.

    ``forward(params, images)`` is any serving callable; images must have
    batch divisible by the mesh's ``axis`` size.
    """
    fn = shard_map(
        forward,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_batch(mesh: Mesh, images, axis: str = "data"):
    """Place a host batch with its leading dim sharded over ``axis``."""
    return jax.device_put(
        images, NamedSharding(mesh, P(axis))
    )
