"""Device-mesh runtime.

The reference has no distributed layer at all — device selection is
``CUDA_VISIBLE_DEVICES`` env pinning (reference ``trainTestModels.py:163-164``).
Here the runtime is a ``jax.sharding.Mesh`` over ICI: the primary strategy for
these (small, conv-heavy) models is data parallelism over axis ``"data"``,
with an optional ``"space"`` axis for spatial (halo-exchange) sharding of
oversized volumes — see ``parallel.halo``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
SPACE_AXIS = "space"


def create_mesh(
    data: int | None = None,
    space: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Create a 2-axis ("data", "space") mesh over available devices.

    ``data=None`` takes all remaining devices after ``space``. On a single
    host, devices are laid out so the "space" axis maps to ICI-adjacent chips
    (consecutive device ids), keeping halo exchanges on the fastest links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % space:
            raise ValueError(f"{n} devices not divisible by space={space}")
        data = n // space
    if data * space > n:
        raise ValueError(f"Mesh {data}x{space} needs {data * space} devices, have {n}")
    grid = np.array(devices[: data * space]).reshape(data, space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def local_mesh(n: int | None = None) -> Mesh:
    """Data-parallel-only mesh over the first ``n`` local devices."""
    devices = jax.devices() if n is None else jax.devices()[:n]
    return create_mesh(data=len(devices), space=1, devices=devices)


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Multi-host (DCN) runtime init — ``jax.distributed.initialize`` wrapper.

    The reference has no distributed layer (SURVEY.md §2.6); this is the TPU
    equivalent of a communication-backend bootstrap. Arguments default to the
    standard JAX cluster-autodetect environment (TPU pods / GKE set them);
    returns False without touching the runtime when the configuration is
    single-process (the common case on one host/slice), True after
    initializing. Safe to call twice (second call is a no-op).
    """
    if num_processes in (None, 1) and coordinator_address is None:
        return False
    if getattr(distributed_init, "_done", False):
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    distributed_init._done = True
    return True


def create_hybrid_mesh(
    ici_data: int | None = None,
    dcn_data: int | None = None,
    space: int = 1,
) -> Mesh:
    """("data", "space") mesh spanning multiple slices/hosts.

    The "data" axis is hierarchical — DCN (slice) major, ICI minor — so
    XLA's gradient all-reduce decomposes into fast intra-slice reductions
    plus one small cross-slice exchange; "space" (halo traffic, see
    parallel.halo) stays strictly intra-slice on ICI. Falls back to the flat
    single-slice layout when all devices live in one process group.
    """
    n_proc = jax.process_count()
    if dcn_data is None:
        dcn_data = n_proc
    if ici_data is None:
        ici_data = len(jax.devices()) // (dcn_data * space)
    if dcn_data == 1:
        return create_mesh(data=ici_data, space=space)
    try:
        from jax.experimental import mesh_utils

        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ici_data, space),
            dcn_mesh_shape=(dcn_data, 1),
        )  # -> (dcn_data * ici_data, space)
    except ValueError:
        # Backends without slice topology (multi-process CPU/GPU): build the
        # same DCN-major/ICI-minor layout from process ids directly.
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        devices = np.array(devs[: dcn_data * ici_data * space]).reshape(
            dcn_data * ici_data, space
        )
    return Mesh(devices, (DATA_AXIS, SPACE_AXIS))
