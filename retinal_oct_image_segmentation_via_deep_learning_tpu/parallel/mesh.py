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
