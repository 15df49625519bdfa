"""Test harness: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated without a pod via the standard JAX idiom
(`xla_force_host_platform_device_count`) — the "fake backend" role the
reference never had (it has no tests at all; see SURVEY.md §4).

Note: this environment's sitecustomize force-registers a remote-TPU ("axon")
backend at interpreter start, so JAX_PLATFORMS env vars are too late — the
explicit ``jax.config.update`` below is required to keep tests off the
(high-latency, single-chip) tunnel.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
