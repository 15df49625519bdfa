"""Double-buffered host->device input pipeline (training/input_pipeline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.training.input_pipeline import (
    DevicePrefetcher,
    prefetch_to_device,
)


def test_order_and_values_preserved():
    batches = [
        (np.full((2, 4), i, np.float32), np.full((2,), i, np.int32))
        for i in range(7)
    ]
    out = list(prefetch_to_device(iter(batches), depth=2))
    assert len(out) == 7
    for i, (x, y) in enumerate(out):
        assert isinstance(x, jax.Array) and isinstance(y, jax.Array)
        np.testing.assert_array_equal(np.asarray(x), batches[i][0])
        np.testing.assert_array_equal(np.asarray(y), batches[i][1])


def test_transform_applied_in_producer():
    seen = []

    def tf(b):
        seen.append(int(b[0, 0]))
        return jnp.asarray(b) * 2

    batches = [np.full((1, 1), i, np.float32) for i in range(5)]
    out = [float(b[0, 0]) for b in DevicePrefetcher(iter(batches),
                                                    transform=tf, depth=1)]
    assert out == [0.0, 2.0, 4.0, 6.0, 8.0]
    assert seen == [0, 1, 2, 3, 4]


def test_producer_error_propagates():
    def gen():
        yield np.zeros((1,), np.float32)
        raise RuntimeError("disk on fire")

    it = prefetch_to_device(gen())
    next(it)
    with pytest.raises(RuntimeError, match="disk on fire"):
        next(it)


def test_sharded_prefetch_on_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from retinal_oct_image_segmentation_via_deep_learning_tpu.parallel.mesh import (
        DATA_AXIS,
        create_mesh,
    )

    mesh = create_mesh(data=8)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    batches = [np.arange(8, dtype=np.float32) + 10 * i for i in range(3)]
    out = list(prefetch_to_device(iter(batches), sharding=sh))
    for i, x in enumerate(out):
        assert x.sharding == sh
        np.testing.assert_array_equal(np.asarray(x), batches[i])
