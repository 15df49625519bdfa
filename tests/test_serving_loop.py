"""ServingLoop: batching, correctness vs direct forward, concurrency."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.server import (
    ServingLoop,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
    UNet,
)

H = W = 32
NC = 5


@pytest.fixture(scope="module")
def forward():
    model = UNet(out_channels=NC, init_features=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 1)))

    def fn(x):
        return jnp.argmax(
            model.apply(variables, x, train=False), axis=-1
        ).astype(jnp.int32)

    return fn


def test_matches_direct_forward(forward):
    rng = np.random.default_rng(0)
    imgs = rng.normal(0, 1, (5, H, W, 1)).astype(np.float32)
    want = np.asarray(forward(jnp.asarray(imgs)))
    with ServingLoop(forward, (H, W, 1), batch_size=4) as loop:
        futs = [loop.submit(img) for img in imgs]
        got = np.stack([f.result(timeout=60) for f in futs])
    assert np.array_equal(got, want)


def test_batching_amortizes(forward):
    rng = np.random.default_rng(1)
    imgs = rng.normal(0, 1, (8, H, W, 1)).astype(np.float32)
    with ServingLoop(forward, (H, W, 1), batch_size=8,
                     max_wait_ms=200) as loop:
        loop.predict(imgs[0])  # warm the jit so the next batch coalesces
        futs = [loop.submit(img) for img in imgs]
        for f in futs:
            f.result(timeout=60)
        assert loop.requests_served == 9
        # 8 submits within the wait window -> at most 2 device batches
        assert loop.batches_run <= 3


def test_concurrent_clients(forward):
    rng = np.random.default_rng(2)
    imgs = rng.normal(0, 1, (12, H, W, 1)).astype(np.float32)
    want = np.asarray(forward(jnp.asarray(imgs)))
    results = {}
    with ServingLoop(forward, (H, W, 1), batch_size=4) as loop:

        def client(i):
            results[i] = loop.predict(imgs[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    for i in range(12):
        assert np.array_equal(results[i], want[i])
