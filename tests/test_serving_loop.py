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
    # Pre-enqueue BEFORE starting the loop so coalescing is deterministic
    # (no wall-clock dependence): the first _collect drains all 8 at once.
    loop = ServingLoop(forward, (H, W, 1), batch_size=8, max_wait_ms=200)
    futs = [loop.submit(img) for img in imgs]
    loop.start()
    for f in futs:
        f.result(timeout=60)
    assert loop.requests_served == 8
    assert loop.batches_run == 1
    loop.close()


def test_submit_validation_and_drain_on_close(forward):
    rng = np.random.default_rng(3)
    imgs = rng.normal(0, 1, (5, H, W, 1)).astype(np.float32)
    loop = ServingLoop(forward, (H, W, 1), batch_size=4).start()
    with pytest.raises(ValueError):
        loop.submit(np.zeros((H + 1, W, 1), np.float32))
    futs = [loop.submit(img) for img in imgs]
    loop.close()  # queued requests are drain-served, not cancelled
    for f in futs:
        assert f.result(timeout=60).shape == (H, W)
    with pytest.raises(RuntimeError):
        loop.submit(imgs[0])


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
