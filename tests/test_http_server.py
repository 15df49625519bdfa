"""HTTP serving frontend (inference/http_server) over the ServingLoop."""

import io
import json
import urllib.request

import numpy as np

import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.http_server import (
    start_in_background,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.server import (
    ServingLoop,
)

H = W = 16


def _fwd(x):  # trivial deterministic "model": row-sum parity labels
    return (jnp.sum(x, axis=(2, 3)) > 0).astype(jnp.int32)[:, :, None] * (
        jnp.zeros((x.shape[0], H, W), jnp.int32) + 1
    )


def _post(url, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return np.load(io.BytesIO(r.read()), allow_pickle=False)


def test_predict_and_healthz():
    loop = ServingLoop(_fwd, (H, W, 1), batch_size=4, max_wait_ms=1.0)
    httpd, _ = start_in_background(loop, port=0)
    port = httpd.server_address[1]
    try:
        img = np.ones((H, W, 1), np.float32)
        out = _post(f"http://127.0.0.1:{port}/predict", img)
        assert out.shape == (H, W) and (out == 1).all()

        batch = np.stack([img, img * 2, img * 3])
        out = _post(f"http://127.0.0.1:{port}/predict", batch)
        assert out.shape == (3, H, W)

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["requests_served"] == 4
    finally:
        httpd.shutdown()
        loop.close()


def test_bad_shape_is_400():
    loop = ServingLoop(_fwd, (H, W, 1), batch_size=2, max_wait_ms=1.0)
    httpd, _ = start_in_background(loop, port=0)
    port = httpd.server_address[1]
    try:
        bad = np.ones((H + 1, W, 1), np.float32)
        buf = io.BytesIO()
        np.save(buf, bad)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "expected image shape" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
        loop.close()
