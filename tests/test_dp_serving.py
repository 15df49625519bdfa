"""Data-parallel serving (shard_map over the data axis) == single device.

Pallas custom calls cannot be auto-partitioned by pjit; dp_serve runs the
full serving graph per device on its local batch shard. Verified for the
all-int8 XLA forward and the packed Pallas forward (interpret mode on the
virtual CPU mesh).
"""

import numpy as np

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.packed import (
    quantize_unet_packed,
    unet_packed_forward,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
    calibrate_unet,
    fold_unet_bn,
    quantize_unet,
    unet_int8_forward,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
    UNet,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.parallel.mesh import (
    create_mesh,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.parallel.serving import (
    dp_serve,
    shard_batch,
)


def _setup(features=8, nc=6):
    model = UNet(out_channels=nc, init_features=features)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    layers = fold_unet_bn(v)
    calib = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 1)
    ).astype(np.float32)
    taps = calibrate_unet(layers, [calib])
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((16, 64, 64, 1)),
        jnp.float32,
    )
    return layers, taps, x


def test_dp_serve_int8_exact():
    mesh = create_mesh(data=8)
    layers, taps, x = _setup()
    qp = jax.tree.map(jnp.asarray, quantize_unet(layers, taps))

    def fwd(qp, images):
        return jnp.argmax(unet_int8_forward(qp, images), -1)

    out = dp_serve(fwd, mesh)(qp, shard_batch(mesh, x))
    assert jnp.array_equal(out, fwd(qp, x))


def test_dp_serve_packed_exact():
    mesh = create_mesh(data=2)  # interpret-mode kernels: keep it small
    model = UNet(out_channels=10, init_features=32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    layers = fold_unet_bn(v)
    calib = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 1)
    ).astype(np.float32)
    qp = jax.tree.map(
        jnp.asarray, quantize_unet_packed(layers, calibrate_unet(layers, [calib]))
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 64, 64, 1)), jnp.float32
    )

    def fwd(qp, images):
        return unet_packed_forward(qp, images, 10)

    out = dp_serve(fwd, mesh)(qp, shard_batch(mesh, x))
    assert jnp.array_equal(out, fwd(qp, x))
