"""Quantized-artifact round-trip: save_qparams/load_qparams preserve the
serving graph's outputs exactly for all three quantizer trees."""

import numpy as np

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.artifacts import (
    load_qparams,
    save_qparams,
)


def _quantized_unet(f=16):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        calibrate_unet,
        fold_unet_bn,
        quantize_unet,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
        UNet,
    )

    model = UNet(out_channels=6, init_features=f)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    layers = fold_unet_bn(v)
    calib = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 1)
    ).astype(np.float32)
    return layers, calibrate_unet(layers, [calib])


def test_int8_qparams_roundtrip(tmp_path):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        quantize_unet,
        unet_int8_forward,
    )

    layers, taps = _quantized_unet()
    qp = quantize_unet(layers, taps)
    p = str(tmp_path / "q.npz")
    save_qparams(p, qp)
    qp2 = load_qparams(p)

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 1)), jnp.float32
    )
    a = unet_int8_forward(jax.tree.map(jnp.asarray, qp), x)
    b = unet_int8_forward(jax.tree.map(jnp.asarray, qp2), x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_psrp_qparams_roundtrip(tmp_path):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.psrp import (
        quantize_unet_psrp,
        unet_psrp_forward,
    )

    layers, taps = _quantized_unet(f=16)
    qp = quantize_unet_psrp(layers, taps, init_features=16)
    p = str(tmp_path / "qpsrp.npz")
    save_qparams(p, qp)
    qp2 = load_qparams(p)

    # structural: tuple packs survive as tuples with identical contents
    assert isinstance(qp2["blk0_conv0"]["w_stem"], tuple)
    for a, b in zip(qp["blk0_conv0"]["w_stem"], qp2["blk0_conv0"]["w_stem"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 1)), jnp.float32
    )
    a = unet_psrp_forward(jax.tree.map(jnp.asarray, qp), x, 6)
    b = unet_psrp_forward(jax.tree.map(jnp.asarray, qp2), x, 6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
