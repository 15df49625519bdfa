"""Full PSRP serving forward vs the all-int8 and fp32 graphs (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("f", [32, 16, "32d", "32fused"])
def test_unet_psrp_forward_matches_int8(f, monkeypatch):
    if f == "32d":  # doubled-(by, nph) f=32 layout (OCTSEG_PSRP_DOUBLE)
        monkeypatch.setenv("OCTSEG_PSRP_DOUBLE", "1")
        f = 32
    elif f == "32fused":  # opt-in fused stem+conv1 / conv+head kernels
        monkeypatch.setenv("OCTSEG_PSRP_STEM_FUSE", "1")
        monkeypatch.setenv("OCTSEG_PSRP_HEAD_FUSE", "1")
        f = 32
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.psrp import (
        quantize_unet_psrp,
        unet_psrp_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        calibrate_unet,
        fold_unet_bn,
        folded_forward,
        quantize_unet,
        unet_int8_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
        UNet,
    )

    model = UNet(out_channels=10, init_features=f)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    layers = fold_unet_bn(v)
    calib = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 1)
    ).astype(np.float32)
    taps = calibrate_unet(layers, [calib])
    qp = jax.tree.map(
        jnp.asarray, quantize_unet_psrp(layers, taps, init_features=f)
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 1)),
        jnp.float32,
    )
    lab = unet_psrp_forward(qp, x, 10, tg=4)
    assert lab.shape == (2, 64, 64)
    ref_int8 = jnp.argmax(
        unet_int8_forward(quantize_unet(layers, taps), x), -1
    )
    ref_f32 = jnp.argmax(folded_forward(layers, x), -1)
    # only divergence from the all-int8 graph: skip requants folded into
    # weight quantization (re-rounded int8 weights) -> near-total agreement
    assert float((lab.astype(jnp.int32) == ref_int8).mean()) > 0.995
    assert float((lab.astype(jnp.int32) == ref_f32).mean()) > 0.95


@pytest.mark.slow
@pytest.mark.parametrize("f", [32, "32d"])
def test_unet_psrp_forward_nonsquare(f, monkeypatch):
    """H != W exercises distinct G (row-group) and W2 (phase-width) grids in
    every PSRP kernel — catches any H/W transposition in the layouts."""
    if f == "32d":
        monkeypatch.setenv("OCTSEG_PSRP_DOUBLE", "1")
        f = 32
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.psrp import (
        quantize_unet_psrp,
        unet_psrp_forward,
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

    H, W = 96, 64
    model = UNet(out_channels=7, init_features=f)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 1)))
    layers = fold_unet_bn(v)
    calib = np.random.default_rng(0).standard_normal(
        (1, H, W, 1)
    ).astype(np.float32)
    taps = calibrate_unet(layers, [calib])
    qp = jax.tree.map(
        jnp.asarray, quantize_unet_psrp(layers, taps, init_features=f)
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, H, W, 1)), jnp.float32
    )
    lab = unet_psrp_forward(qp, x, 7, tg=4)
    assert lab.shape == (1, H, W)
    ref = jnp.argmax(unet_int8_forward(quantize_unet(layers, taps), x), -1)
    assert float((lab.astype(jnp.int32) == ref).mean()) > 0.995
