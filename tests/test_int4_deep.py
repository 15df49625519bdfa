"""w4a4 deep-region serving path (interpret-mode exactness + graph A/B).

The int4 mode keeps int8 STORAGE with values in [-7, 7] (producers clamp
via ``out_clip=7``, weights quantized absmax/7); the int8->int4 cast happens
inside the kernels, so int8 arithmetic on the same values is bit-identical
and interpret mode (which skips the cast) is an exact oracle for the chip
path. Chip-side compile/run coverage: perf/chip_smoke.py; rate + e2e:
perf/int4stage.py, bench.py.

Reference provenance: the served architecture is the reference U-Net
(`/root/reference/SOTAS/Lesions_Segment/YNet_2022.py:509-602`); int4
serving is TPU-native machinery with no reference counterpart.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
    conv3x3_int8,
    conv3x3_int8_reference,
    ct2x2_int8,
    pack_ct2x2_weights,
    pack_weights,
)


def test_conv3x3_out_clip7_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-7, 8, (2, 16, 32, 128)), jnp.int8)
    w = rng.integers(-7, 8, (3, 3, 128, 128)).astype(np.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, 128), jnp.float32)
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, 128), jnp.float32)
    wp = jnp.asarray(pack_weights(w, 1))
    got = conv3x3_int8(x, wp, scale, bias, by=1, th=8, interpret=True,
                       dot_int4=True, out_clip=7.0)
    want = conv3x3_int8_reference(x, wp, scale, bias, by=1, out_clip=7.0)
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(jnp.max(jnp.abs(got.astype(jnp.int32)))) <= 7


def test_conv3x3_cat_int4_matches_reference():
    """Folded-cat (blk5/blk6-shaped) int4 conv, both inputs +-7."""
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(-7, 8, (1, 8, 16, 64)), jnp.int8)
    b = jnp.asarray(rng.integers(0, 8, (1, 8, 16, 64)), jnp.int8)
    w = rng.integers(-7, 8, (3, 3, 128, 64)).astype(np.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, 64), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    wp = jnp.asarray(pack_weights(w, 1))
    got = conv3x3_int8((a, b), wp, scale, bias, by=1, th=4, interpret=True,
                       dot_int4=True, out_clip=7.0)
    cat = jnp.concatenate([a, b], axis=-1)
    want = conv3x3_int8_reference(cat, wp, scale, bias, by=1, out_clip=7.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv3x3_zp_pad_matches_reference():
    """zp7 storage: borders padded with the stored true-zero (-7)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(-7, 8, (2, 16, 32, 128)), jnp.int8)
    w = rng.integers(-7, 8, (3, 3, 128, 128)).astype(np.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, 128), jnp.float32)
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, 128), jnp.float32)
    wp = jnp.asarray(pack_weights(w, 1))
    got = conv3x3_int8(x, wp, scale, bias, by=1, th=8, interpret=True,
                       dot_int4=True, out_clip=7.0, pad_vals=(-7,),
                       relu=False)
    want = conv3x3_int8_reference(x, wp, scale, bias, by=1, out_clip=7.0,
                                  pad_vals=(-7,), relu=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # border must differ from zero-padding (the -7 pad is load-bearing)
    zp0 = conv3x3_int8_reference(x, wp, scale, bias, by=1, out_clip=7.0,
                                 relu=False)
    assert not np.array_equal(np.asarray(want), np.asarray(zp0))


def test_conv3x3_cat_mixed_pad_matches_reference():
    """cat conv with (sym7 up, zp7 skip) halves: per-input border values."""
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.integers(-7, 8, (1, 8, 16, 64)), jnp.int8)
    b = jnp.asarray(rng.integers(-7, 8, (1, 8, 16, 64)), jnp.int8)
    w = rng.integers(-7, 8, (3, 3, 128, 64)).astype(np.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, 64), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    wp = jnp.asarray(pack_weights(w, 1))
    got = conv3x3_int8((a, b), wp, scale, bias, by=1, th=4, interpret=True,
                       dot_int4=True, out_clip=7.0, pad_vals=(0, -7),
                       relu=False)
    want = conv3x3_int8_reference((a, b), wp, scale, bias, by=1,
                                  out_clip=7.0, pad_vals=(0, -7),
                                  relu=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ct2x2_int4_matches_dense():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(-7, 8, (2, 8, 8, 128)), jnp.int8)
    w = rng.integers(-7, 8, (2, 2, 128, 64)).astype(np.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, 64), jnp.float32)
    bias = jnp.asarray(rng.uniform(-0.3, 0.3, 64), jnp.float32)
    mats = [jnp.asarray(m) for m in pack_ct2x2_weights(w)]
    got = ct2x2_int8(x, mats, scale, bias, tr=4, interpret=True,
                     dot_int4=True, out_clip=7.0)
    # dense oracle: the k2s2 transpose conv is non-overlapping —
    # out[n, 2i+dy, 2j+dx] = x[n, i, j] @ w[dy, dx]
    acc = jnp.einsum(
        "nhwc,uvco->nhuwvo", x.astype(jnp.int32), jnp.asarray(w, jnp.int32)
    )
    y = acc.astype(jnp.float32) * scale + bias
    y = jnp.clip(jnp.round(y), -7.0, 7.0).astype(jnp.int8)
    want = y.reshape(x.shape[0], 2 * x.shape[1], 2 * x.shape[2], -1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("f", [32, 16])
def test_unet_psrp_deep_int4_forward(f):
    """Full graph with the w4a4 deep region vs the all-int8 oracle."""
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
        jnp.asarray,
        quantize_unet_psrp(layers, taps, init_features=f, deep_int4=True),
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
    # 4-bit deep features cost some agreement at random init; the serving
    # gate for promoting this path is the on-chip trained-checkpoint
    # contract (bench.py agreement gate + perf/psrp_accuracy.py).
    assert float((lab.astype(jnp.int32) == ref_int8).mean()) > 0.90
    assert float((lab.astype(jnp.int32) == ref_f32).mean()) > 0.85
