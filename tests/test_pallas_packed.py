"""Row-packed Pallas conv kernels: bit-exactness vs the lax.conv reference.

Covers ops/pallas_conv_packed (interpret mode on CPU): pack/unpack round
trip, packed max-pool, single- and two-input (folded concat) packed convs,
the deep-row-packed stem, the fused head+argmax kernel, and the full
``unet_packed_forward`` against ``unet_int8_forward``'s argmax.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
    conv3x3_int8_reference,
    pack_weights,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_packed import (
    conv3x3_int8_packed,
    head_argmax_packed,
    maxpool2x2_packed,
    pack_head_weights,
    pack_rows,
    pack_stem_weights,
    stem_conv3x3_int8_packed,
    unpack_rows,
)

N, H, W, BY = 2, 32, 64, 4


@pytest.fixture
def rng8():
    return np.random.default_rng(0)


def _x(rng, c, n=N, h=H, w=W):
    return jnp.asarray(rng.integers(-100, 100, (n, h, w, c)), jnp.int8)


def _scale_bias(rng, cout):
    return (jnp.asarray(rng.uniform(1e-3, 2e-3, cout), jnp.float32),
            jnp.asarray(rng.normal(0, 1, cout), jnp.float32))


def test_pack_roundtrip_and_pool(rng8):
    x = _x(rng8, 8)
    p = pack_rows(x, BY)
    assert jnp.array_equal(unpack_rows(p, BY), x)
    ref = jax.lax.reduce_window(
        x, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    assert jnp.array_equal(unpack_rows(maxpool2x2_packed(p, BY), BY), ref)


@pytest.mark.parametrize("fuse_dx", [False, True])
def test_packed_conv_exact(rng8, fuse_dx):
    cin, cout = 8, 16
    x = _x(rng8, cin)
    w = rng8.integers(-20, 20, (3, 3, cin, cout)).astype(np.int8)
    scale, bias = _scale_bias(rng8, cout)
    ref = conv3x3_int8_reference(
        x, jnp.asarray(pack_weights(w, 1)), scale, bias, by=1
    )
    got = unpack_rows(
        conv3x3_int8_packed(
            (pack_rows(x, BY),), jnp.asarray(pack_weights(w, BY)),
            scale, bias, by=BY, cins=(cin,), fuse_dx=fuse_dx,
            interpret=True,
        ),
        BY,
    )
    assert jnp.array_equal(got, ref)


def test_packed_conv_fused_pool_exact(rng8):
    cin, cout = 8, 16
    x = _x(rng8, cin)
    w = rng8.integers(-20, 20, (3, 3, cin, cout)).astype(np.int8)
    scale, bias = _scale_bias(rng8, cout)
    ref = conv3x3_int8_reference(
        x, jnp.asarray(pack_weights(w, 1)), scale, bias, by=1
    )
    ref_pool = jax.lax.reduce_window(
        ref, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        "VALID",
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_packed import (
        finish_pool_w,
    )

    full, half = conv3x3_int8_packed(
        (pack_rows(x, BY),), jnp.asarray(pack_weights(w, BY)),
        scale, bias, by=BY, cins=(cin,), pool=True, interpret=True,
    )
    assert jnp.array_equal(unpack_rows(full, BY), ref)
    assert jnp.array_equal(unpack_rows(finish_pool_w(half), BY), ref_pool)


def test_packed_conv_folded_concat_exact(rng8):
    cin, cin2, cout = 8, 4, 16
    x, x2 = _x(rng8, cin), _x(rng8, cin2)
    w = rng8.integers(-20, 20, (3, 3, cin + cin2, cout)).astype(np.int8)
    scale, bias = _scale_bias(rng8, cout)
    ref = conv3x3_int8_reference(
        jnp.concatenate([x, x2], -1), jnp.asarray(pack_weights(w, 1)),
        scale, bias, by=1,
    )
    got = unpack_rows(
        conv3x3_int8_packed(
            (pack_rows(x, BY), pack_rows(x2, BY)),
            jnp.asarray(pack_weights(w, BY)), scale, bias,
            by=BY, cins=(cin, cin2), interpret=True,
        ),
        BY,
    )
    assert jnp.array_equal(got, ref)


def test_stem_kernel_exact(rng8):
    cout, SBY = 16, 16
    x = _x(rng8, 1)
    w = rng8.integers(-20, 20, (3, 3, 1, cout)).astype(np.int8)
    scale, bias = _scale_bias(rng8, cout)
    ref = conv3x3_int8_reference(
        x, jnp.asarray(pack_weights(w, 1)), scale, bias, by=1
    )
    xp = pack_rows(x, SBY).reshape(N, H // SBY, W, SBY)
    got = unpack_rows(
        stem_conv3x3_int8_packed(
            xp, jnp.asarray(pack_stem_weights(w, SBY)), scale, bias,
            BY=SBY, by_out=BY, interpret=True,
        ),
        BY,
    )
    assert jnp.array_equal(got, ref)


def test_head_argmax_exact(rng8):
    cin, nc = 8, 5
    x = _x(rng8, cin)
    wh = rng8.normal(0, 1, (1, 1, cin, nc)).astype(np.float32)
    s_w = (np.max(np.abs(wh), axis=(0, 1, 2)) / 127.0).astype(np.float32)
    w_q = np.clip(np.round(wh / s_w), -127, 127).astype(np.int8)
    bias = rng8.normal(0, 1, nc).astype(np.float32)
    s_in = np.float32(0.01)
    acc = jnp.einsum(
        "nhwc,co->nhwo", x.astype(jnp.int32),
        jnp.asarray(w_q[0, 0], jnp.int32),
    )
    ref = jnp.argmax(acc.astype(jnp.float32) * (s_in * s_w) + bias, -1)
    got = head_argmax_packed(
        pack_rows(x, BY), jnp.asarray(pack_head_weights(w_q, BY, 32)),
        s_in * s_w, bias, by=BY, nc=nc, interpret=True,
    )
    assert jnp.array_equal(got.astype(jnp.int32), ref)


def test_unet_packed_forward_matches_int8():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.packed import (
        quantize_unet_packed,
        unet_packed_forward,
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

    model = UNet(out_channels=10, init_features=32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    layers = fold_unet_bn(v)
    calib = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 1)
    ).astype(np.float32)
    taps = calibrate_unet(layers, [calib])
    qp = jax.tree.map(jnp.asarray, quantize_unet_packed(layers, taps))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 1)), jnp.float32
    )
    lab = unet_packed_forward(qp, x, 10)
    assert lab.shape == (2, 64, 64)
    ref_int8 = jnp.argmax(
        unet_int8_forward(quantize_unet(layers, taps), x), -1
    )
    ref_f32 = jnp.argmax(folded_forward(layers, x), -1)
    # the packed graph's only divergences from the all-int8 graph are the
    # skip-requants folded into weight quantization -> near-total agreement
    assert float((lab.astype(jnp.int32) == ref_int8).mean()) > 0.995
    assert float((lab.astype(jnp.int32) == ref_f32).mean()) > 0.95
