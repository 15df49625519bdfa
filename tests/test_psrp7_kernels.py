"""General-KH PSRP kernel correctness (interpret mode, CPU) vs lax.conv.

Covers ``ops.pallas_conv_psrp7``: the ReLayNet 7x3 banded conv with PReLU
epilogue, the fused index max-pool, the XLA pool/unpool twins.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
    pack_psrp,
    unpack_psrp,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp7 import (
    conv7x3_psrp,
    pack_psrp7_weights,
    pool_argmax_psrp,
    unpool_psrp,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pooling import (
    max_pool_argmax,
    max_unpool,
)

RNG = np.random.default_rng(7)


def _rand_int8(shape, lo=-100, hi=100):
    return jnp.asarray(RNG.integers(lo, hi, shape), jnp.int8)


def _ref(xs, w, scale, bias, alpha):
    x = jnp.concatenate(xs, -1) if len(xs) > 1 else xs[0]
    ph, pw = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
    acc = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale + bias
    y = jnp.where(y >= 0, y, alpha * y)
    return y


@pytest.mark.parametrize("kh,by,nph,cins,cout", [
    (7, 2, 2, (8,), 8),     # ReLayNet single-input family
    (7, 2, 2, (8, 8), 8),   # decoder folded-cat family
    (5, 2, 2, (8,), 4),     # other odd KH
    (3, 4, 4, (8,), 8),     # reduces to the 3x3 family
    (7, 1, 1, (8,), 8),     # by=1 (deep layout), ngh=3
])
def test_conv7x3_psrp_matches_lax(kh, by, nph, cins, cout):
    H = W = 16
    xs = [_rand_int8((2, H, W, c)) for c in cins]
    w = np.asarray(RNG.integers(-10, 10, (kh, 3, sum(cins), cout)), np.int8)
    scale = jnp.asarray(RNG.uniform(1e-3, 2e-3, (cout,)), jnp.float32)
    bias = jnp.asarray(RNG.uniform(-3, 3, (cout,)), jnp.float32)
    alpha = 0.21
    mats, _ = pack_psrp7_weights(w, by, nph, cins=cins)
    got = conv7x3_psrp(
        tuple(pack_psrp(x, by, nph) for x in xs),
        tuple(jnp.asarray(m) for m in mats), scale, bias, alpha,
        by=by, nph=nph, cins=cins, kh=kh, tg=4, interpret=True,
    )
    yf = _ref(xs, w, scale, bias, alpha)
    want = jnp.clip(jnp.round(yf), -127.0, 127.0).astype(jnp.int8)
    assert jnp.array_equal(unpack_psrp(got, by, nph), want)


def test_conv7x3_psrp_fused_pool_indices():
    by = nph = 2
    cin = cout = 8
    H = W = 16
    x = _rand_int8((2, H, W, cin))
    w = np.asarray(RNG.integers(-10, 10, (7, 3, cin, cout)), np.int8)
    scale = jnp.full((cout,), 1.5e-3, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)
    alpha = 0.1
    mats, _ = pack_psrp7_weights(w, by, nph)
    full, pooled, idx = conv7x3_psrp(
        (pack_psrp(x, by, nph),), tuple(jnp.asarray(m) for m in mats),
        scale, bias, alpha, by=by, nph=nph, cins=(cin,), kh=7, tg=4,
        pool=True, interpret=True,
    )
    yf = _ref([x], w, scale, bias, alpha)
    want_full = jnp.clip(jnp.round(yf), -127.0, 127.0).astype(jnp.int8)
    assert jnp.array_equal(unpack_psrp(full, by, nph), want_full)
    # pooled values/indices match ops.pooling on the REQUANTIZED tensor —
    # the same decisions the all-XLA int8 path makes
    want_pool, want_idx = max_pool_argmax(want_full)
    assert jnp.array_equal(pooled, want_pool)
    assert jnp.array_equal(idx.astype(jnp.int32), want_idx)


def test_unpool_psrp_matches_max_unpool():
    vals = _rand_int8((2, 8, 8, 8))
    idx = jnp.asarray(RNG.integers(0, 4, (2, 8, 8, 8)), jnp.int8)
    up = unpool_psrp(vals, idx)  # (2, 8, 2, 8, 16) PSRP(2,2)
    want = max_unpool(vals, idx.astype(jnp.int32))
    assert jnp.array_equal(unpack_psrp(up, 2, 2), want)


def test_pool_argmax_psrp_matches_pooling():
    x = _rand_int8((2, 16, 16, 8))
    xp = pack_psrp(x, 2, 2)
    pooled, idx = pool_argmax_psrp(xp, 8)
    want_pool, want_idx = max_pool_argmax(x)
    assert jnp.array_equal(pooled, want_pool)
    assert jnp.array_equal(idx.astype(jnp.int32), want_idx)


def test_relaynet_psrp_forward_matches_int8():
    """The full PSRP ReLayNet graph is label-exact vs the all-XLA int8
    path (same quantization, same pooling decisions on requantized
    values) on a real folded flax model."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu import (
        get_model,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.relaynet_int8 import (
        calibrate_relaynet,
        fold_relaynet_bn,
        quantize_relaynet,
        relaynet_int8_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.relaynet_psrp import (
        quantize_relaynet_psrp,
        relaynet_psrp_forward,
    )

    H = W = 64  # STEM_BY=32 | H; 3 pools -> 8^2 bottleneck
    nc, f = 4, 8
    model = get_model("relaynet", num_classes=nc, num_filters=f)
    x0 = jnp.zeros((1, H, W, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=True)
    layers = fold_relaynet_bn(variables)
    calib = [np.asarray(RNG.standard_normal((2, H, W, 1)), np.float32)]
    taps = calibrate_relaynet(layers, calib)
    q = quantize_relaynet_psrp(layers, taps)
    qi = quantize_relaynet(layers, taps)

    x = jnp.asarray(RNG.standard_normal((2, H, W, 1)), jnp.float32)
    want = jnp.argmax(relaynet_int8_forward(
        {k: jax.tree.map(jnp.asarray, v) for k, v in qi.items()}, x
    ), -1).astype(jnp.int8)
    got = relaynet_psrp_forward(q, x, num_classes=nc)
    agree = float(jnp.mean((got == want).astype(jnp.float32)))
    assert agree == 1.0, agree
