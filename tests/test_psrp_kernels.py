"""PSRP kernel correctness (interpret mode, CPU) vs lax.conv references.

Every kernel in ops/pallas_conv_psrp is checked bit-exactly against the
equivalent XLA int8 computation on the unpacked layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
    conv3x3_psrp,
    ct_psrp,
    ct_up_psrp,
    head_argmax_psrp,
    pack_ct_psrp_weights,
    pack_ct_up_weights,
    pack_head_psrp_weights,
    pack_psrp,
    pack_psrp_weights,
    pack_stem_psrp_weights,
    prep_stem_input,
    stem_psrp,
    unpack_psrp,
)

RNG = np.random.default_rng(0)


def _ref_conv(x, w, scale, bias, relu=True):
    acc = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def _ref_ct(x, w, scale, bias):
    acc = jax.lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1)), (1, 1), [(1, 1), (1, 1)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale + bias
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def _rand_int8(shape, lo=-100, hi=100):
    return jnp.asarray(RNG.integers(lo, hi, shape), jnp.int8)


def test_pack_unpack_roundtrip():
    x = _rand_int8((2, 16, 24, 3))
    for by, nph in ((2, 2), (4, 4), (4, 2)):
        p = pack_psrp(x, by, nph)
        assert p.shape == (2, 16 // by, nph, 24 // nph, by * 3)
        assert jnp.array_equal(unpack_psrp(p, by, nph), x)


@pytest.mark.parametrize("by,nph,cin,cout", [
    (4, 4, 8, 8),   # 512^2-stage shape family (32ch in production)
    (2, 2, 8, 16),  # 256^2-stage family
    (2, 2, 16, 8),
])
def test_conv3x3_psrp_matches_lax(by, nph, cin, cout):
    H = W = 16
    x = _rand_int8((2, H, W, cin))
    w = np.asarray(RNG.integers(-20, 20, (3, 3, cin, cout)), np.int8)
    scale = jnp.asarray(RNG.uniform(1e-3, 2e-3, (cout,)), jnp.float32)
    bias = jnp.asarray(RNG.uniform(-3, 3, (cout,)), jnp.float32)
    mats, _ = pack_psrp_weights(w, by, nph)
    got = conv3x3_psrp(
        (pack_psrp(x, by, nph),), tuple(jnp.asarray(m) for m in mats),
        scale, bias, by=by, nph=nph, cins=(cin,), tg=2, interpret=True,
    )
    want = _ref_conv(x, jnp.asarray(w), scale, bias)
    assert jnp.array_equal(unpack_psrp(got, by, nph), want)


def test_conv3x3_psrp_cat_and_pool():
    by = nph = 2
    cin, cout = (8, 8), 8
    H = W = 16
    xs = [_rand_int8((2, H, W, c)) for c in cin]
    w = np.asarray(RNG.integers(-20, 20, (3, 3, sum(cin), cout)), np.int8)
    scale = jnp.asarray(RNG.uniform(1e-3, 2e-3, (cout,)), jnp.float32)
    bias = jnp.asarray(RNG.uniform(-3, 3, (cout,)), jnp.float32)
    mats, _ = pack_psrp_weights(w, by, nph, cins=cin)
    full, pooled = conv3x3_psrp(
        tuple(pack_psrp(x, by, nph) for x in xs),
        tuple(jnp.asarray(m) for m in mats), scale, bias,
        by=by, nph=nph, cins=cin, tg=2, pool=True, interpret=True,
    )
    want = _ref_conv(jnp.concatenate(xs, -1), jnp.asarray(w), scale, bias)
    assert jnp.array_equal(unpack_psrp(full, by, nph), want)
    want_pool = jax.lax.reduce_window(
        want, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        "VALID",
    )
    # nph=2 pools to the plain layout: (N, G, 1, W2, cout)
    got_pool = pooled.reshape(2, H // 2, W // 2, cout)
    assert jnp.array_equal(got_pool, want_pool)


def test_conv3x3_psrp_pool_4phase():
    """Pooling a (by=4, nph=4) tensor yields (by=2, nph=2) PSRP."""
    by = nph = 4
    cin = cout = 8
    H = W = 16
    x = _rand_int8((2, H, W, cin))
    w = np.asarray(RNG.integers(-20, 20, (3, 3, cin, cout)), np.int8)
    scale = jnp.full((cout,), 1.5e-3, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)
    mats, _ = pack_psrp_weights(w, by, nph)
    full, pooled = conv3x3_psrp(
        (pack_psrp(x, by, nph),), tuple(jnp.asarray(m) for m in mats),
        scale, bias, by=by, nph=nph, cins=(cin,), tg=2, pool=True,
        interpret=True,
    )
    want = _ref_conv(x, jnp.asarray(w), scale, bias)
    want_pool = jax.lax.reduce_window(
        want, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        "VALID",
    )
    assert jnp.array_equal(unpack_psrp(pooled, 2, 2), want_pool)


def test_ct_up_psrp_matches_lax():
    cin, cout = 16, 8
    H = W = 8
    x = _rand_int8((2, H, W, cin))
    w = np.asarray(RNG.integers(-20, 20, (2, 2, cin, cout)), np.int8)
    scale = jnp.asarray(RNG.uniform(1e-3, 2e-3, (cout,)), jnp.float32)
    bias = jnp.asarray(RNG.uniform(-3, 3, (cout,)), jnp.float32)
    got = ct_up_psrp(
        x, tuple(jnp.asarray(m) for m in pack_ct_up_weights(w)),
        scale, bias, tr=4, interpret=True,
    )
    want = _ref_ct(x, jnp.asarray(w), scale, bias)
    assert got.shape == (2, H, 2, W, 2 * cout)
    assert jnp.array_equal(unpack_psrp(got, 2, 2), want)


def test_ct_psrp_matches_lax():
    cin, cout = 16, 8
    H = W = 16  # input resolution (PSRP by=2/nph=2), output 2H x 2W
    x = _rand_int8((2, H, W, cin))
    w = np.asarray(RNG.integers(-20, 20, (2, 2, cin, cout)), np.int8)
    scale = jnp.asarray(RNG.uniform(1e-3, 2e-3, (cout,)), jnp.float32)
    bias = jnp.asarray(RNG.uniform(-3, 3, (cout,)), jnp.float32)
    got = ct_psrp(
        pack_psrp(x, 2, 2),
        tuple(jnp.asarray(m) for m in pack_ct_psrp_weights(w, by_in=2)),
        scale, bias, by_in=2, nph_in=2, tg=2, interpret=True,
    )
    want = _ref_ct(x, jnp.asarray(w), scale, bias)
    assert got.shape == (2, H // 2, 4, W // 2, 4 * cout)
    assert jnp.array_equal(unpack_psrp(got, 4, 4), want)


def test_stem_psrp_matches_lax():
    BY, by_out, nph = 8, 4, 4
    H = W = 32
    x = jnp.asarray(RNG.normal(0, 1, (2, H, W, 1)), jnp.float32)
    w = np.asarray(RNG.integers(-20, 20, (3, 3, 1, 8)), np.int8)
    s_in = np.float32(0.01)
    scale = jnp.asarray(RNG.uniform(1e-3, 2e-3, (8,)), jnp.float32)
    bias = jnp.asarray(RNG.uniform(-3, 3, (8,)), jnp.float32)
    xp = prep_stem_input(x, s_in, BY=BY, nph=nph)
    mats, _ = pack_stem_psrp_weights(w, BY, nph)
    got = stem_psrp(
        xp, tuple(jnp.asarray(m) for m in mats), scale, bias,
        BY=BY, by_out=by_out, nph=nph, interpret=True,
    )
    xq = jnp.clip(jnp.round(x / s_in), -127, 127).astype(jnp.int8)
    want = _ref_conv(xq, jnp.asarray(w), scale, bias)
    assert jnp.array_equal(unpack_psrp(got, by_out, nph), want)


def test_head_argmax_psrp():
    by = nph = 4
    cin, nc = 8, 5
    H = W = 16
    x = _rand_int8((2, H, W, cin))
    w = np.asarray(RNG.integers(-20, 20, (1, 1, cin, nc)), np.int8)
    scale = jnp.asarray(RNG.uniform(1e-3, 2e-3, (nc,)), jnp.float32)
    bias = jnp.asarray(RNG.uniform(-0.5, 0.5, (nc,)), jnp.float32)
    got = head_argmax_psrp(
        pack_psrp(x, by, nph),
        jnp.asarray(pack_head_psrp_weights(w, by, ncp=8)),
        np.asarray(scale), np.asarray(bias), by=by, nph=nph, nc=nc,
        tg=2, interpret=True,
    )
    logits = (
        jax.lax.dot_general(
            x.astype(jnp.int32).reshape(-1, cin), jnp.asarray(w)[0, 0],
            (((1,), (0,)), ((), ())),
        ).astype(jnp.float32) * scale + bias
    ).reshape(2, H, W, nc)
    want = jnp.argmax(logits, axis=-1).astype(jnp.int8)
    assert jnp.array_equal(got, want)


@pytest.mark.parametrize("by,nph", [(4, 4), (8, 4)])
def test_stem_conv_psrp_fused_matches_two_kernels(by, nph):
    """Fused stem+conv1+pool is bit-exact vs the two-conv lax reference."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
        pack_stem2_weights,
        prep_stem_window,
        stem_conv_psrp,
    )

    c1, cout = 8, 8
    H, W = 4 * by, 16
    x = jnp.asarray(RNG.normal(0, 1, (2, H, W, 1)), jnp.float32)
    w0 = np.asarray(RNG.integers(-20, 20, (3, 3, 1, c1)), np.int8)
    w1 = np.asarray(RNG.integers(-20, 20, (3, 3, c1, cout)), np.int8)
    s_in = np.float32(0.01)
    sc0 = jnp.asarray(RNG.uniform(1e-3, 2e-3, (c1,)), jnp.float32)
    b0 = jnp.asarray(RNG.uniform(-3, 3, (c1,)), jnp.float32)
    sc1 = jnp.asarray(RNG.uniform(1e-3, 2e-3, (cout,)), jnp.float32)
    b1 = jnp.asarray(RNG.uniform(-3, 3, (cout,)), jnp.float32)
    xwin = prep_stem_window(x, s_in, by=by, nph=nph)
    full, pooled = stem_conv_psrp(
        xwin,
        tuple(jnp.asarray(m) for m in pack_stem2_weights(w0, by, nph)),
        sc0, b0,
        tuple(jnp.asarray(m)
              for m in pack_psrp_weights(w1, by, nph)[0]),
        sc1, b1, by=by, nph=nph, tg=2, pool=True, interpret=True,
    )
    xq = jnp.clip(jnp.round(x / s_in), -127, 127).astype(jnp.int8)
    mid = _ref_conv(xq, jnp.asarray(w0), sc0, b0)
    want = _ref_conv(mid, jnp.asarray(w1), sc1, b1)
    assert jnp.array_equal(unpack_psrp(full, by, nph), want)
    want_pool = jax.lax.reduce_window(
        want, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        "VALID",
    )
    assert jnp.array_equal(unpack_psrp(pooled, by // 2, nph // 2),
                           want_pool)


def test_conv3x3_psrp_fused_head():
    """conv3x3_psrp(head=...) == conv3x3_psrp -> head_argmax_psrp."""
    by = nph = 4
    cin, cout, nc = 8, 8, 5
    H = W = 16
    x = _rand_int8((2, H, W, cin))
    w = np.asarray(RNG.integers(-20, 20, (3, 3, cin, cout)), np.int8)
    wh = np.asarray(RNG.integers(-20, 20, (1, 1, cout, nc)), np.int8)
    scale = jnp.asarray(RNG.uniform(1e-3, 2e-3, (cout,)), jnp.float32)
    bias = jnp.asarray(RNG.uniform(-3, 3, (cout,)), jnp.float32)
    hs = np.asarray(RNG.uniform(1e-3, 2e-3, (nc,)), np.float32)
    hb = np.asarray(RNG.uniform(-0.5, 0.5, (nc,)), np.float32)
    mats = tuple(jnp.asarray(m) for m in pack_psrp_weights(w, by, nph)[0])
    wh_packed = jnp.asarray(pack_head_psrp_weights(wh, by, ncp=8))
    p = pack_psrp(x, by, nph)
    fused = conv3x3_psrp(
        (p,), mats, scale, bias, by=by, nph=nph, cins=(cin,), tg=2,
        head=(wh_packed, hs, hb), interpret=True,
    )
    N, G, W2 = 2, H // by, W // nph
    fused_lab = (
        fused.reshape(N, nph, by, G, W2)
        .transpose(0, 3, 2, 4, 1)
        .reshape(N, H, W)
    )
    mid = conv3x3_psrp(
        (p,), mats, scale, bias, by=by, nph=nph, cins=(cin,), tg=2,
        interpret=True,
    )
    want = head_argmax_psrp(
        mid, wh_packed, hs, hb, by=by, nph=nph, nc=nc, tg=2,
        interpret=True,
    )
    assert jnp.array_equal(fused_lab, want)


def test_ct2x2_int8_matches_lax():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        ct2x2_int8,
        pack_ct2x2_weights,
    )

    cin, cout = 32, 16
    H = W = 8
    x = _rand_int8((2, H, W, cin))
    w = np.asarray(RNG.integers(-20, 20, (2, 2, cin, cout)), np.int8)
    scale = jnp.asarray(RNG.uniform(1e-3, 2e-3, (cout,)), jnp.float32)
    bias = jnp.asarray(RNG.uniform(-3, 3, (cout,)), jnp.float32)
    got = ct2x2_int8(
        x, tuple(jnp.asarray(m) for m in pack_ct2x2_weights(w)),
        scale, bias, tr=4, interpret=True,
    )
    want = _ref_ct(x, jnp.asarray(w), scale, bias)
    assert got.shape == (2, 2 * H, 2 * W, cout)
    assert jnp.array_equal(got, want)


def test_pool2x2_int8_matches_reshape_max():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        pool2x2_int8,
    )

    x = _rand_int8((2, 16, 12, 32))
    got = pool2x2_int8(x, th=4, interpret=True)
    n, h, w, c = x.shape
    want = jnp.max(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))
    assert jnp.array_equal(got, want)


@pytest.mark.parametrize("by,nph,cins,cout,pool", [
    (4, 4, (8,), 8, False),    # 512^2 single-input family
    (4, 4, (8, 8), 8, False),  # 512^2 folded-cat family (d1c0)
    (2, 2, (8, 8), 16, True),  # 256^2 cat + fused pool (d2c0-like)
    (8, 4, (4,), 4, False),    # f=16 by=8 family
])
def test_conv3x3_psrp_v2_matches_lax(by, nph, cins, cout, pool):
    """The round-4 assembly-free variant is bit-exact vs lax.conv."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
        pack_psrp_weights_v2,
    )

    H = W = 16
    xs = [_rand_int8((2, H, W, c)) for c in cins]
    w = np.asarray(RNG.integers(-20, 20, (3, 3, sum(cins), cout)), np.int8)
    scale = jnp.asarray(RNG.uniform(1e-3, 2e-3, (cout,)), jnp.float32)
    bias = jnp.asarray(RNG.uniform(-3, 3, (cout,)), jnp.float32)
    mats = pack_psrp_weights_v2(w, by, nph, cins=cins)
    got = conv3x3_psrp(
        tuple(pack_psrp(x, by, nph) for x in xs),
        tuple(jnp.asarray(m) for m in mats), scale, bias,
        by=by, nph=nph, cins=cins, tg=2, pool=pool, interpret=True,
        variant="v2",
    )
    if pool:
        got, pooled = got
    want = _ref_conv(jnp.concatenate(xs, -1) if len(xs) > 1 else xs[0],
                     jnp.asarray(w), scale, bias)
    assert jnp.array_equal(unpack_psrp(got, by, nph), want)
    if pool:
        want_pool = jax.lax.reduce_window(
            want, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID",
        )
        got_pool = (unpack_psrp(pooled, by // 2, nph // 2)
                    if nph > 2 else pooled.reshape(2, H // 2, W // 2, cout))
        assert jnp.array_equal(got_pool, want_pool)
