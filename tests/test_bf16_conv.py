"""PSRP bf16 training conv: fwd + custom VJP vs lax.conv autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_bf16 import (
    conv3x3_psrp_bf16,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
    pack_psrp,
    unpack_psrp,
)

RNG = np.random.default_rng(7)


def _ref_conv(x, w):
    # fp32 throughout (inputs are small integers, so this matches the
    # kernel's bf16-in/fp32-accum exactly) — keeps lax.conv's grad rule
    # dtype-consistent.
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.bfloat16)


def _ints(shape, lo=-4, hi=5):
    """Small integers: bf16-exact so parity is equality, not tolerance."""
    return jnp.asarray(RNG.integers(lo, hi, shape), jnp.bfloat16)


@pytest.mark.parametrize("by,nph,cin,cout", [(4, 4, 8, 8), (2, 2, 8, 16),
                                             (1, 1, 16, 8)])
def test_fwd_matches_lax(by, nph, cin, cout):
    H = W = 16
    x = _ints((2, H, W, cin))
    w = _ints((3, 3, cin, cout))
    got = conv3x3_psrp_bf16(pack_psrp(x, by, nph), w, by, nph, 2, True)
    want = _ref_conv(x, w)
    assert jnp.array_equal(unpack_psrp(got, by, nph), want)


@pytest.mark.parametrize("by,nph", [(4, 4), (2, 2)])
def test_grads_match_lax(by, nph):
    H = W = 16
    cin, cout = 8, 8
    x = _ints((2, H, W, cin))
    w = _ints((3, 3, cin, cout))
    t = _ints((2, H, W, cout))  # integer cotangent via squared loss target

    def loss_ref(x_, w_):
        return jnp.sum((_ref_conv(x_, w_).astype(jnp.float32)
                        - t.astype(jnp.float32)) ** 2)

    def loss_psrp(x_, w_):
        y = conv3x3_psrp_bf16(pack_psrp(x_, by, nph), w_, by, nph, 2, True)
        return jnp.sum((unpack_psrp(y, by, nph).astype(jnp.float32)
                        - t.astype(jnp.float32)) ** 2)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss_psrp, argnums=(0, 1))(x, w)
    # the cotangent 2*(y-t) is integer-valued and bf16-exact; both paths
    # accumulate in fp32, so grads agree to bf16 rounding of the cotangent
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(gx_ref, np.float32),
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(gw, np.float32), np.asarray(gw_ref, np.float32),
        rtol=1e-6, atol=0,
    )


def test_fwd_nonsquare_tiles():
    by = nph = 2
    cin = cout = 8
    H, W = 24, 16
    x = _ints((1, H, W, cin))
    w = _ints((3, 3, cin, cout))
    got = conv3x3_psrp_bf16(pack_psrp(x, by, nph), w, by, nph, 3, True)
    assert jnp.array_equal(unpack_psrp(got, by, nph), _ref_conv(x, w))
