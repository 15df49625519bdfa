"""Pallas int8 conv kernel vs lax.conv (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.mark.parametrize("relu,out_int8", [(True, True), (False, False)])
def test_conv3x3_int8_matches_lax(rng, relu, out_int8):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        conv3x3_int8,
        conv3x3_int8_reference,
        pack_weights,
    )

    N, H, W, cin, cout = 1, 32, 128, 32, 64
    x = jnp.asarray(rng.integers(-100, 100, (N, H, W, cin)), jnp.int8)
    w = rng.integers(-20, 20, (3, 3, cin, cout)).astype(np.int8)
    scale = jnp.asarray(rng.uniform(1e-4, 1e-3, (cout,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (cout,)), jnp.float32)

    wp = jnp.asarray(pack_weights(w))
    got = conv3x3_int8(x, wp, scale, bias, relu=relu, out_int8=out_int8,
                       th=8, interpret=True)
    want = conv3x3_int8_reference(x, wp, scale, bias, relu=relu,
                                  out_int8=out_int8)
    if out_int8:
        # int8 rounding boundaries can differ by 1 ulp in rare ties
        diff = np.abs(
            np.asarray(got, np.int32) - np.asarray(want, np.int32)
        )
        assert (diff <= 1).all() and (diff == 0).mean() > 0.999
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-5)
