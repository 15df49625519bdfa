"""Torch-parity tests for the low-level ops (resize, pooling, conv-transpose)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu import ops
from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pooling import (
    adaptive_avg_pool,
    avg_pool,
    max_pool,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def _nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture
def x(rng):
    return rng.standard_normal((2, 13, 17, 3)).astype(np.float32)


@pytest.mark.parametrize("out_hw", [(26, 34), (7, 9), (13, 17), (20, 11)])
def test_resize_nearest(x, out_hw):
    ref = F.interpolate(_nchw(x), size=out_hw, mode="nearest")
    got = ops.resize_nearest(jnp.asarray(x), out_hw)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-6)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("out_hw", [(26, 34), (7, 9), (40, 23)])
def test_resize_bilinear(x, out_hw, align):
    ref = F.interpolate(
        _nchw(x), size=out_hw, mode="bilinear", align_corners=align
    )
    got = ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=align)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-5)


def test_max_pool_unpool_roundtrip(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    pool = torch.nn.MaxPool2d(2, 2, return_indices=True)
    unpool = torch.nn.MaxUnpool2d(2, 2)
    tp, tidx = pool(_nchw(x))
    tun = unpool(tp, tidx)

    jp, jidx = ops.max_pool_argmax(jnp.asarray(x), 2)
    jun = ops.max_unpool(jp, jidx, 2)
    np.testing.assert_allclose(np.asarray(jp), _nhwc(tp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jun), _nhwc(tun), atol=1e-6)


def test_max_pool_plain(rng):
    x = rng.standard_normal((2, 12, 12, 3)).astype(np.float32)
    ref = F.max_pool2d(_nchw(x), 2, 2)
    got = max_pool(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-6)


def test_avg_pool(rng):
    x = rng.standard_normal((2, 12, 12, 3)).astype(np.float32)
    ref = F.avg_pool2d(_nchw(x), 2, 2)
    got = avg_pool(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-6)


@pytest.mark.parametrize("out_hw", [(1, 1), (4, 4), (5, 3)])
def test_adaptive_avg_pool(rng, out_hw):
    x = rng.standard_normal((2, 12, 12, 3)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(_nchw(x), out_hw)
    got = adaptive_avg_pool(jnp.asarray(x), out_hw)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-5)


@pytest.mark.parametrize("k,s,p,op", [(2, 2, 0, 0), (3, 2, 1, 1), (4, 2, 1, 0)])
def test_conv_transpose_matches_torch(rng, k, s, p, op):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.blocks import (
        ConvTranspose,
    )

    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    wt = rng.standard_normal((3, 5, k, k)).astype(np.float32)  # (I,O,k,k)
    bias = rng.standard_normal((5,)).astype(np.float32)
    ref = F.conv_transpose2d(
        _nchw(x), torch.from_numpy(wt), torch.from_numpy(bias),
        stride=s, padding=p, output_padding=op,
    )

    mod = ConvTranspose(5, k, s, p, output_padding=op)
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    vars_ = {
        "params": {
            "kernel": jnp.asarray(wt.transpose(2, 3, 0, 1)),
            "bias": jnp.asarray(bias),
        }
    }
    got = mod.apply(vars_, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-4)


def test_reflect_pad(rng):
    x = rng.standard_normal((1, 6, 7, 2)).astype(np.float32)
    ref = F.pad(_nchw(x), (3, 3, 2, 2), mode="reflect")
    got = ops.reflect_pad_2d(jnp.asarray(x), (3, 3, 2, 2))
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-6)
