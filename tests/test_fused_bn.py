"""Fused train-mode BatchNorm (ops/fused_bn): numerics vs flax + VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.fused_bn import (
    bn_train,
)

RNG = np.random.default_rng(0)


def _data(dtype=jnp.float32, shape=(3, 8, 10, 6)):
    x = jnp.asarray(RNG.normal(0, 2, shape), dtype)
    g = jnp.asarray(RNG.uniform(0.5, 1.5, shape[-1]), jnp.float32)
    b = jnp.asarray(RNG.normal(0, 1, shape[-1]), jnp.float32)
    return x, g, b


def _ref_bn(x, g, b):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.var(xf, axis=(0, 1, 2))
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * g + b
    return y.astype(x.dtype), mean, var


def test_forward_matches_flax():
    x, g, b = _data()
    y, mean, var = bn_train(x, g, b)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5)
    vars_ = ref.init(jax.random.PRNGKey(0), x)
    vars_ = {"params": {"scale": g, "bias": b},
             "batch_stats": vars_["batch_stats"]}
    want, upd = ref.apply(vars_, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-5)
    # flax running update: 0.9*old + 0.1*batch (biased var)
    np.testing.assert_allclose(
        np.asarray(0.9 * 0.0 + 0.1 * mean),
        np.asarray(upd["batch_stats"]["mean"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(0.9 * 1.0 + 0.1 * var),
        np.asarray(upd["batch_stats"]["var"]), atol=1e-6)


def test_vjp_matches_autodiff():
    x, g, b = _data()
    r = jnp.asarray(RNG.normal(0, 1, x.shape), jnp.float32)

    def loss_fused(x, g, b):
        y, _, _ = bn_train(x, g, b)
        return jnp.sum(y * r)

    def loss_ref(x, g, b):
        y, _, _ = _ref_bn(x, g, b)
        return jnp.sum(y * r)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   atol=1e-4, rtol=1e-4)


def test_bf16_forward_close():
    x, g, b = _data(jnp.bfloat16)
    y, _, _ = bn_train(x, g, b)
    want, _, _ = _ref_bn(x, g, b)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want, np.float32), atol=0.05
    )


def test_blocks_batchnorm_routes_and_matches(monkeypatch):
    """models.blocks.BatchNorm train mode == nn.BatchNorm numerics, and the
    variable tree stays 'BatchNorm_0/{scale,bias,mean,var}'."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.blocks import (
        BatchNorm,
    )

    x, g, b = _data()
    m = BatchNorm()
    vars_ = m.init(jax.random.PRNGKey(0), x, use_running_average=False)
    assert set(vars_["params"]["BatchNorm_0"]) == {"scale", "bias"}
    assert set(vars_["batch_stats"]["BatchNorm_0"]) == {"mean", "var"}
    vars_ = {
        "params": {"BatchNorm_0": {"scale": g, "bias": b}},
        "batch_stats": vars_["batch_stats"],
    }
    y, upd = m.apply(vars_, x, use_running_average=False,
                     mutable=["batch_stats"])
    want, _, _ = _ref_bn(x, g, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-5)

    # disabled flag -> plain flax path, same tree, same numbers
    monkeypatch.setenv("OCTSEG_FUSED_BN", "0")
    y2, upd2 = m.apply(vars_, x, use_running_average=False,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["BatchNorm_0"]["var"]),
        np.asarray(upd2["batch_stats"]["BatchNorm_0"]["var"]), atol=1e-5)


def test_eval_mode_unchanged():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.blocks import (
        BatchNorm,
    )

    x, g, b = _data()
    m = BatchNorm()
    vars_ = m.init(jax.random.PRNGKey(0), x, use_running_average=False)
    stats = {"mean": jnp.asarray(RNG.normal(0, 1, 6), jnp.float32),
             "var": jnp.asarray(RNG.uniform(0.5, 2, 6), jnp.float32)}
    vars_ = {
        "params": {"BatchNorm_0": {"scale": g, "bias": b}},
        "batch_stats": {"BatchNorm_0": stats},
    }
    y = m.apply(vars_, x, use_running_average=True)
    want = (x - stats["mean"]) * jax.lax.rsqrt(stats["var"] + 1e-5) * g + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-5)


def test_forward_and_grad_2d_input():
    """SDNet's modality encoder feeds (B, C) features through BatchNorm —
    the fused path must handle any rank (regression: round-3 IndexError)."""
    x = jnp.asarray(RNG.normal(0, 2, (6, 5)), jnp.float32)
    g = jnp.asarray(RNG.uniform(0.5, 1.5, 5), jnp.float32)
    b = jnp.asarray(RNG.normal(0, 1, 5), jnp.float32)
    y, mean, var = bn_train(x, g, b)
    xf = x.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(mean), np.mean(xf, 0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.var(xf, 0), rtol=1e-5)
    want = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * g + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-5)

    def loss(x):
        return jnp.sum(bn_train(x, g, b)[0] ** 2)

    def ref_loss(x):
        m = jnp.mean(x, 0)
        v = jnp.var(x, 0)
        return jnp.sum(((x - m) * jax.lax.rsqrt(v + 1e-5) * g + b) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(x)), np.asarray(jax.grad(ref_loss)(x)),
        atol=1e-4,
    )
