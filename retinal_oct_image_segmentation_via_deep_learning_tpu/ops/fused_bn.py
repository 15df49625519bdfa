"""Fused training BatchNorm: one-pass Pallas stats + hand-written VJP.

Round-2 training traces (docs/ROADMAP.md): the 512^2 U-Net train step
spends ~170 of 291 ms in BN statistics + normalize traffic — XLA
materializes the bf16->fp32 converts feeding each reduction, runs mean and
variance as separate passes, and rematerializes stat chains in the
backward. This module replaces the train-mode path of every BatchNorm
with:

* ``_stats``: ONE Pallas pass over x producing per-channel (sum, sum_sq)
  partials with fp32 VMEM accumulators (bf16 read once; XLA's path read it
  several times in fp32);
* normalize as a single fused elementwise op (scale/shift precomputed per
  channel in fp32);
* ``jax.custom_vjp`` backward: one Pallas pass over (dy, x) producing the
  (sum dy, sum dy*x_hat) channel reductions, then one fused elementwise
  pass for dx — instead of XLA's re-derived stat chains.

Semantics match ``flax.linen.BatchNorm`` (biased batch variance, fp32
statistics, eps inside the sqrt) to float tolerance; running-stat updates
stay in the caller (models/blocks.BatchNorm) with flax momentum semantics.
CPU/interpret fallback uses the identical math in plain XLA, so tests
exercise the same code path everywhere.

Reference provenance: the reference trains with torch/Keras default
BatchNorm (e.g. `/root/reference/SOTAS/Lesions_Segment/ReLayNet_2017.py:158`);
this is TPU-native training machinery with no reference counterpart.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h: int) -> int:
    for th in (16, 8, 4, 2, 1):
        if h % th == 0:
            return th
    return 1


def _sum_kernel(two_inputs: bool):
    if two_inputs:
        def kernel(a_ref, b_ref, o_ref):
            a = a_ref[0].astype(jnp.float32)
            b = b_ref[0].astype(jnp.float32)
            o_ref[0, 0, 0] = jnp.sum(a, axis=(0, 1))
            o_ref[0, 0, 1] = jnp.sum(a * b, axis=(0, 1))
        return kernel

    def kernel(x_ref, o_ref):
        x = x_ref[0].astype(jnp.float32)
        o_ref[0, 0, 0] = jnp.sum(x, axis=(0, 1))
        o_ref[0, 0, 1] = jnp.sum(x * x, axis=(0, 1))
    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def _pallas_pair_sums(a, b=None, interpret: bool = False):
    """(N, H, W, C) -> (2, C) fp32: [sum a, sum a*a] (or [sum a, sum a*b]).

    Pallas operands take the DEFAULT (8,128)-tiled layout, which lane-pads
    C<128 tensors 4x/2x — at 512^2 b32 that alone OOMs HBM (21.9G measured).
    For C<128 the operands are therefore viewed lane-dense as
    (N, H, W/R, R*C) with R = 128//C (pure relayout, no padding); the
    kernel's per-block (2, R*C) partials are folded back to C afterwards.
    """
    N, H, W, C = a.shape
    R = max(128 // C, 1) if C < 128 and W % (128 // C) == 0 else 1
    Wd, Cd = W // R, R * C
    th = _pick_th(H)
    S = H // th
    ops = (a,) if b is None else (a, b)
    if R > 1:
        ops = tuple(o.reshape(N, H, Wd, Cd) for o in ops)
    specs = [
        pl.BlockSpec((1, th, Wd, Cd), lambda n, s: (n, s, 0, 0),
                     memory_space=pltpu.VMEM)
    ] * len(ops)
    partials = pl.pallas_call(
        _sum_kernel(b is not None),
        grid=(N, S),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 1, 2, Cd), lambda n, s: (n, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, 2, Cd), jnp.float32),
        interpret=interpret,
    )(*ops)
    sums = jnp.sum(partials, axis=(0, 1))
    if R > 1:
        sums = jnp.sum(sums.reshape(2, R, C), axis=1)
    return sums


def _pair_sums(a, b=None):
    """One-pass per-channel [sum, sum-of-products] in fp32.

    Default: plain XLA — the two reductions share the input and fuse into
    ONE multi-output pass with the bf16->fp32 convert folded in, and impose
    no layout constraint on the producing conv. The Pallas variant
    (``OCTSEG_BN_STATS=pallas``) forces the default (8,128) layout on its
    operand, which at C<128 costs a relayout copy (lane-dense reshape) and
    pins neighbouring tensors into 4x lane-padded layouts — measured OOM
    at 512^2 b32 (18.3-21.9G of 15.75G HBM).
    """
    import os as _os

    if (a.ndim == 4 and jax.default_backend() == "tpu"
            and _os.environ.get("OCTSEG_BN_STATS") == "pallas"):
        return _pallas_pair_sums(a, b)
    axes = tuple(range(a.ndim - 1))  # all-but-channel (any rank: 2-D
    # modality-encoder features through 4-D NHWC maps)
    s0 = jnp.sum(a, axis=axes, dtype=jnp.float32)
    af = a.astype(jnp.float32)
    s1 = jnp.sum(af * af if b is None else af * b.astype(jnp.float32),
                 axis=axes)
    return jnp.stack([s0, s1])


EPS = 1e-5


@jax.custom_vjp
def bn_train(x, gamma, beta):
    """Train-mode BN: returns (y, batch_mean, batch_var) — flax semantics
    (fp32 biased stats, y cast back to x.dtype). mean/var outputs are for
    running-stat updates and carry no gradient."""
    y, mean, var, _ = _bn_fwd_impl(x, gamma, beta)
    return y, mean, var


def _bn_fwd_impl(x, gamma, beta):
    m = int(np.prod(x.shape[:-1]))
    sums = _pair_sums(x)
    mean = sums[0] / m
    var = jnp.maximum(sums[1] / m - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + EPS)
    scale = gamma.astype(jnp.float32) * inv
    shift = beta.astype(jnp.float32) - mean * scale
    y = (x.astype(jnp.float32) * scale + shift).astype(x.dtype)
    return y, mean, var, inv


def _bn_fwd(x, gamma, beta):
    y, mean, var, inv = _bn_fwd_impl(x, gamma, beta)
    return (y, mean, var), (x, mean, inv, gamma)


def _bn_bwd(res, cts):
    dy, _dmean, _dvar = cts  # stat outputs feed stop-gradient updates
    x, mean, inv, gamma = res
    m = int(np.prod(x.shape[:-1]))
    # one fused pass: [sum dy, sum dy * x]; dy*x_hat derived per channel
    sums = _pair_sums(dy, x)
    dbeta = sums[0]
    dgamma = (sums[1] - mean * dbeta) * inv
    g = gamma.astype(jnp.float32) * inv
    # dx = g * (dy - (x_hat * dgamma + dbeta)/m); x_hat = (x - mean) * inv
    c1 = g * dgamma * inv / m
    c0 = g * (dbeta + dgamma * inv * (-mean)) / m
    dx = (
        dy.astype(jnp.float32) * g
        - x.astype(jnp.float32) * c1
        - c0
    ).astype(x.dtype)
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


bn_train.defvjp(_bn_fwd, _bn_bwd)
