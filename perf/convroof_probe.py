"""How far off the MXU roofline are XLA's training convs at f=32?

Hypothesis (round 3): the flagship U-Net trains at 359 ms/step (b32 512^2)
mostly because bf16 3x3 convs with cin/cout=32 are MXU-hostile under XLA —
cout=32 pads the GEMM N dim to 128 (25% N-efficiency) and K=9*32=288 pads
to 384 — so the full-res stages run at ~20% of peak, while 128-channel
convs (deep stages) run near it. If true, a Pallas bf16 PSRP conv (banded
K=576, N=by*cout=128) is worth building for training; if lax.conv at 32ch
achieves similar TFLOPs to 128ch, the thesis is dead and training is
already op-mix-bound.

Measures fwd and fwd+bwd TFLOPs for:
  conv32 : (16, 512, 512, 32) -> 32, 3x3 SAME bf16   (the e1/d1 stages)
  conv128: (16, 128, 128, 128) -> 128, 3x3 SAME bf16 (equal FLOPs, deep)
  matmul : dense bf16 GEMM of comparable FLOPs       (peak reference)
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from common import scan_diff

SHORT, LONG = 2, 8


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def probe_conv(name, shape, cout, bwd):
    n, h, wd, cin = shape
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.05

    if bwd:
        def loss(w_, x_):
            return jnp.sum(_conv(x_, w_).astype(jnp.float32) ** 2)

        grad = jax.grad(loss)

        @partial(jax.jit, static_argnums=(2,))
        def run(w_, x_, iters: int):
            def body(c, i):
                g = grad(w_ * (1 + i.astype(jnp.bfloat16) * 1e-8), x_)
                return c + g[0, 0, 0, 0].astype(jnp.float32), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return tot
    else:
        @partial(jax.jit, static_argnums=(2,))
        def run(w_, x_, iters: int):
            def body(c, i):
                y = _conv(x_, w_ * (1 + i.astype(jnp.bfloat16) * 1e-8))
                return c + y[0, 0, 0, 0].astype(jnp.float32), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return tot

    per = scan_diff(lambda it: float(run(w, x, it)), SHORT, LONG)
    flops = 2 * n * h * wd * 9 * cin * cout * (3 if bwd else 1)
    print(
        f"{name:8s} {'fwd+bwd' if bwd else 'fwd    '}: {per*1e3:7.2f} ms "
        f"{flops/per/1e12:6.1f} TFLOPs",
        flush=True,
    )


def probe_matmul(bwd):
    m, k, n = 8192, 2304, 1024
    key = jax.random.PRNGKey(1)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16) * 0.02

    if bwd:
        def loss(b_, a_):
            return jnp.sum((a_ @ b_).astype(jnp.float32) ** 2)

        grad = jax.grad(loss)

        @partial(jax.jit, static_argnums=(2,))
        def run(b_, a_, iters: int):
            def body(c, i):
                g = grad(b_ * (1 + i.astype(jnp.bfloat16) * 1e-8), a_)
                return c + g[0, 0].astype(jnp.float32), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return tot
    else:
        @partial(jax.jit, static_argnums=(2,))
        def run(b_, a_, iters: int):
            def body(c, i):
                y = a_ @ (b_ * (1 + i.astype(jnp.bfloat16) * 1e-8))
                return c + y[0, 0].astype(jnp.float32), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return tot

    per = scan_diff(lambda it: float(run(b, a, it)), SHORT, LONG)
    flops = 2 * m * k * n * (3 if bwd else 1)
    print(
        f"{'matmul':8s} {'fwd+bwd' if bwd else 'fwd    '}: {per*1e3:7.2f} ms "
        f"{flops/per/1e12:6.1f} TFLOPs",
        flush=True,
    )


if __name__ == "__main__":
    for bwd in (False, True):
        probe_conv("conv32", (16, 512, 512, 32), 32, bwd)
        probe_conv("conv128", (16, 128, 128, 128), 128, bwd)
        probe_matmul(bwd)
