"""Layout hypothesis probe: is training's elementwise/BN traffic paying
lane-padding for <128-channel tensors in NHWC at training batch sizes?

Times an identical conv -> batch-stats -> normalize+relu -> conv chain
(fwd+bwd) in NHWC vs NCHW at the U-Net's full-res geometry. If NCHW (W in
lanes, never padded) is much faster, the whole-model NCHW training variant
is worth building; if neutral, the bottleneck is elsewhere.

Usage: python perf/layout_probe.py [b16|b32 ...]
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 512
C = 32
SHORT, LONG = 2, 12


def make(layout: str, batch: int):
    rng = np.random.default_rng(0)
    if layout == "nhwc":
        xshape = (batch, SIZE, SIZE, 1)
        wshape = (3, 3, 1, C)
        w2shape = (3, 3, C, C)
        dn = ("NHWC", "HWIO", "NHWC")
        caxes = (0, 1, 2)
        cshape = (1, 1, 1, C)
    else:
        xshape = (batch, 1, SIZE, SIZE)
        wshape = (3, 3, 1, C)
        w2shape = (3, 3, C, C)
        dn = ("NCHW", "HWIO", "NCHW")
        caxes = (0, 2, 3)
        cshape = (1, C, 1, 1)
    w1 = jnp.asarray(rng.standard_normal(wshape) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal(w2shape) * 0.1, jnp.bfloat16)
    g = jnp.ones((C,), jnp.float32)

    def chain(params, x):
        w1, w2, g = params
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
        for w in (w2, w2):
            # batch stats (fp32) + normalize + relu, like train-mode BN
            m = jnp.mean(y, axis=caxes, dtype=jnp.float32)
            v = jnp.mean(
                jnp.square(y.astype(jnp.float32)), axis=caxes) - m * m
            sc = (g / jnp.sqrt(v + 1e-5)).reshape(cshape)
            y = jax.nn.relu(
                ((y.astype(jnp.float32) - m.reshape(cshape)) * sc
                 ).astype(jnp.bfloat16))
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
        return jnp.sum(y.astype(jnp.float32))

    params = (w1, w2, g)

    @partial(jax.jit, static_argnums=1)
    def run(params, iters: int):
        def body(acc, k):
            x = (jax.random.bits(k, xshape, jnp.uint16)
                 .astype(jnp.bfloat16) / 65536.0)
            loss, grads = jax.value_and_grad(chain)(params, x)
            return acc + loss + sum(jnp.sum(t.astype(jnp.float32))
                                    for t in jax.tree.leaves(grads)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jax.random.split(jax.random.PRNGKey(0), iters))
        return acc

    return lambda iters: float(run(params, iters))


def main():
    from common import scan_diff

    variants = sys.argv[1:] or ["b16", "b32"]
    for v in variants:
        batch = int(v[1:])
        for layout in ("nhwc", "nchw"):
            go = make(layout, batch)
            per = scan_diff(go, SHORT, LONG, reps=2)
            print(f"{layout} b{batch}: {per*1e3:8.2f} ms/iter")


if __name__ == "__main__":
    main()
