"""PSRP bf16 training conv vs XLA lax.conv at the f=32 full-res geometry.

Compares fwd-only and fwd+bwd (grads wrt x AND w) at (16, 512, 512, 32)
-> 32 — the shape where perf/convroof_probe.py measured XLA at 25.7
TFLOPs fwd+bwd. Inputs generated on device; packed tensors timed without
the pack cost (a packed training graph packs once at the input).
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from common import scan_diff

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_bf16 import (
    conv3x3_psrp_bf16,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
    pack_psrp,
)

SHORT, LONG = 2, 8
N, H, W, CIN, COUT = 16, 512, 512, 32, 32
BY, NPH = 4, 4


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, H, W, CIN), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, CIN, COUT), jnp.bfloat16) * 0.05
    xp = jax.jit(partial(pack_psrp, by=BY, nph=NPH))(x)
    tg = int(os.environ.get("OCTSEG_BF16_TG", "8"))

    def conv_ref(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    flops1 = 2 * N * H * W * 9 * CIN * COUT

    for name, fn, arg in (
        ("xla", conv_ref, x),
        ("psrp", lambda x_, w_: conv3x3_psrp_bf16(x_, w_, BY, NPH, tg), xp),
    ):
        @partial(jax.jit, static_argnums=(2,))
        def run_fwd(a, w_, iters: int, fn=fn):
            def body(c, i):
                y = fn(a, w_ * (1 + i.astype(jnp.bfloat16) * 1e-8))
                return c + jnp.sum(y.astype(jnp.float32)), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return tot

        @partial(jax.jit, static_argnums=(2,))
        def run_bwd(a, w_, iters: int, fn=fn):
            def loss(a_, w__):
                return jnp.sum(fn(a_, w__).astype(jnp.float32) ** 2)

            g = jax.grad(loss, argnums=(0, 1))

            def body(c, i):
                gx, gw = g(a, w_ * (1 + i.astype(jnp.bfloat16) * 1e-8))
                # full sums: consuming single elements lets XLA
                # slice-propagate through the grad and skip most of the
                # conv (seen in convroof_probe's garbage fwd numbers)
                return (
                    c
                    + jnp.sum(gx.astype(jnp.float32))
                    + jnp.sum(gw.astype(jnp.float32)),
                    None,
                )

            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return tot

        per = scan_diff(lambda it: float(run_fwd(arg, w, it)), SHORT, LONG)
        print(f"{name:5s} fwd    : {per*1e3:7.2f} ms "
              f"{flops1/per/1e12:6.1f} useful-TFLOPs", flush=True)
        per = scan_diff(lambda it: float(run_bwd(arg, w, it)), SHORT, LONG)
        print(f"{name:5s} fwd+bwd: {per*1e3:7.2f} ms "
              f"{3*flops1/per/1e12:6.1f} useful-TFLOPs", flush=True)


if __name__ == "__main__":
    main()
