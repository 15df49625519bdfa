"""Standalone dice_ce loss fwd+bwd: XLA vs fused Pallas kernel.

Isolates perf/packed_bisect.py's fusedloss regression: is the Pallas
kernel slow, or does the class-major (NCHW) head layout tax the step?
Times value_and_grad of the loss alone at the packed-train geometry.
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from common import scan_diff

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_loss import (
    dice_ce_loss_pallas,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.losses import (
    dice_ce_loss,
)

B, H, W, C = int(os.environ.get("OCTSEG_BENCH_BATCH", "16")), 512, 512, 10


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    xt = jnp.asarray(x.transpose(0, 3, 1, 2))
    y = jax.random.randint(key, (B, H, W), 0, C)

    cases = {
        "xla": (lambda t: dice_ce_loss(t, y), x),
        "pallas_nhwc": (lambda t: dice_ce_loss_pallas(t, y), x),
        "pallas_nchw": (lambda t: dice_ce_loss_pallas(t, y, nchw=True), xt),
    }
    for name, (fn, arg) in cases.items():
        g = jax.value_and_grad(fn)

        @partial(jax.jit, static_argnums=1)
        def run(a, iters: int, g=g):
            def body(c, i):
                l, dx = g(a * (1 + i.astype(jnp.bfloat16) * 1e-8))
                return c + l + jnp.sum(dx.astype(jnp.float32)), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return tot

        per = scan_diff(lambda it: float(run(arg, it)), 2, 10)
        print(f"{name:12s}: {per*1e3:7.2f} ms fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
