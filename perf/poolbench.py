"""Deep int8 2x2-pool lowering probe: Pallas reshape-max vs XLA forms.

Variants:
  pallas[:th=N] - ops/pallas_conv_int8.pool2x2_int8
  strided       - XLA max(x[:,::2],x[:,1::2]) then cols
  reshape       - XLA max over (n,h/2,2,w/2,2,c) reshape (round-2 form)
Usage: python perf/poolbench.py [variant ...]
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 128
SHORT, LONG = 2, 12
# the two deep pools: e3 128^2 x128ch, e4 64^2 x256ch
SHAPES = (((BATCH, 128, 128, 128)), ((BATCH, 64, 64, 256)))


def make(variant):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        pool2x2_int8,
    )

    th = None
    if ":" in variant:
        variant, _, r = variant.partition(":th=")
        th = int(r)

    def pool(t):
        if variant == "pallas":
            return pool2x2_int8(t, th=th or 8)
        if variant == "strided":
            a = jnp.maximum(t[:, 0::2], t[:, 1::2])
            return jnp.maximum(a[:, :, 0::2], a[:, :, 1::2])
        n, h, w, c = t.shape
        return jnp.max(t.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))

    xs = tuple(
        jax.jit(lambda k, s=s: jax.random.randint(k, s, -100, 100, jnp.int8))(
            jax.random.PRNGKey(i)
        )
        for i, s in enumerate(SHAPES)
    )

    @partial(jax.jit, static_argnums=1)
    def run(xs, iters):
        def body(c, _):
            tot = c
            for x in xs:
                xi = jax.lax.dynamic_update_slice(
                    x, c.astype(jnp.int8)[None, None, None, None],
                    (0, 0, 0, 0),
                )
                y = pool(xi)
                tot = tot + jnp.sum(y[:, ::16, ::16, 0], dtype=jnp.int32)
            return tot, None

        tot, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return tot

    return xs, run


def measure(variant):
    from common import scan_diff

    xs, run = make(variant)
    per = scan_diff(lambda n: int(run(xs, n)), SHORT, LONG)
    print(f"{variant:14s} {per*1e3:7.3f} ms/batch (both pools)", flush=True)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["pallas:th=8", "pallas:th=16", "pallas:th=32",
                              "strided", "reshape"]:
        try:
            measure(v)
        except Exception as e:
            print(f"{v} FAIL: {str(e).splitlines()[0][:140]}", flush=True)
