"""Packed-kernel probe: conv3x3_int8_packed per serving stage, tg sweep.

Scan-difference methodology (see abench.py).
Usage: python perf/pkbench.py [stage[:tg=N] ...]
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 128
SHORT, LONG = 2, 10
BY = 4

# name: (H, W, cins, cout)
STAGES = {
    "e1b": (512, 512, (32,), 32),
    "e2a": (256, 256, (32,), 64),
    "e2b": (256, 256, (64,), 64),
    "d2c0": (256, 256, (64, 64), 64),
    "d2c1": (256, 256, (64,), 64),
    "d1c0": (512, 512, (32, 32), 32),
    "d1c1": (512, 512, (32,), 32),
}


def probe(name, H, W, cins, cout, tg, pool=False, fuse_dx=False):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        pack_weights,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_packed import (
        conv3x3_int8_packed,
    )

    rng = np.random.default_rng(0)
    cin_tot = sum(cins)
    G = H // BY
    ps = tuple(
        jnp.asarray(rng.integers(-100, 100, (BATCH, G, W, BY * c)), jnp.int8)
        for c in cins
    )
    wp = jnp.asarray(
        pack_weights(
            rng.integers(-20, 20, (3, 3, cin_tot, cout)).astype(np.int8), BY
        )
    )
    scale = jnp.full((cout,), 1e-3, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    @partial(jax.jit, static_argnums=(1,))
    def run(ps, iters: int):
        def body(c, i):
            sc = scale + i.astype(jnp.float32) * 1e-12
            y = conv3x3_int8_packed(ps, wp, sc, bias, by=BY, cins=cins,
                                    tg=tg, pool=pool, fuse_dx=fuse_dx)
            if pool:
                y = y[0]
            return c + y[0, 0, 0, 0].astype(jnp.int32), None

        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
        return tot

    from common import scan_diff

    per_iter = scan_diff(lambda n: int(run(ps, n)), SHORT, LONG)
    flops = 2 * BATCH * H * W * 9 * cin_tot * cout
    print(
        f"{name:5s} {H}^2 {cin_tot:3d}->{cout:3d} tg={tg}"
        f"{' pool' if pool else ''}{' fuse' if fuse_dx else ''}: "
        f"{per_iter*1e3:7.2f} ms  {flops/per_iter/1e12:6.1f} TFLOPs",
        flush=True,
    )


if __name__ == "__main__":
    args = sys.argv[1:] or [f"{n}:tg={t}" for n in ("d1c0", "e1b", "d2c0")
                            for t in (2, 4, 8)]
    for a in args:
        name, _, ov = a.partition(":")
        H, W, cins, cout = STAGES[name]
        tg, pool, fuse = 4, False, False
        for o in ov.split(","):
            if o.startswith("tg="):
                tg = int(o[3:])
            elif o == "pool":
                pool = True
            elif o == "fuse":
                fuse = True
        probe(name, H, W, cins, cout, tg, pool, fuse)
