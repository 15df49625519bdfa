"""PSRP kernel probe: conv3x3_psrp per serving stage, tg sweep.

Scan-difference methodology (perf/common.py).
Usage: python perf/psrpbench.py [stage[:tg=N][,pool] ...]
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
SHORT, LONG = 2, int(os.environ.get("OCTSEG_BENCH_LONG", "10"))

# name: (H, W, by, nph, cins, cout)
STAGES = {
    "e1b": (512, 512, 4, 4, (32,), 32),
    "e2a": (256, 256, 2, 2, (32,), 64),
    "e2b": (256, 256, 2, 2, (64,), 64),
    "d2c0": (256, 256, 2, 2, (64, 64), 64),
    "d2c1": (256, 256, 2, 2, (64,), 64),
    "d1c0": (512, 512, 4, 4, (32, 32), 32),
    "d1c1": (512, 512, 4, 4, (32,), 32),
}


def probe(name, H, W, by, nph, cins, cout, tg, pool=False, variant="v1"):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
        conv3x3_psrp,
        pack_psrp_weights,
        pack_psrp_weights_v2,
    )

    rng = np.random.default_rng(0)
    G, W2 = H // by, W // nph
    # generate inputs ON DEVICE: host-side GB arrays + tunnel transfers
    # stalled for 49 min in the first attempt (round-3 lesson)
    ps = tuple(
        jax.jit(
            lambda k, c=c: jax.random.randint(
                k, (BATCH, G, nph, W2, by * c), -100, 100, jnp.int8
            )
        )(jax.random.PRNGKey(17 + i))
        for i, c in enumerate(cins)
    )
    wq = rng.integers(-20, 20, (3, 3, sum(cins), cout)).astype(np.int8)
    if variant == "v2":
        mats = pack_psrp_weights_v2(wq, by, nph, cins=cins)
    else:
        mats, _ = pack_psrp_weights(wq, by, nph, cins=cins)
    mats = tuple(jnp.asarray(m) for m in mats)
    scale = jnp.full((cout,), 1e-3, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    @partial(jax.jit, static_argnums=(1,))
    def run(ps, iters: int):
        def body(c, i):
            sc = scale + i.astype(jnp.float32) * 1e-12
            y = conv3x3_psrp(ps, mats, sc, bias, by=by, nph=nph,
                             cins=cins, tg=tg, pool=pool, variant=variant)
            if pool:
                y = y[0]
            return c + y[0, 0, 0, 0, 0].astype(jnp.int32), None

        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
        return tot

    from common import scan_diff

    per_iter = scan_diff(lambda n: int(run(ps, n)), SHORT, LONG)
    flops = 2 * BATCH * H * W * 9 * sum(cins) * cout
    print(
        f"{name:5s} {H}^2 by={by} nph={nph} {sum(cins):3d}->{cout:3d} "
        f"tg={tg:2d} {variant}{' pool' if pool else ''}: "
        f"{per_iter*1e3:7.2f} ms  {flops/per_iter/1e12:6.1f} TFLOPs",
        flush=True,
    )


if __name__ == "__main__":
    args = sys.argv[1:] or [f"{n}:tg={t}" for n in STAGES
                            for t in (4, 8, 16)]
    for a in args:
        name, _, ov = a.partition(":")
        H, W, by, nph, cins, cout = STAGES[name]
        tg, pool, variant = 8, False, "v1"
        for o in ov.split(","):
            if o.startswith("tg="):
                tg = int(o[3:])
            elif o == "pool":
                pool = True
            elif o in ("v1", "v2", "v1raw"):
                variant = o
        probe(name, H, W, by, nph, cins, cout, tg, pool, variant)
