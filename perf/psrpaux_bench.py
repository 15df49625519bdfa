"""Isolated probes for the PSRP auxiliary kernels: stem, ct_up, ct_psrp,
head — tile sweeps without recompiling the whole serving graph.

Usage: python perf/psrpaux_bench.py [kernel[:t=N] ...]
kernels: stem ct_up ct_psrp head   (t = tr/tg tile parameter)
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
SIZE = 512
SHORT, LONG = 2, 12


def make(kernel, t):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops import (
        pallas_conv_psrp as K,
    )

    rng = np.random.default_rng(0)

    if kernel == "stem":
        BY, nph, cout = 32, 4, 32
        xp = jax.jit(lambda k: jax.random.randint(
            k, (BATCH, SIZE // BY, nph, SIZE // nph, BY), -100, 100, jnp.int8
        ))(jax.random.PRNGKey(5))
        mats, _ = K.pack_stem_psrp_weights(
            rng.integers(-20, 20, (3, 3, 1, cout)).astype(np.int8), BY, nph
        )
        mats = tuple(jnp.asarray(m) for m in mats)
        sc = jnp.full((cout,), 1e-3, jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)

        def fwd(x, bi):
            return K.stem_psrp(x, mats, sc, bi, BY=BY, by_out=4, nph=nph)

        probe = lambda y: y[:, :1]
    elif kernel == "ct_up":
        H = W = 128
        cin, cout = 128, 64
        xp = jax.jit(lambda k: jax.random.randint(
            k, (BATCH, H, W, cin), -100, 100, jnp.int8
        ))(jax.random.PRNGKey(5))
        mats = tuple(jnp.asarray(m) for m in K.pack_ct_up_weights(
            rng.integers(-20, 20, (2, 2, cin, cout)).astype(np.int8)
        ))
        sc = jnp.full((cout,), 1e-3, jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)

        def fwd(x, bi):
            return K.ct_up_psrp(x, mats, sc, bi, tr=t)

        probe = lambda y: y[:, :1]
    elif kernel == "ct_psrp":
        G, W2 = 128, 128  # 256^2 by=2/nph=2 64ch -> 512^2 by=4/nph=4 32ch
        cin, cout = 64, 32
        xp = jax.jit(lambda k: jax.random.randint(
            k, (BATCH, G, 2, W2, 2 * cin), -100, 100, jnp.int8
        ))(jax.random.PRNGKey(5))
        mats = tuple(jnp.asarray(m) for m in K.pack_ct_psrp_weights(
            rng.integers(-20, 20, (2, 2, cin, cout)).astype(np.int8), 2
        ))
        sc = jnp.full((cout,), 1e-3, jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)

        def fwd(x, bi):
            return K.ct_psrp(x, mats, sc, bi, by_in=2, nph_in=2, tg=t)

        probe = lambda y: y[:, :1]
    elif kernel == "head":
        G, W2, by, nph, cin, nc = 128, 128, 4, 4, 32, 10
        xp = jax.jit(lambda k: jax.random.randint(
            k, (BATCH, G, nph, W2, by * cin), -100, 100, jnp.int8
        ))(jax.random.PRNGKey(5))
        w = rng.integers(-20, 20, (1, 1, cin, nc)).astype(np.int8)
        wp = jnp.asarray(K.pack_head_psrp_weights(w, by))
        sc = jnp.full((nc,), 1e-3, jnp.float32)
        b = jnp.zeros((nc,), jnp.float32)

        def fwd(x, bi):
            return K.head_argmax_psrp(x, wp, sc, bi, by=by, nph=nph, nc=nc,
                                      tg=t)

        probe = lambda y: y[:, :1]
    else:
        raise ValueError(kernel)

    @partial(jax.jit, static_argnums=2)
    def run(x, b0, iters):
        def body(c, _):
            # loop-dependence via a bias poke (tiny) — poking the input
            # costs a full-tensor copy per iteration on GB-sized inputs
            bi = jax.lax.dynamic_update_slice(
                b0, c.astype(jnp.float32)[None] * 1e-6, (0,)
            )
            y = fwd(x, bi)
            return c + jnp.sum(probe(y).astype(jnp.int32)), None

        tot, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return tot

    return xp, b, run


def measure(kernel, t):
    from common import scan_diff

    x, b0, run = make(kernel, t)
    per = scan_diff(lambda n: int(run(x, b0, n)), SHORT, LONG)
    print(f"{kernel}:t={t:<3d} {per*1e3:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    specs = sys.argv[1:] or [
        "stem:t=8", "ct_up:t=8", "ct_up:t=16", "ct_up:t=32",
        "ct_psrp:t=8", "ct_psrp:t=16", "head:t=8", "head:t=16",
    ]
    for s in specs:
        k, _, r = s.partition(":t=")
        try:
            measure(k, int(r) if r else 8)
        except Exception as e:
            print(f"{s} FAIL: {str(e).splitlines()[0][:140]}", flush=True)
