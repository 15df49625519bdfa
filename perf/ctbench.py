"""Deep transpose-conv (ct2x2) kernel-variant probe.

Variants of the W-interleave for (N,H,W,cin) -> (N,2H,2W,cout):
  stack   - in-kernel jnp.stack+reshape interleave (ops/pallas_conv_int8)
  repeat  - in-kernel pltpu.repeat + parity select
  lanes   - kernel emits lanes (dx,co) 4-D (N,2H,W,2*cout); XLA reshape after
Usage: python perf/ctbench.py [variant[:tr=N] ...]   (default: all, tr=8)
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH = 128
# ct1 config (the bigger one): 64^2 x 256 -> 128^2 x 128
H = W = 64
CIN, COUT = 256, 128
SHORT, LONG = 2, 12


def _dots(X, ws, scale, bias, tr, cout):
    out = []
    for dy in range(2):
        zs = []
        for dx in range(2):
            acc = jax.lax.dot_general(
                X, ws[2 * dy + dx][...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * scale[0] + bias[0]
            zs.append(jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8))
        out.append(zs)
    return out


def make(variant, tr):
    def k_stack(x_ref, w0, w1, w2, w3, s_ref, b_ref, o_ref):
        X = x_ref[0].reshape(tr * W, CIN)
        zs = _dots(X, (w0, w1, w2, w3), s_ref, b_ref, tr, COUT)
        rows = [
            jnp.stack([z.reshape(tr, W, COUT) for z in zs[dy]],
                      axis=2).reshape(tr, 2 * W, COUT)
            for dy in range(2)
        ]
        o_ref[0] = jnp.stack(rows, axis=1).reshape(2 * tr, 2 * W, COUT)

    def k_repeat(x_ref, w0, w1, w2, w3, s_ref, b_ref, o_ref):
        X = x_ref[0].reshape(tr * W, CIN)
        zs = _dots(X, (w0, w1, w2, w3), s_ref, b_ref, tr, COUT)
        par = jax.lax.broadcasted_iota(jnp.int32, (tr, 2 * W, COUT), 1) % 2
        rows = []
        for dy in range(2):
            a = pltpu.repeat(zs[dy][0].reshape(tr, W, COUT), 2, 1)
            b = pltpu.repeat(zs[dy][1].reshape(tr, W, COUT), 2, 1)
            rows.append(jnp.where(par == 0, a, b))
        o_ref[0] = jnp.stack(rows, axis=1).reshape(2 * tr, 2 * W, COUT)

    def k_lanes(x_ref, w01, w23, s_ref, b_ref, o_ref):
        # w01/w23: (CIN, 2*COUT) with lanes (dx, co)
        X = x_ref[0].reshape(tr * W, CIN)
        for dy, wref in ((0, w01), (1, w23)):
            acc = jax.lax.dot_general(
                X, wref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * s_ref[0] + b_ref[0]
            y8 = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
            o_ref[0, :, dy] = y8.reshape(tr, W, 2 * COUT)

    rng = np.random.default_rng(0)
    x = jax.jit(lambda k: jax.random.randint(
        k, (BATCH, H, W, CIN), -100, 100, jnp.int8
    ))(jax.random.PRNGKey(3))
    w = rng.integers(-20, 20, (2, 2, CIN, COUT)).astype(np.int8)
    scale = jnp.full((COUT,), 1e-3, jnp.float32)[None]
    bias = jnp.zeros((COUT,), jnp.float32)[None]

    if variant in ("stack", "repeat"):
        kern = k_stack if variant == "stack" else k_repeat
        mats = [jnp.asarray(np.ascontiguousarray(w[dy, dx]))
                for dy in range(2) for dx in range(2)]
        call = pl.pallas_call(
            kern,
            grid=(BATCH, H // tr),
            in_specs=[pl.BlockSpec((1, tr, W, CIN), lambda n, s: (n, s, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec((1, 2 * tr, 2 * W, COUT),
                                   lambda n, s: (n, s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BATCH, 2 * H, 2 * W, COUT),
                                           jnp.int8),
        )

        def fwd(x):
            return call(x, *mats, jnp.tile(scale, 1), bias)
    else:
        mats = [
            jnp.asarray(np.concatenate([w[dy, 0], w[dy, 1]], axis=-1))
            for dy in range(2)
        ]
        scale2 = jnp.tile(scale, (1, 2))
        bias2 = jnp.tile(bias, (1, 2))
        call = pl.pallas_call(
            k_lanes,
            grid=(BATCH, H // tr),
            in_specs=[pl.BlockSpec((1, tr, W, CIN), lambda n, s: (n, s, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec((1, tr, 2, W, 2 * COUT),
                                   lambda n, s: (n, s, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BATCH, H, 2, W, 2 * COUT),
                                           jnp.int8),
        )

        def fwd(x):
            y = call(x, *mats, scale2, bias2)  # (N, H, 2, W, 2*COUT)
            return y.reshape(BATCH, 2 * H, W, 2, COUT).reshape(
                BATCH, 2 * H, 2 * W, COUT
            )

    @partial(jax.jit, static_argnums=1)
    def run(x, iters):
        def body(c, _):
            # carry-dependent single-element poke defeats loop hoisting
            xi = jax.lax.dynamic_update_slice(
                x, c.astype(jnp.int8)[None, None, None, None], (0, 0, 0, 0)
            )
            y = fwd(xi)
            return c + jnp.sum(y[:, ::64, ::64, 0], dtype=jnp.int32), None
        tot, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return tot

    return x, run


def measure(variant, tr):
    from common import scan_diff

    x, run = make(variant, tr)
    per = scan_diff(lambda n: int(run(x, n)), SHORT, LONG)
    print(f"{variant}:tr={tr:<3d} {per*1e3:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    specs = sys.argv[1:] or ["stack:tr=8", "stack:tr=16", "repeat:tr=8",
                             "lanes:tr=8", "lanes:tr=16"]
    for s in specs:
        v, _, rest = s.partition(":tr=")
        try:
            measure(v, int(rest) if rest else 8)
        except Exception as e:
            print(f"{s} FAIL: {str(e).splitlines()[0][:140]}", flush=True)
