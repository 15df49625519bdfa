"""MXU contraction-granularity probe: int8 matmul TOPs vs K (and N).

Decides the serving-kernel formulation question for round 4: if the int8
MXU contracts K in 256-element granules (the usual source of the 2x int8
rate), then a K=192 per-tap dot costs the same MXU time as a K=576 fused
dot (3 granules either way) and the PSRP tap lane-concat is pure VPU
overhead; if granularity is 128, the fused dot saves one pass and the
concat pays for itself.  Also probes N granularity and (optionally) int4.

Usage: python perf/kgran.py
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from common import scan_diff

M = 8192
SHORT, LONG = 40, 400
INNER = 128  # dots per kernel invocation to swamp dispatch


def probe(K, N, dtype=jnp.int8, label="", w_dtype=None):
    """w_dtype: mixed-precision dots (e.g. x int8 vs w int4 = 'w4a8') —
    decides whether the 772-TOPs int4 rate needs int4 activations too."""
    acc_t = jnp.float32 if dtype == jnp.bfloat16 else jnp.int32
    w_dtype = w_dtype or dtype

    def kernel(x_ref, w_ref, o_ref):
        acc = None
        for i in range(INNER):
            # per-dot weight slice: leading-dim index is an address offset
            # (no copy) and defeats CSE across the unrolled dots
            part = jax.lax.dot_general(
                x_ref[...], w_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )
            acc = part if acc is None else acc + part
        o_ref[...] = acc

    def gen(k, shape):
        if dtype == jnp.bfloat16:
            return jax.random.normal(k, shape, dtype)
        lim = 8 if dtype == jnp.int4 else 100
        # int4 can't cross the jit/device_put boundary on this backend:
        # keep host-visible arrays int8 and cast in-jit before the kernel
        return jax.random.randint(k, shape, -lim, lim, jnp.int8)

    x = jax.jit(lambda k: gen(k, (M, K)))(jax.random.PRNGKey(0))
    w = jax.jit(lambda k: gen(k, (INNER, K, N)))(jax.random.PRNGKey(1))

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), acc_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @partial(jax.jit, static_argnums=2)
    def run(x, w, iters: int):
        def body(c, i):
            xi = x + i.astype(x.dtype)
            if dtype == jnp.bfloat16:
                y = call(xi, w)
            else:
                y = call(
                    xi.astype(jnp.int4) if dtype == jnp.int4 else xi,
                    w.astype(jnp.int4) if w_dtype == jnp.int4 else w,
                )
            return c + y[0, 0].astype(jnp.float32), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return tot

    per = scan_diff(lambda n: float(run(x, w, n)), SHORT, LONG) / INNER
    tops = 2 * M * K * N / per / 1e12
    print(f"{label or dtype.__name__:8s} K={K:4d} N={N:4d}: "
          f"{per*1e6:8.2f} us/dot  {tops:7.1f} TOPs")
    return per, tops


def main():
    import sys
    print(f"M={M}, {INNER} dots/kernel, scan-diff {SHORT}/{LONG}")
    specs = sys.argv[1:] or ["384x64", "384x128", "128x64", "128x128",
                             "192x128", "576x128", "512x128", "1024x128"]
    for s in specs:
        k, _, n = s.partition("x")
        dt, wdt, lbl = jnp.int8, None, ""
        if n.endswith("w4a8"):
            n, wdt, lbl = n[:-4], jnp.int4, "w4a8"
        elif n.endswith("i4"):
            n, dt, lbl = n[:-2], jnp.int4, "int4"
        elif n.endswith("bf16"):
            n, dt, lbl = n[:-4], jnp.bfloat16, "bf16"
        probe(int(k), int(n), dt, lbl, w_dtype=wdt)


if __name__ == "__main__":
    main()
