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
SHORT, LONG = 2, 10
INNER = 32  # dots per kernel invocation to swamp dispatch


def probe(K, N, dtype=jnp.int8, label=""):
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32

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
        if dtype == jnp.int8:
            return jax.random.randint(k, shape, -100, 100, jnp.int8)
        return jax.random.normal(k, shape, dtype)

    x = jax.jit(lambda k: gen(k, (M, K)))(jax.random.PRNGKey(0))
    w = jax.jit(lambda k: gen(k, (INNER, K, N)))(jax.random.PRNGKey(1))

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), acc_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @partial(jax.jit, static_argnums=1)
    def run(x, iters: int):
        def body(c, i):
            y = call(x + i.astype(dtype), w)
            return c + y[0, 0].astype(jnp.float32), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return tot

    per = scan_diff(lambda n: float(run(x, n)), SHORT, LONG) / INNER
    tops = 2 * M * K * N / per / 1e12
    print(f"{label or dtype.__name__:8s} K={K:4d} N={N:4d}: "
          f"{per*1e6:8.2f} us/dot  {tops:7.1f} TOPs")
    return per, tops


def main():
    print(f"M={M}, {INNER} dots/kernel, scan-diff {SHORT}/{LONG}")
    for K in (128, 192, 256, 384, 512, 576, 768, 1024):
        probe(K, 128)
    print("-- N granularity --")
    for N in (32, 64, 128, 256):
        probe(512, N)
    print("-- bf16 reference --")
    for K in (128, 256, 512):
        probe(K, 128, jnp.bfloat16, "bf16")


if __name__ == "__main__":
    main()
