"""Mosaic int4 feasibility probes for the deep-stage w4a4 conv plan.

Questions (each measured on the real chip):
  1. Does an IN-KERNEL int8->int4 cast of the activation operand keep the
     772-TOPs int4 dot rate (kgran measured int4-in-memory operands)? The
     serving plan stores activations as int8 in HBM (values pre-clipped to
     [-7,7] by the producer's requant) and casts per-tap after patch
     assembly — int4 arrays never cross kernel boundaries.
  2. Does the producer's `clip(round(y), -7, 7)` epilogue still fuse into
     the saturating f32->s8 convert (the round-3 note says asymmetric
     bounds break the pattern; +-7 is symmetric but not +-127)?
  3. Rate vs K at the deep-conv contraction depths (128/256/512).

Usage: python perf/int4probe.py
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
INNER = 64  # remote (tunnel-side) compile time scales with the unroll


def probe_dot(K, N, mode, label):
    """mode: 'i8' (int8 dot), 'i4mem' (int4 operands from memory),
    'i4cast' (int8 operands, in-kernel cast to int4)."""

    def kernel(x_ref, w_ref, o_ref):
        acc = None
        x = x_ref[...]
        if mode == "i4cast":
            x = x.astype(jnp.int4)
        for i in range(INNER):
            w = w_ref[i]
            if mode == "i4cast":
                w = w.astype(jnp.int4)
            part = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = part if acc is None else acc + part
        o_ref[...] = acc

    x = jax.jit(lambda k: jax.random.randint(k, (M, K), -7, 8, jnp.int8))(
        jax.random.PRNGKey(0)
    )
    w = jax.jit(
        lambda k: jax.random.randint(k, (INNER, K, N), -7, 8, jnp.int8)
    )(jax.random.PRNGKey(1))

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @partial(jax.jit, static_argnums=2)
    def run(x, w, iters: int):
        def body(c, i):
            xi = jnp.clip(x + i.astype(x.dtype), -7, 7)
            if mode == "i4mem":
                y = call(xi.astype(jnp.int4), w.astype(jnp.int4))
            else:
                y = call(xi, w)
            return c + y[0, 0].astype(jnp.float32), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return tot

    try:
        per = scan_diff(lambda n: float(run(x, w, n)), SHORT, LONG) / INNER
    except Exception as e:
        print(f"{label:10s} K={K:4d} N={N:4d}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}")
        return
    tops = 2 * M * K * N / per / 1e12
    print(f"{label:10s} K={K:4d} N={N:4d}: {per*1e6:8.2f} us/dot "
          f"{tops:7.1f} TOPs")


def probe_clip7():
    """Epilogue cost: clip +-127 vs +-7 on a requant chain (VPU-bound)."""
    N = 8192

    def make(bound):
        def kernel(a_ref, s_ref, o_ref):
            y = a_ref[...].astype(jnp.float32) * s_ref[0] + 0.5
            y = jnp.maximum(y, 0.0)
            o_ref[...] = jnp.clip(jnp.round(y), -bound, bound).astype(
                jnp.int8
            )

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 512), jnp.int8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    a = jax.jit(
        lambda k: jax.random.randint(k, (N, 512), -1000, 1000, jnp.int32)
    )(jax.random.PRNGKey(0))
    s = jnp.full((1, 512), 0.07, jnp.float32)
    for bound in (127.0, 7.0):
        call = make(bound)

        @partial(jax.jit, static_argnums=1)
        def run(a, iters: int, call=call):
            def body(c, i):
                y = call(a + i, s)
                return c + y[0, 0].astype(jnp.float32), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return tot

        per = scan_diff(lambda n: float(run(a, n)), 100, 1000)
        print(f"requant clip +-{int(bound):3d}: {per*1e6:8.2f} us "
              f"({a.size / per / 1e9:.1f} Gelem/s)")


def main():
    # kgran.py already measured i8 371 / i4-from-memory 726 TOPs at K=512
    # and w4a8 = Mosaic NYI; the open questions are (1) whether an
    # IN-KERNEL int8->int4 cast keeps the int4 rate and (2) the clip +-7
    # requant epilogue. Each jit compile costs ~45 s over the tunnel, so
    # probe only those (plus one i8 sanity point).
    print(f"M={M}, {INNER} dots/kernel", flush=True)
    probe_dot(512, 128, "i8", "int8")
    probe_dot(512, 128, "i4cast", "int4-cast")
    probe_dot(128, 128, "i4cast", "int4-cast")
    probe_clip7()


if __name__ == "__main__":
    main()
