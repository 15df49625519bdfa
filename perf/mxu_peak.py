"""Empirical MXU peak: large square int8 / bf16 dots (calibrates SOL
estimates in docs/PERF.md)."""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from common import scan_diff

M = K = N = 4096


def main():
    a8 = jax.random.randint(jax.random.PRNGKey(0), (M, K), -100, 100,
                            jnp.int8)
    b8 = jax.random.randint(jax.random.PRNGKey(1), (K, N), -100, 100,
                            jnp.int8)

    for name, a, b, acc in (
        ("int8", a8, b8, jnp.int32),
        ("bf16", a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16),
         jnp.float32),
    ):
        @partial(jax.jit, static_argnums=(2,))
        def run(a, b, iters: int):
            def body(c, i):
                y = jax.lax.dot_general(
                    a + i.astype(a.dtype), b, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc,
                )
                # max: not algebraically reducible -> the full GEMM runs
                return c + jnp.max(y).astype(jnp.float32), None

            t, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(iters, dtype=jnp.int32))
            return t

        per = scan_diff(lambda it: float(run(a, b, it)), 4, 64)
        print(f"{name} {M}x{K}x{N} dot: {per*1e3:.3f} ms = "
              f"{2*M*K*N/per/1e12:.0f} T{'OPs' if name=='int8' else 'FLOPs'}",
              flush=True)


if __name__ == "__main__":
    main()
