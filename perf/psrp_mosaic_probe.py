"""Minimal Mosaic probes to bisect the conv3x3_psrp compile crash.

Each probe compiles (AOT, no run) one suspected construct at the 512^2
serving shape: 5-D blocks, middle-dim plane indexing, banded row assembly,
and wide lane-concats. Usage: python perf/psrp_mosaic_probe.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import traceback
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, G, NPH, W2, BY, CIN, COUT, TG = 2, 128, 4, 128, 4, 32, 32, 8
L = BY * CIN


def _call(kernel, out_l=L, n_w=0, kshape=None):
    in_specs = [
        pl.BlockSpec((1, 1, NPH, W2, L),
                     lambda n, s: (n, jnp.maximum(s * TG - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TG, NPH, W2, L), lambda n, s: (n, s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NPH, W2, L),
                     lambda n, s: (n, jnp.minimum((s + 1) * TG, G - 1),
                                   0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w
    x = jnp.zeros((N, G, NPH, W2, L), jnp.int8)
    ws = [jnp.zeros(kshape, jnp.int8)] * n_w if kshape else []

    def fn(x, *ws):
        return pl.pallas_call(
            kernel,
            grid=(N, G // TG),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, TG, NPH, W2, out_l),
                                   lambda n, s: (n, s, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, G, NPH, W2, out_l),
                                           jnp.int8),
        )(x, x, x, *ws)

    jax.jit(fn).lower(x, *ws).compile()


def p_identity():
    def kernel(t, b, bo, o):
        for phi in range(NPH):
            o[0, :, phi] = b[0, :, phi]

    _call(kernel)


def p_dot_per_phase():
    def kernel(t, b, bo, w, o):
        for phi in range(NPH):
            X = b[0, :, phi].reshape(TG * W2, L)
            y = jax.lax.dot_general(
                X, w[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o[0, :, phi] = jnp.clip(y, -127, 127).astype(jnp.int8).reshape(
                TG, W2, L)

    _call(kernel, n_w=1, kshape=(L, L))


def p_rows():
    # banded row assembly on plane 0 only, single tap, K=(BY+2)*CIN=192
    def kernel(t, b, bo, w, o):
        s = pl.program_id(1)
        ns = pl.num_programs(1)
        for phi in range(NPH):
            body = b[0, :, phi]
            top_last = jnp.where(s == 0, jnp.int8(0),
                                 t[0, 0, phi, :, (BY - 1) * CIN:])
            bot_first = jnp.where(s == ns - 1, jnp.int8(0),
                                  bo[0, 0, phi, :, :CIN])
            prev = jnp.concatenate(
                [top_last[None], body[:-1, :, (BY - 1) * CIN:]], axis=0)
            nxt = jnp.concatenate(
                [body[1:, :, :CIN], bot_first[None]], axis=0)
            grp = [prev] + [body[:, :, i * CIN:(i + 1) * CIN]
                            for i in range(BY)] + [nxt]
            X = jnp.concatenate(grp, axis=-1).reshape(TG * W2,
                                                      (BY + 2) * CIN)
            y = jax.lax.dot_general(
                X, w[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o[0, :, phi] = jnp.clip(y, -127, 127).astype(jnp.int8).reshape(
                TG, W2, L)

    _call(kernel, n_w=1, kshape=((BY + 2) * CIN, L))


def _groups(b, phi):
    """The 6 banded row-group pieces (TG, W2, CIN) of plane phi (no halo)."""
    body = b[0, :, phi]
    prev = jnp.concatenate(
        [jnp.zeros((1, W2, CIN), jnp.int8), body[:-1, :, (BY - 1) * CIN:]],
        axis=0)
    nxt = jnp.concatenate(
        [body[1:, :, :CIN], jnp.zeros((1, W2, CIN), jnp.int8)], axis=0)
    return [prev] + [body[:, :, i * CIN:(i + 1) * CIN]
                     for i in range(BY)] + [nxt]


def p_pad_shift():
    # W2 pad + shifted slices (per-tap dots, K=192, sublane offsets 0/1/2)
    def kernel(t, b, bo, w, o):
        for phi in range(NPH):
            padded = [jnp.pad(g, ((0, 0), (1, 1), (0, 0)))
                      for g in _groups(b, phi)]
            acc = None
            for ws in (0, -1, 1):
                X = jnp.concatenate(
                    [p[:, ws + 1: ws + 1 + W2] for p in padded],
                    axis=-1).reshape(TG * W2, (BY + 2) * CIN)
                y = jax.lax.dot_general(
                    X, w[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = y if acc is None else acc + y
            o[0, :, phi] = jnp.clip(acc, -127, 127).astype(
                jnp.int8).reshape(TG, W2, L)

    _call(kernel, n_w=1, kshape=((BY + 2) * CIN, L))


def p_concat576():
    # 18-piece lane concat K=576 single dot (the fused ws=0 group)
    def kernel(t, b, bo, w, o):
        for phi in range(NPH):
            pieces = []
            for rep in range(3):
                pieces += _groups(b, (phi + rep) % NPH)
            X = jnp.concatenate(pieces, axis=-1).reshape(
                TG * W2, 3 * (BY + 2) * CIN)
            y = jax.lax.dot_general(
                X, w[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o[0, :, phi] = jnp.clip(y, -127, 127).astype(jnp.int8).reshape(
                TG, W2, L)

    _call(kernel, n_w=1, kshape=(3 * (BY + 2) * CIN, L))


def p_epilogue():
    # fp32 scale/bias epilogue + int8 cast (matches the real kernel tail)
    def kernel(t, b, bo, w, o):
        for phi in range(NPH):
            X = b[0, :, phi].reshape(TG * W2, L)
            y = jax.lax.dot_general(
                X, w[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * 1e-3 + 0.5
            y = jnp.maximum(y, 0.0)
            o[0, :, phi] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(
                jnp.int8).reshape(TG, W2, L)

    _call(kernel, n_w=1, kshape=(L, L))


PROBES = {
    "identity": p_identity,
    "dot": p_dot_per_phase,
    "rows": p_rows,
    "pad_shift": p_pad_shift,
    "concat576": p_concat576,
    "epilogue": p_epilogue,
}

if __name__ == "__main__":
    for name in sys.argv[1:] or list(PROBES):
        try:
            PROBES[name]()
            print(f"{name:10s}: OK", flush=True)
        except Exception as e:
            msg = str(e).split("\n")
            print(f"{name:10s}: FAIL {type(e).__name__}: {msg[0][:160]}",
                  flush=True)
            if os.environ.get("VERBOSE"):
                traceback.print_exc()
