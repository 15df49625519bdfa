"""Pallas int8 conv kernel probe at the serving U-Net's stage shapes.

Prints achieved TFLOPs per stage (useful FLOPs only — the by-blocking's
banded zeros are not counted). Scan-difference methodology (see abench.py);
the per-iter scale nudge defeats loop-invariant hoisting of the pallas_call
out of the scan; Pallas calls are opaque to XLA so slicing the output is a
safe consumption.

Usage: python perf/kbench.py [stage ...]   (default: all stages)
       python perf/kbench.py e1b:th=32     (override tile rows)
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

# name: (H, W, cin, cout, by, th) at batch 128 for the f=32 512x512 U-Net.
STAGES = {
    "e1b": (512, 512, 32, 32, 4, 16),
    "d1c0": (512, 512, 64, 32, 4, 16),
    "e2a": (256, 256, 32, 64, 2, 16),
    "e2b": (256, 256, 64, 64, 2, 16),
    "d2c0": (256, 256, 128, 64, 2, 16),
    "e3a": (128, 128, 64, 128, 1, 16),
    "e3b": (128, 128, 128, 128, 1, 16),
    "d3c0": (128, 128, 256, 128, 1, 16),
    "e4a": (64, 64, 128, 256, 1, 16),
    "e4b": (64, 64, 256, 256, 1, 16),
    "d4c0": (64, 64, 512, 256, 1, 16),
    "ba": (32, 32, 256, 512, 1, 32),
    "bb": (32, 32, 512, 512, 1, 32),
}


def probe(name, H, W, cin, cout, by, th, per_tap=False, fresh=False,
          xla=False, chain=False):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        conv3x3_int8,
        pack_weights,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-100, 100, (BATCH, H, W, cin)), jnp.int8)
    w_dense = rng.integers(-20, 20, (3, 3, cin, cout)).astype(np.int8)
    wp = jnp.asarray(pack_weights(w_dense, by))
    wd = jnp.asarray(w_dense)
    scale = jnp.full((cout,), 1e-3, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    def one_conv(xi, sc):
        if xla:
            acc = jax.lax.conv_general_dilated(
                xi, wd, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            yf = acc.astype(jnp.float32) * sc + bias
            return jnp.clip(jnp.round(jnp.maximum(yf, 0.0)), -127.0,
                            127.0).astype(jnp.int8)
        return conv3x3_int8(xi, wp, sc, bias, by=by, th=th,
                            force_per_tap=per_tap)

    @partial(jax.jit, static_argnums=(1,))
    def run_chain(x, iters: int):
        # Serial conv chain (cin == cout required): output feeds the next
        # input, so per-call glue (halo slices, layout copies, reshapes)
        # cannot be hoisted — matches the e2e serving graph's data flow.
        def body(xc, i):
            y = one_conv(xc, scale + i.astype(jnp.float32) * 1e-12)
            return y, None
        y, _ = jax.lax.scan(body, x, jnp.arange(iters))
        return y[0, 0, 0, 0].astype(jnp.int32)

    @partial(jax.jit, static_argnums=(2,))
    def run(x, wp, iters: int):
        def body(c, i):
            sc = scale + i.astype(jnp.float32) * 1e-12
            if fresh:
                # Regenerate the input per iteration (like the e2e serving
                # graph) so input-side glue (halo slices, layout copies)
                # cannot be hoisted out of the loop as invariants.
                xi = jax.random.randint(
                    jax.random.fold_in(jax.random.PRNGKey(0), i),
                    (BATCH, H, W, cin), -100, 100, jnp.int8)
            else:
                xi = x
            y = one_conv(xi, sc)
            return c + y[0, 0, 0, 0].astype(jnp.int32), None

        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
        return tot

    from common import scan_diff

    go = (lambda n: int(run_chain(x, n))) if chain else (
        lambda n: int(run(x, wp, n)))
    per_iter = scan_diff(go, SHORT, LONG)
    flops = 2 * BATCH * H * W * 9 * cin * cout
    tags = ("pt" if per_tap else "") + ("F" if fresh else "") + (
        "X" if xla else "") + ("C" if chain else "")
    print(
        f"{name:5s} {H:3d}x{W:3d} {cin:3d}->{cout:3d} by={by} th={th}"
        f" {tags:3s}: "
        f"{per_iter*1e3:7.2f} ms  {flops/per_iter/1e12:6.1f} TFLOPs",
        flush=True,
    )


if __name__ == "__main__":
    args = sys.argv[1:] or list(STAGES)
    for a in args:
        name, _, ov = a.partition(":")
        H, W, cin, cout, by, th = STAGES[name]
        per_tap = fresh = xla = chain = False
        for o in ov.split(","):
            if o.startswith("th="):
                th = int(o[3:])
            elif o == "pt":
                per_tap = True
            elif o == "fresh":
                fresh = True
            elif o == "chain":
                chain = True
            elif o == "xla":
                xla = True
            elif o.startswith("by="):
                by = int(o[3:])
        probe(name, H, W, cin, cout, by, th, per_tap, fresh, xla, chain)
