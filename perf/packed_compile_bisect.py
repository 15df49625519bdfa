"""AOT-compile each packed kernel at serving shapes to find Mosaic crashes.

Compile-only (jit(...).lower(...).compile()), no execution — isolates which
kernel/shape trips the Mosaic vector-layout pass.

Usage: python perf/packed_compile_bisect.py [stage ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
    pack_weights,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_packed import (
    conv3x3_int8_packed,
    head_argmax_packed,
    pack_head_weights,
    pack_stem_weights,
    stem_conv3x3_int8_packed,
)

N = 8  # small batch; shapes per-stage match the 512^2 f=32 serving graph

# name: (kind, H, W, cins, cout, by)
STAGES = {
    "stem": ("stem", 512, 512, (1,), 32, 4),
    "e1b": ("conv", 512, 512, (32,), 32, 4),
    "e2a": ("conv", 256, 256, (32,), 64, 4),
    "e2b": ("conv", 256, 256, (64,), 64, 4),
    "d2c0": ("conv", 256, 256, (64, 64), 64, 4),
    "d2c1": ("conv", 256, 256, (64,), 64, 4),
    "d1c0": ("conv", 512, 512, (32, 32), 32, 4),
    "d1c1": ("conv", 512, 512, (32,), 32, 4),
    "head": ("head", 512, 512, (32,), 10, 4),
}


def compile_stage(name):
    kind, H, W, cins, cout, by = STAGES[name]
    rng = np.random.default_rng(0)
    try:
        if kind == "stem":
            BY = 32
            xp = jnp.zeros((N, H // BY, W, BY), jnp.int8)
            wq = rng.integers(-20, 20, (3, 3, 1, cout)).astype(np.int8)
            sc = jnp.ones(cout, jnp.float32)
            b = jnp.zeros(cout, jnp.float32)
            fn = lambda x: stem_conv3x3_int8_packed(
                x, jnp.asarray(pack_stem_weights(wq, BY)), sc, b,
                BY=BY, by_out=by)
            jax.jit(fn).lower(xp).compile()
        elif kind == "head":
            p = jnp.zeros((N, H // by, W, by * cins[0]), jnp.int8)
            wq = rng.integers(-20, 20, (1, 1, cins[0], cout)).astype(np.int8)
            fn = lambda x: head_argmax_packed(
                x, jnp.asarray(pack_head_weights(wq, by, 32)),
                jnp.ones(cout, jnp.float32), jnp.zeros(cout, jnp.float32),
                by=by, nc=cout)
            jax.jit(fn).lower(p).compile()
        else:
            cin_tot = sum(cins)
            ps = tuple(
                jnp.zeros((N, H // by, W, by * c), jnp.int8) for c in cins
            )
            wq = rng.integers(-20, 20, (3, 3, cin_tot, cout)).astype(np.int8)
            sc = jnp.ones(cout, jnp.float32)
            b = jnp.zeros(cout, jnp.float32)
            fn = lambda *xs: conv3x3_int8_packed(
                xs, jnp.asarray(pack_weights(wq, by)), sc, b,
                by=by, cins=cins)
            jax.jit(fn).lower(*ps).compile()
        print(f"{name:6s}: OK", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name:6s}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    for name in sys.argv[1:] or list(STAGES):
        compile_stage(name)
