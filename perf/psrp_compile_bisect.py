"""AOT-compile each PSRP kernel at serving shapes to find Mosaic crashes.

Compile-only (jit(...).lower(...).compile()), no execution — isolates which
kernel/shape trips the Mosaic vector-layout pass.

Usage: python perf/psrp_compile_bisect.py [stage ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
    conv3x3_psrp,
    ct_psrp,
    ct_up_psrp,
    head_argmax_psrp,
    pack_ct_psrp_weights,
    pack_ct_up_weights,
    pack_head_psrp_weights,
    pack_psrp_weights,
    pack_stem_psrp_weights,
    stem_psrp,
)

N = 8  # small batch; per-stage shapes match the 512^2 f=32 serving graph

# name: (kind, H, W, by, nph, cins, cout, pool)
STAGES = {
    "stem": ("stem", 512, 512, 4, 4, (1,), 32, False),
    "e1b": ("conv", 512, 512, 4, 4, (32,), 32, True),
    "e2a": ("conv", 256, 256, 2, 2, (32,), 64, False),
    "e2b": ("conv", 256, 256, 2, 2, (64,), 64, True),
    "ct2": ("ct_up", 128, 128, 2, 2, (128,), 64, False),
    "d2c0": ("conv", 256, 256, 2, 2, (64, 64), 64, False),
    "d2c1": ("conv", 256, 256, 2, 2, (64,), 64, False),
    "ct3": ("ct", 256, 256, 2, 2, (64,), 32, False),
    "d1c0": ("conv", 512, 512, 4, 4, (32, 32), 32, False),
    "d1c1": ("conv", 512, 512, 4, 4, (32,), 32, False),
    "head": ("head", 512, 512, 4, 4, (32,), 10, False),
}


def compile_stage(name, tg=8):
    kind, H, W, by, nph, cins, cout, pool = STAGES[name]
    rng = np.random.default_rng(0)
    try:
        if kind == "stem":
            BY = 32
            xp = jnp.zeros((N, H // BY, nph, W // nph, BY), jnp.int8)
            wq = rng.integers(-20, 20, (3, 3, 1, cout)).astype(np.int8)
            mats, _ = pack_stem_psrp_weights(wq, BY, nph)
            fn = lambda x: stem_psrp(
                x, tuple(jnp.asarray(m) for m in mats),
                jnp.ones(cout, jnp.float32), jnp.zeros(cout, jnp.float32),
                BY=BY, by_out=by, nph=nph)
            jax.jit(fn).lower(xp).compile()
        elif kind == "head":
            p = jnp.zeros((N, H // by, nph, W // nph, by * cins[0]),
                          jnp.int8)
            wq = rng.integers(-20, 20, (1, 1, cins[0], cout)).astype(np.int8)
            fn = lambda x: head_argmax_psrp(
                x, jnp.asarray(pack_head_psrp_weights(wq, by, 16)),
                np.ones(cout, np.float32), np.zeros(cout, np.float32),
                by=by, nph=nph, nc=cout, tg=tg)
            jax.jit(fn).lower(p).compile()
        elif kind == "ct_up":
            x = jnp.zeros((N, H, W, cins[0]), jnp.int8)
            wq = rng.integers(-20, 20, (2, 2, cins[0], cout)).astype(np.int8)
            mats = pack_ct_up_weights(wq)
            fn = lambda x: ct_up_psrp(
                x, tuple(jnp.asarray(m) for m in mats),
                jnp.ones(cout, jnp.float32), jnp.zeros(cout, jnp.float32),
                tr=tg)
            jax.jit(fn).lower(x).compile()
        elif kind == "ct":
            p = jnp.zeros((N, H // by, nph, W // nph, by * cins[0]),
                          jnp.int8)
            wq = rng.integers(-20, 20, (2, 2, cins[0], cout)).astype(np.int8)
            mats = pack_ct_psrp_weights(wq, by_in=by)
            fn = lambda x: ct_psrp(
                x, tuple(jnp.asarray(m) for m in mats),
                jnp.ones(cout, jnp.float32), jnp.zeros(cout, jnp.float32),
                by_in=by, nph_in=nph, tg=tg)
            jax.jit(fn).lower(p).compile()
        else:
            cin_tot = sum(cins)
            ps = tuple(
                jnp.zeros((N, H // by, nph, W // nph, by * c), jnp.int8)
                for c in cins
            )
            wq = rng.integers(-20, 20, (3, 3, cin_tot, cout)).astype(np.int8)
            mats, _ = pack_psrp_weights(wq, by, nph, cins=cins)
            fn = lambda *xs: conv3x3_psrp(
                xs, tuple(jnp.asarray(m) for m in mats),
                jnp.ones(cout, jnp.float32), jnp.zeros(cout, jnp.float32),
                by=by, nph=nph, cins=cins, tg=tg, pool=pool)
            jax.jit(fn).lower(*ps).compile()
        print(f"{name:6s}: OK", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name:6s}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    for name in sys.argv[1:] or list(STAGES):
        compile_stage(name)
