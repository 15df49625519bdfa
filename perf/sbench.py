"""Serving-path A/B: all-int8 XLA vs mixed-precision (bf16 shallow +
contiguous Pallas int8 deep region).

Scan-difference methodology (see abench.py). Usage:
    python perf/sbench.py [variant ...]
variants: int8 mixed-bf16-pallas mixed-bf16-xla mixed-int8-pallas
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("OCTSEG_BENCH_BATCH", "128"))
SIZE = 512
# secondary serving config (VERDICT r2 item 5): OCTSEG_BENCH_F=16
F = int(os.environ.get("OCTSEG_BENCH_F", "32"))
SHORT, LONG = 2, 22

VARIANTS = ("int8", "mixed-bf16-pallas", "mixed-bf16-xla",
            "mixed-int8-pallas", "packed", "psrp")


def build(variant):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        calibrate_unet,
        fold_unet_bn,
        quantize_unet,
        quantize_unet_mixed,
        unet_int8_forward,
        unet_mixed_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import UNet

    model = UNet(out_channels=10, init_features=F, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1), jnp.bfloat16)
    )
    layers = fold_unet_bn(variables)
    calib = np.random.default_rng(0).standard_normal(
        (2, SIZE, SIZE, 1)
    ).astype(np.float32)
    taps = calibrate_unet(layers, [calib])
    if variant == "int8":
        qp = quantize_unet(layers, taps)
        fwd = unet_int8_forward
    elif variant == "packed":
        from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.packed import (
            quantize_unet_packed,
            unet_packed_forward,
        )

        assert F == 32, "packed path assumes f=32"
        qp = quantize_unet_packed(layers, taps)
        fwd = None
    elif variant.startswith("psrp"):
        from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.psrp import (
            quantize_unet_psrp,
            unet_psrp_forward,
        )

        qp = quantize_unet_psrp(layers, taps, init_features=F)
        tg = int(variant.split(":tg=")[1]) if ":tg=" in variant else None
        fwd = partial(unet_psrp_forward, num_classes=10, tg=tg)
    else:
        qp = quantize_unet_mixed(layers, taps)
        _, shallow, deep = variant.split("-")
        fwd = partial(unet_mixed_forward, shallow=shallow, deep=deep)
    qp = jax.tree.map(jnp.asarray, qp)

    # inputs from an on-device pool generated OUTSIDE the timed loop (see
    # bench.py — in-loop threefry cost ~3 ms/batch, charged to every
    # variant but measuring the RNG, not the model)
    pool = jax.jit(lambda k: jax.random.bits(
        k, (4, BATCH, SIZE, SIZE, 1), jnp.uint16
    ))(jax.random.PRNGKey(11))

    @partial(jax.jit, static_argnums=2)
    def run(qp, pool, iters: int):
        def body(carry, it):
            x = jax.lax.dynamic_index_in_dim(
                pool, it % pool.shape[0], keepdims=False
            )
            x = (x.astype(jnp.float32) / 65536.0) - 0.5
            if variant == "packed":
                lab = unet_packed_forward(qp, x, 10)
            elif variant.startswith("psrp"):
                lab = fwd(qp, x)  # emits int8 labels directly
            else:
                lab = jnp.argmax(fwd(qp, x), axis=-1)
            return carry + jnp.sum(lab, dtype=jnp.int32), None

        total, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
        return total

    return qp, lambda qp_, key_, iters: run(qp_, pool, iters)


def measure(variant):
    from common import scan_diff

    qp, run = build(variant)
    key = jax.random.PRNGKey(1)
    per_batch = scan_diff(lambda n: int(run(qp, key, n)), SHORT, LONG)
    print(
        f"{variant:20s}: {per_batch*1e3:6.1f} ms/batch  "
        f"{BATCH/per_batch:7.0f} scans/s",
        flush=True,
    )
    if os.environ.get("OCTSEG_TRACE"):
        from trace_tools import capture, report

        report(
            capture(
                lambda: int(run(qp, jax.random.PRNGKey(9), 4)),
                f"/tmp/octseg_trace_{variant}",
            ),
            min_ms=1.0,
        )


if __name__ == "__main__":
    for v in sys.argv[1:] or VARIANTS:
        measure(v)
