"""Throughput benchmark: U-Net 512x512 B-scan inference on one chip.

North star (BASELINE.json): >=5000 512x512 B-scans/sec/chip U-Net inference
on TPU v5e. Prints ONE JSON line.

Serving path: the phase-split row-packed (PSRP) full-Pallas int8 graph
(inference/psrp.py) — BN folded, per-channel int8 weights, int8
activations end-to-end, W-phases as explicit major dims so transpose
convs/pools/concats need no relayout copies, per-stage swept VMEM tiles.
Accuracy contract: >=99.5% on-chip argmax agreement vs the all-XLA int8
graph and >=95% vs fp32 on a trained checkpoint (perf/psrp_accuracy.py;
interpret-mode parity in tests/test_psrp_forward.py). Ladder: exact bf16
1228 -> all-XLA int8 1563 -> PSRP 1935 scans/s (docs/PERF.md).

Methodology: the whole measurement runs *on device* as a single dispatch —
``lax.scan`` over N batches of on-device-generated inputs, reduced to one
scalar — and synchronizes via host fetch, because over the tunneled backend
``block_until_ready`` is a no-op and per-dispatch RTT (~30 ms) would
otherwise dominate. Per-batch time is differenced between a long and a short
scan to cancel the fixed dispatch cost.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import os

BASELINE_SCANS_PER_SEC = 5000.0
# A/B'd in perf/abench.py (early XLA graph): 32->417, 64->686, 128->1143,
# 256->1161; re-swept on the PSRP graph late round 3 (OCTSEG_BENCH_BATCH).
BATCH = int(os.environ.get("OCTSEG_BENCH_BATCH", "128"))
# secondary compressed config (f=16): 3378 scans/s int8 (round 3); the
# headline stays f=32 = the reference U-Net default (YNet_2022.py:511)
FEATURES = int(os.environ.get("OCTSEG_BENCH_F", "32"))
SIZE = 512
NUM_CLASSES = 10


def _build():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.psrp import (
        quantize_unet_psrp,
        unet_psrp_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        calibrate_unet,
        fold_unet_bn,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import UNet

    model = UNet(out_channels=NUM_CLASSES, init_features=FEATURES,
                 dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.zeros((1, SIZE, SIZE, 1), jnp.bfloat16))
    layers = fold_unet_bn(variables)
    calib = np.random.default_rng(0).standard_normal(
        (2, SIZE, SIZE, 1)
    ).astype(np.float32)
    qparams = jax.tree.map(
        jnp.asarray,
        quantize_unet_psrp(
            layers, calibrate_unet(layers, [calib]),
            init_features=FEATURES,
            deep_int4=bool(os.environ.get("OCTSEG_PSRP_INT4")),
        ),
    )

    # Input pool generated on device ONCE, outside the timed region: in
    # serving, inputs arrive over DMA — synthesizing them per batch with
    # counter-based threefry inside the loop cost ~3 ms/batch (round-3
    # trace, clamp_convert_fusion), charged identically to every variant
    # but measuring the RNG, not the model.
    pool = jax.jit(lambda k: jax.random.bits(
        k, (4, BATCH, SIZE, SIZE, 1), jnp.uint16
    ))(jax.random.PRNGKey(1))

    @partial(jax.jit, static_argnums=2)
    def run(qparams, pool, iters: int):
        def body(carry, it):
            x = jax.lax.dynamic_index_in_dim(
                pool, it % pool.shape[0], keepdims=False
            )
            x = (x.astype(jnp.float32) / 65536.0) - 0.5
            if os.environ.get("OCTSEG_BENCH_PREPROC"):
                # ingest->mask variant: fused per-scan z-score normalize
                # ahead of inference, per the north-star pipeline phrasing
                # (BASELINE.json). Measured cost recorded in docs/PERF.md.
                from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.preprocess import (
                    zscore,
                )

                x = zscore(x)
            lab = unet_psrp_forward(qparams, x, NUM_CLASSES)
            return carry + jnp.sum(lab, dtype=jnp.int32), None

        total, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
        return total

    return qparams, lambda qp_, key_, iters: run(qp_, pool, iters)


def _psrp_agreement(psrp_params) -> float:
    """On-chip argmax agreement of the PSRP graph vs the all-XLA int8 graph
    on one batch (same fold/calibration). Guards the headline: a Mosaic
    regression that miscompiles a kernel now fails the bench into the
    fallback metric instead of shipping a fast-but-wrong number."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.psrp import (
        unet_psrp_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        unet_int8_forward,
    )

    int8_params, _ = _build_int8_fallback()
    x = jax.jit(lambda k: jax.random.normal(
        k, (8, SIZE, SIZE, 1), jnp.float32
    ))(jax.random.PRNGKey(7))
    lab_p = jax.jit(
        lambda qp, x: unet_psrp_forward(qp, x, NUM_CLASSES)
    )(psrp_params, x)
    lab_i = jax.jit(
        lambda qp, x: jnp.argmax(unet_int8_forward(qp, x), -1).astype(jnp.int8)
    )(int8_params, x)
    return float(jnp.mean((lab_p == lab_i).astype(jnp.float32)))


def _time(run, params, iters):
    key = jax.random.PRNGKey(1)
    int(run(params, key, iters))  # compile + settle (host-fetch sync)
    best = float("inf")
    for i in range(3):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        int(run(params, k, iters))
        best = min(best, time.perf_counter() - t0)
    return best


def _build_int8_fallback():
    """All-XLA int8 graph — used only if the Pallas PSRP path fails on this
    chip/toolchain (e.g. a Mosaic compile regression), so the bench always
    records an honest number under a distinct metric name."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        calibrate_unet,
        fold_unet_bn,
        quantize_unet,
        unet_int8_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import UNet

    model = UNet(out_channels=NUM_CLASSES, init_features=FEATURES,
                 dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1), jnp.bfloat16)
    )
    layers = fold_unet_bn(variables)
    calib = np.random.default_rng(0).standard_normal(
        (2, SIZE, SIZE, 1)
    ).astype(np.float32)
    qparams = jax.tree.map(
        jnp.asarray, quantize_unet(layers, calibrate_unet(layers, [calib]))
    )
    pool = jax.jit(lambda k: jax.random.bits(
        k, (4, BATCH, SIZE, SIZE, 1), jnp.uint16
    ))(jax.random.PRNGKey(1))

    @partial(jax.jit, static_argnums=2)
    def run(qparams, pool, iters: int):
        def body(carry, it):
            x = jax.lax.dynamic_index_in_dim(
                pool, it % pool.shape[0], keepdims=False
            )
            x = (x.astype(jnp.float32) / 65536.0) - 0.5
            lab = jnp.argmax(unet_int8_forward(qparams, x), -1)
            return carry + jnp.sum(lab, dtype=jnp.int32), None

        total, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
        return total

    return qparams, lambda qp_, key_, iters: run(qp_, pool, iters)


def main():
    import sys

    metric = "unet_512x512_infer_int8_psrp"
    if os.environ.get("OCTSEG_PSRP_INT4"):
        metric = "unet_512x512_infer_int4deep_psrp"
    if FEATURES != 32:
        metric += f"_f{FEATURES}"
    if os.environ.get("OCTSEG_BENCH_PREPROC"):
        metric += "_pipeline"
    try:
        params, run = _build()
        agree = _psrp_agreement(params)
        if agree < 0.99:  # suite-enforced on-chip numerics contract
            raise RuntimeError(
                f"PSRP argmax agreement vs all-XLA int8 = {agree:.4f} < 0.99"
            )
        print(f"PSRP vs int8 argmax agreement: {agree:.4f}", file=sys.stderr)
        t_short = _time(run, params, 2)
    except Exception as e:  # Pallas/Mosaic failure -> honest XLA fallback
        print(f"PSRP path failed ({e!r}); falling back to all-XLA int8",
              file=sys.stderr)
        metric = "unet_512x512_infer_int8_xla_fallback"
        params, run = _build_int8_fallback()
        t_short = _time(run, params, 2)
    t_long = _time(run, params, 22)
    per_batch = (t_long - t_short) / 20.0
    scans_per_sec = BATCH / per_batch
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(scans_per_sec, 2),
                "unit": "B-scans/sec/chip",
                "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
