"""Per-group int4 WEIGHT attribution on the trained checkpoint (on-chip).

Which stages' 4-bit weights cost the w4a4 graph its trained argmax
agreement? Evaluates the full w4a4 graph with one stage GROUP's weights
held at int8 (``quantize_unet_psrp(int4_w8_stages=...)`` — their dots run
int8 on the 4-bit activations) and reports agreement vs the all-XLA int8
oracle. Uses the checkpoint cached by perf/psrp_accuracy.py
(OCTSEG_ACC_CKPT, default /tmp/psrp_acc_ckpt.npz) — run that first.

Usage: python perf/int4_stage_attrib.py
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 512
NC = 10

GROUPS = {
    "none (full w4a4)": (),
    "deep-cats w8": ("blk5_conv0", "blk6_conv0"),
    "deep-singles w8": ("blk2_conv0", "blk2_conv1", "blk3_conv0",
                        "blk3_conv1", "blk4_conv0", "blk4_conv1",
                        "blk5_conv1", "blk6_conv1"),
    "cts w8": ("ct0", "ct1"),
    "mids w8": ("blk1_conv0", "blk1_conv1", "blk7_conv1"),
}


def main():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.psrp import (
        quantize_unet_psrp,
        unet_psrp_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        calibrate_unet,
        fold_unet_bn,
        quantize_unet,
        unet_int8_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
        SyntheticOCTConfig,
        synth_batch,
    )

    ckpt = os.environ.get("OCTSEG_ACC_CKPT", "/tmp/psrp_acc_ckpt.npz")
    with open(ckpt, "rb") as fh:
        blob = pickle.load(fh)
    params = jax.tree.map(jnp.asarray, blob["params"])
    stats = jax.tree.map(jnp.asarray, blob["stats"])
    print(f"loaded {blob['steps']}-step checkpoint {ckpt}", flush=True)

    cfg = SyntheticOCTConfig(height=SIZE, width=SIZE, seed=5)
    layers = fold_unet_bn({"params": params, "batch_stats": stats})
    xc, _ = synth_batch(jax.random.PRNGKey(99), 4, cfg)
    taps = calibrate_unet(layers, [np.asarray(xc, np.float32)])

    xt, yt = synth_batch(jax.random.PRNGKey(123), 8, cfg)
    yt = np.asarray(yt)
    qp_int8 = jax.tree.map(jnp.asarray, quantize_unet(layers, taps, False))
    lab_int8 = np.asarray(jnp.argmax(unet_int8_forward(qp_int8, xt), -1))

    for label, w8 in GROUPS.items():
        qp = jax.tree.map(
            jnp.asarray,
            quantize_unet_psrp(layers, taps, deep_int4=True,
                               int4_w8_stages=w8),
        )
        lab = np.asarray(unet_psrp_forward(qp, xt, NC))
        print(f"{label:22s}: agreement vs int8 "
              f"{float((lab == lab_int8).mean()):.4%}  "
              f"pixel acc {float((lab == yt).mean()):.4%}", flush=True)


if __name__ == "__main__":
    main()
