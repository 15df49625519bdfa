"""ReLayNet 512x512 int8 serving throughput (second PTQ model).

Same on-device lax.scan methodology as bench.py. ReLayNet is ~2.7x the
U-Net's conv work at 512^2 (single 7x3 conv blocks but 64 channels at
full resolution on both ends) — expect a proportionally lower ceiling.
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("OCTSEG_BENCH_BATCH", "32"))
SIZE = 512
NC = 10


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "xla"
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.relaynet_int8 import (
        calibrate_relaynet,
        fold_relaynet_bn,
        quantize_relaynet,
        relaynet_int8_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.relaynet_psrp import (
        quantize_relaynet_psrp,
        relaynet_psrp_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.relaynet import (
        ReLayNet,
    )

    model = ReLayNet(num_classes=NC)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1)),
                   train=True)
    layers = fold_relaynet_bn(v)
    calib = np.random.default_rng(0).standard_normal(
        (2, SIZE, SIZE, 1)).astype(np.float32)
    taps = calibrate_relaynet(layers, [calib])
    if variant == "psrp":
        qp = jax.tree.map(jnp.asarray, quantize_relaynet_psrp(layers, taps))

        def fwd(qp, x):
            return relaynet_psrp_forward(qp, x, num_classes=NC)
    else:
        qp = jax.tree.map(jnp.asarray, quantize_relaynet(layers, taps))

        def fwd(qp, x):
            return jnp.argmax(relaynet_int8_forward(qp, x), axis=-1)

    @partial(jax.jit, static_argnums=(1,))
    def run(qp, iters: int):
        def body(c, k):
            x = jax.random.bits(k, (BATCH, SIZE, SIZE, 1), jnp.uint16)
            x = (x.astype(jnp.float32) / 65536.0) - 0.5
            y = fwd(qp, x)
            return c + jnp.sum(y == 0, dtype=jnp.int32), None

        tot, _ = jax.lax.scan(body, jnp.int32(0),
                              jax.random.split(jax.random.PRNGKey(0), iters))
        return tot

    from common import scan_diff

    long = int(os.environ.get("OCTSEG_BENCH_LONG", "8"))
    per_batch = scan_diff(lambda n: int(run(qp, n)), 2, long)
    print(f"relaynet int8 {variant} 512^2: {per_batch*1e3:.1f} "
          f"ms/batch-{BATCH} = {BATCH/per_batch:.0f} scans/s", flush=True)


if __name__ == "__main__":
    main()
