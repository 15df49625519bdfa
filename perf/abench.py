"""A/B throughput harness (scan-difference methodology, tunnel-safe).

Per-batch time = (T(long scan) - T(short scan)) / (long - short), with host
fetch (int()) as the only reliable sync over the tunneled backend; the fixed
dispatch/RTT cost cancels in the difference. See bench.py for the canonical
run; this file sweeps implementation variants.

Usage: python perf/abench.py [batch ...]
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 512
SHORT, LONG = 2, 22


def build_run(batch):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import UNet

    model = UNet(out_channels=10, init_features=32, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.zeros((1, SIZE, SIZE, 1), jnp.bfloat16))

    @partial(jax.jit, static_argnums=2)
    def run(variables, key, iters: int):
        def body(carry, k):
            x = jax.random.bits(k, (batch, SIZE, SIZE, 1), jnp.uint16)
            x = (x.astype(jnp.bfloat16) / 65536.0) - 0.5
            logits = model.apply(variables, x, train=False)
            lab = jnp.argmax(logits, axis=-1)
            return carry + jnp.sum(lab, dtype=jnp.int32), None

        total, _ = jax.lax.scan(body, jnp.int32(0), jax.random.split(key, iters))
        return total

    return variables, run


def scans_per_sec(batch):
    from common import scan_diff

    variables, run = build_run(batch)
    key = jax.random.PRNGKey(1)
    per_batch = scan_diff(
        lambda n: int(run(variables, key, n)), SHORT, LONG
    )
    return batch / per_batch, per_batch


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [32]
    for impl in ("dilated", "einsum"):
        os.environ["OCTSEG_CONV_TRANSPOSE_IMPL"] = impl
        for b in batches:
            sps, pb = scans_per_sec(b)
            print(
                f"impl={impl} batch={b}: {pb*1e3:.1f} ms/batch, "
                f"{sps:.0f} scans/s",
                flush=True,
            )
