"""Training-step throughput: U-Net 512x512, class-weighted Dice+CE + Adam.

Same scan-difference methodology as bench.py (see docs/PERF.md). The scan
carries the full TrainState so every step's update feeds the next — nothing
can be hoisted.
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 512
BATCH = int(os.environ.get("OCTSEG_BENCH_BATCH", "32"))


def main():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        ModelConfig,
        TrainConfig,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
        Trainer,
        make_train_step,
    )

    kwargs = {"init_features": 32}
    remat = os.environ.get("OCTSEG_BENCH_REMAT", "stage")
    if remat in ("stage", "policy"):
        kwargs["remat_stages"] = True
    if remat == "policy":
        kwargs["remat_policy"] = "conv_out"
    cfg = TrainConfig(
        model=ModelConfig(name="unet", num_classes=10, kwargs=kwargs),
        compute_dtype="bfloat16",
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jnp.zeros((1, SIZE, SIZE, 1), jnp.bfloat16))
    if os.environ.get("OCTSEG_BENCH_PACKED"):
        from retinal_oct_image_segmentation_via_deep_learning_tpu.training.packed_unet import (
            make_packed_train_step,
        )

        step = make_packed_train_step(
            trainer.loss_fn,
            remat=bool(os.environ.get("OCTSEG_PACKED_REMAT")),
        )
    else:
        step = make_train_step(trainer.model, trainer.loss_fn)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def run(state, iters: int):
        def body(carry, k):
            st, acc = carry
            x = jax.random.bits(k, (BATCH, SIZE, SIZE, 1), jnp.uint16)
            x = (x.astype(jnp.bfloat16) / 65536.0) - 0.5
            y = jax.random.randint(k, (BATCH, SIZE, SIZE), 0, 10)
            st, loss = step(st, x, y)
            return (st, acc + loss.astype(jnp.float32)), None

        (state, total), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jax.random.split(
                jax.random.PRNGKey(0), iters
            ),
        )
        # Return the final state so the donated input state can alias the
        # output (returning only the scalar leaves every donated param/opt
        # buffer "not usable" — ~375 MB of dead HBM at f=32, which was the
        # entire b32 OOM margin).
        return state, total

    from common import scan_diff

    def go(iters):
        # donate_argnums would consume state; keep a copy per call
        out, total = run(jax.tree.map(lambda a: a + 0, state), iters)
        del out
        float(total)

    per_step = scan_diff(go, 2, 12, reps=2)
    print(
        f"train step: {per_step*1e3:.1f} ms/step @batch {BATCH} "
        f"-> {BATCH/per_step:.0f} scans/s training throughput"
    )

    if os.environ.get("OCTSEG_TRACE"):
        from trace_tools import capture, report

        report(capture(lambda: go(4), "/tmp/octseg_trace_train"),
               top=30, min_ms=1.0)


if __name__ == "__main__":
    main()
