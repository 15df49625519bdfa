"""On-chip accuracy contract for the packed bf16 training forward.

CPU tests run the Pallas kernels in interpret mode
(tests/test_packed_unet.py); this probe runs the REAL Mosaic compiles on
the TPU and checks, at a production-like geometry (512^2 f=32):

1. forward logits agreement vs UNet.apply(train=True) (bf16 tolerance),
2. batch-stat updates agreement,
3. per-leaf gradient cosine vs the XLA step's gradients,
4. one fused-loss step (OCTSEG_PACKED_FUSED_LOSS path) loss agreement.

Record the numbers in docs/PERF.md next to the step timings.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SIZE = int(os.environ.get("OCTSEG_ACC_SIZE", "512"))
BATCH = int(os.environ.get("OCTSEG_ACC_BATCH", "4"))
NC = 10


def main():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
        UNet,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.losses import (
        dice_ce_loss,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.packed_unet import (
        packed_unet_apply,
    )

    model = UNet(out_channels=NC, init_features=32, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, SIZE, SIZE, 1), jnp.bfloat16), train=True)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (BATCH, SIZE, SIZE, 1), jnp.bfloat16)
    y = jax.random.randint(key, (BATCH, SIZE, SIZE), 0, NC)

    # 1-2: forward + stats
    want, upd = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])
    )(v, x)
    got, new_stats = jax.jit(packed_unet_apply)(v, x)
    aw = np.asarray(want, np.float32)
    ag = np.asarray(got, np.float32)
    denom = np.sqrt((aw ** 2).mean())
    print(f"forward rms-rel-err: {np.sqrt(((aw-ag)**2).mean())/denom:.2e} "
          f"max-abs: {np.abs(aw-ag).max():.3f} "
          f"argmax agree: {(aw.argmax(-1)==ag.argmax(-1)).mean()*100:.2f}%",
          flush=True)
    ref_stats = {jax.tree_util.keystr(k): np.asarray(a) for k, a in
                 jax.tree_util.tree_leaves_with_path(upd["batch_stats"])}
    worst = 0.0
    for k, a in jax.tree_util.tree_leaves_with_path(new_stats):
        r = ref_stats[jax.tree_util.keystr(k)]
        worst = max(worst, float(np.max(np.abs(np.asarray(a) - r))
                                 / (np.max(np.abs(r)) + 1e-6)))
    print(f"batch-stats worst rel-err: {worst:.2e}", flush=True)

    # 3: gradient cosine per leaf
    def loss_ref(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return dice_ce_loss(logits, y)

    def loss_packed(params):
        logits, _ = packed_unet_apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x)
        return dice_ce_loss(logits, y)

    lr, gr = jax.jit(jax.value_and_grad(loss_ref))(v["params"])
    lp, gp = jax.jit(jax.value_and_grad(loss_packed))(v["params"])
    print(f"loss ref {float(lr):.5f} packed {float(lp):.5f} "
          f"rel {abs(float(lr-lp))/abs(float(lr)):.2e}", flush=True)
    cosines = []
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gr),
                              jax.tree_util.tree_leaves_with_path(gp)):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if max(na, nb) < 1e-5:
            continue
        cosines.append((float(a @ b / (na * nb + 1e-12)),
                        jax.tree_util.keystr(k)))
    cosines.sort()
    print(f"grad cosine: min {cosines[0][0]:.5f} ({cosines[0][1]}), "
          f"median {cosines[len(cosines)//2][0]:.5f}, "
          f"n={len(cosines)}", flush=True)

    # 4: fused-loss step agreement
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_loss import (
        dice_ce_loss_pallas,
    )

    def loss_fused(params):
        logits, _ = packed_unet_apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            logits_layout="nchw")
        return dice_ce_loss_pallas(logits, y, nchw=True)

    lf = jax.jit(loss_fused)(v["params"])
    print(f"fused pallas loss {float(lf):.5f} "
          f"rel vs ref {abs(float(lf-lr))/abs(float(lr)):.2e}", flush=True)


if __name__ == "__main__":
    main()
