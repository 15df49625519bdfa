"""f=32 vs f=16 U-Net Dice ablation on synthetic Duke-shaped data.

Evidence for the f=16 secondary serving config (docs/PERF.md): the serving
speedup from quartered FLOPs is only publishable alongside its accuracy
cost. Trains both widths on IDENTICAL data/schedule/seed and reports final
validation macro-Dice.

Usage: python perf/dice_f_ablation.py [--size 256] [--epochs 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def macro_dice(pred, lab, nc):
    scores = []
    for c in range(nc):
        gt = lab == c
        if not gt.any():
            continue
        pr = pred == c
        scores.append(2.0 * (gt & pr).sum() / (gt.sum() + pr.sum() + 1e-7))
    return float(np.mean(scores))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--train", type=int, default=64)
    ap.add_argument("--val", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--features", type=int, nargs="*", default=[32, 16])
    # Task-hardness knobs (round-4): the converged 32-epoch run at the
    # default task saturated BOTH widths at 0.9981 (ceiling effect — it
    # cannot distinguish capacity). Raise speckle / layer count and shrink
    # the train set until f=32 itself is off-ceiling, then compare.
    ap.add_argument("--speckle", type=float, default=0.35)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (leave the tunneled TPU free)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
        SyntheticOCTConfig,
        SyntheticOCTDataset,
        synth_batch,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
        Trainer,
    )

    scfg = SyntheticOCTConfig(
        height=args.size, width=args.size, num_layers=args.layers,
        fluid=True, speckle=args.speckle, seed=5,
    )
    nc = scfg.num_classes
    train = SyntheticOCTDataset(scfg, num_samples=args.train,
                                batch_size=args.batch)
    xv, yv = synth_batch(jax.random.PRNGKey(99), args.val, scfg)
    xv, yv = np.asarray(xv), np.asarray(yv)

    results = {}
    for f in args.features:
        cfg = TrainConfig(
            model=ModelConfig(name="unet", num_classes=nc,
                              kwargs={"init_features": f}),
            optim=OptimConfig(learning_rate=args.lr),
            num_epochs=args.epochs,
            compute_dtype="bfloat16",
            early_stop_patience=None,
            log_every_steps=1000,
        )
        tr = Trainer(cfg)
        state = tr.fit(train)
        pred = np.asarray(tr.predict(state, xv))
        results[f] = macro_dice(pred, yv, nc)
        print(f"f={f}: val macro-Dice {results[f]:.4f}", flush=True)

    if 32 in results and 16 in results:
        print(
            f"delta (f16 - f32): {results[16] - results[32]:+.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
