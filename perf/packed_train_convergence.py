"""On-chip convergence A/B: packed vs XLA training steps, same init/data.

30 Adam steps at 256^2 b8 on synthetic labels from the SAME TrainState
and batch stream; prints both loss trajectories and the final relative
gap. This is the user-facing contract for `train --packed`: the packed
step optimizes the same objective at the same rate.
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SIZE = int(os.environ.get("OCTSEG_CONV_SIZE", "256"))
BATCH = int(os.environ.get("OCTSEG_CONV_BATCH", "8"))
STEPS = int(os.environ.get("OCTSEG_CONV_STEPS", "30"))
NC = 6


def main():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
        SyntheticOCTConfig,
        synth_batch,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.packed_unet import (
        make_packed_train_step,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
        Trainer,
        make_train_step,
    )

    cfg = TrainConfig(
        model=ModelConfig(name="unet", num_classes=NC,
                          kwargs={"init_features": 32}),
        data=DataConfig(image_size=(SIZE, SIZE), batch_size=BATCH),
        compute_dtype="bfloat16",
    )
    trainer = Trainer(cfg)
    state0 = trainer.init_state(jnp.zeros((1, SIZE, SIZE, 1), jnp.bfloat16))

    scfg = SyntheticOCTConfig(height=SIZE, width=SIZE, num_layers=4,
                              fluid=True, seed=5)
    batches = [synth_batch(jax.random.PRNGKey(100 + i), BATCH, scfg)
               for i in range(STEPS)]

    results = {}
    final_states = {}
    for name, step in (
        ("xla", make_train_step(trainer.model, trainer.loss_fn)),
        ("packed", make_packed_train_step(trainer.loss_fn)),
    ):
        jstep = jax.jit(step)
        st = jax.tree.map(lambda a: a + 0, state0)
        losses = []
        for xb, yb in batches:
            st, loss = jstep(st, jnp.asarray(xb, jnp.bfloat16),
                             jnp.asarray(yb))
            losses.append(float(loss))
        results[name] = losses
        final_states[name] = st
        print(f"{name:7s}: first {losses[0]:.4f}  last {losses[-1]:.4f}  "
              f"traj {' '.join(f'{l:.3f}' for l in losses[::5])}",
              flush=True)

    a, b = np.array(results["xla"]), np.array(results["packed"])
    print(f"max |rel gap| over trajectory: "
          f"{np.max(np.abs(a-b)/np.maximum(np.abs(a),1e-6)):.3e}",
          flush=True)

    # Converged-Dice contract (round-3 ask #7 / round-4 verdict item 7):
    # final val macro-Dice of the two optimizers must match within 0.005.
    # Run with OCTSEG_CONV_STEPS=300 for the converged contract.
    xv, yv = synth_batch(jax.random.PRNGKey(777), 16, scfg)
    yv = np.asarray(yv)
    dices = {}
    for name, st in final_states.items():
        logits = trainer.model.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            jnp.asarray(xv, jnp.bfloat16), train=False,
        )
        pred = np.asarray(jnp.argmax(logits, -1))
        scores = []
        for c in range(NC):
            gt = yv == c
            if not gt.any():
                continue
            pr = pred == c
            scores.append(
                2.0 * (gt & pr).sum() / (gt.sum() + pr.sum() + 1e-7)
            )
        dices[name] = float(np.mean(scores))
        print(f"{name:7s}: final val macro-Dice {dices[name]:.4f}",
              flush=True)
    delta = dices["packed"] - dices["xla"]
    print(f"CONTRACT final-Dice delta (packed - xla): {delta:+.4f} "
          f"({'PASS' if abs(delta) <= 0.005 else 'FAIL'} at 0.005)",
          flush=True)


if __name__ == "__main__":
    main()
