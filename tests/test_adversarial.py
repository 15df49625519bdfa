"""AnoGAN two-optimizer adversarial training step."""

import numpy as np

import jax
import jax.numpy as jnp


def test_anogan_train_step_runs_and_learns(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.adversarial import (
        AnoGANTrainer,
    )

    tr = AnoGANTrainer(learning_rate=1e-3)
    x = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
    variables, opt_g, opt_d = tr.init(x)
    step = tr.make_train_step()
    recs = []
    for _ in range(5):
        variables, opt_g, opt_d, metrics = step(variables, opt_g, opt_d, x)
        recs.append(float(metrics["rec"]))
        assert np.isfinite(float(metrics["d_loss"]))
        assert np.isfinite(float(metrics["g_loss"]))
    # generator reconstruction improves on a fixed batch (the adversarial
    # total need not decrease monotonically)
    assert recs[-1] < recs[0]
