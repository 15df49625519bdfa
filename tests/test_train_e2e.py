"""End-to-end learning sanity: the full stack (synthetic data -> DP trainer
-> eval) must actually learn layer structure, not just run."""

import numpy as np

import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.slow


def test_unet_learns_synthetic_layers():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        DataConfig,
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
        SyntheticOCTConfig,
        SyntheticOCTDataset,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
        Trainer,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.metrics.volume import (
        volume_metrics,
    )

    dcfg = SyntheticOCTConfig(height=64, width=64, num_layers=3, fluid=False,
                              seed=7)
    nc = dcfg.num_classes
    train_ds = SyntheticOCTDataset(dcfg, num_samples=64, batch_size=8)
    val_cfg = SyntheticOCTConfig(height=64, width=64, num_layers=3,
                                 fluid=False, seed=11)
    val_ds = SyntheticOCTDataset(val_cfg, num_samples=8, batch_size=8)

    cfg = TrainConfig(
        model=ModelConfig(name="unet", num_classes=nc,
                          kwargs={"init_features": 8}),
        optim=OptimConfig(learning_rate=3e-3),
        num_epochs=6,
        compute_dtype="float32",
        early_stop_patience=None,
    )
    tr = Trainer(cfg)
    state = tr.fit(train_ds, val_ds)

    images, labels = next(iter(val_ds.epoch(0)))
    preds = tr.predict(state, images)
    m = volume_metrics(labels, preds, nc)
    mean_dice = float(m["mean_dice"])
    # untrained is ~0.1; structure must be clearly learned
    assert mean_dice > 0.5, f"mean dice {mean_dice}"
    # training loss must have decreased substantially
    assert tr.history[-1]["train_loss"] < 0.7 * tr.history[0]["train_loss"]
