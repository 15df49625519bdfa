"""Integration tests for the BASELINE.json capability configs.

1. Vanilla U-Net layer segmentation  -> tests/test_train_e2e.py
2. ReLayNet layers+fluid joint segmentation, class-weighted Dice   (here)
3. Lesion model (Y-Net) on fluid-pocket masks                      (here)
4. Transformer-hybrid segmenter (LightReSeg)                       (here)
5. On-device metrics suite over volume batches -> metrics/volume tests
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
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

pytestmark = pytest.mark.slow


def _fit(model_name, kwargs, num_classes, loss="dice_ce", class_weights=None,
         epochs=2, size=32):
    dcfg = SyntheticOCTConfig(height=size, width=size, num_layers=2,
                              fluid=True, seed=1)
    assert dcfg.num_classes == num_classes
    train_ds = SyntheticOCTDataset(dcfg, num_samples=16, batch_size=8)
    cfg = TrainConfig(
        model=ModelConfig(name=model_name, num_classes=num_classes,
                          kwargs=kwargs),
        optim=OptimConfig(learning_rate=1e-3),
        loss=loss,
        class_weights=class_weights,
        num_epochs=epochs,
        compute_dtype="float32",
        early_stop_patience=None,
    )
    tr = Trainer(cfg)
    state = tr.fit(train_ds)
    losses = [h["train_loss"] for h in tr.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    return tr, state


def test_relaynet_class_weighted_dice():
    """BASELINE config 2: ReLayNet joint layers+fluid with class-weighted
    Dice (fluid class upweighted, as in the ReLayNet paper)."""
    weights = [0.5, 1.0, 1.0, 5.0]  # background, 2 layers, fluid
    tr, state = _fit("relaynet", {"num_filters": 8}, 4,
                     class_weights=weights)
    preds = tr.predict(state, jnp.zeros((1, 32, 32, 1)))
    assert preds.shape == (1, 32, 32)


def test_ynet_lesion_segmentation():
    """BASELINE config 3: lesion (fluid-pocket) segmentation with the
    Y-Net lesions model."""
    _fit("y_net_gen", {"init_features": 4}, 4)


def test_lightreseg_transformer_hybrid():
    """BASELINE config 4: transformer-hybrid layer segmenter."""
    _fit("lightreseg", {}, 4)
