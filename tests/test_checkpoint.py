"""Orbax checkpoint round-trip + best-metric retention + early stopping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_checkpoint_roundtrip(tmp_path, rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.checkpoint import (
        CheckpointManager,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
        Trainer,
    )

    cfg = TrainConfig(
        model=ModelConfig(name="unet", num_classes=3,
                          kwargs={"init_features": 4}),
        compute_dtype="float32",
    )
    tr = Trainer(cfg)
    x = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    state = tr.init_state(x)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(0, jax.device_get(state), {"val_loss": 1.0})
    mgr.save(1, jax.device_get(state), {"val_loss": 0.5})
    mgr.wait()

    restored = mgr.restore_best(jax.device_get(state))
    assert restored is not None
    got = jax.tree.leaves(restored.params)
    want = jax.tree.leaves(jax.device_get(state).params)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))
    mgr.close()


def test_early_stopping_patience():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.checkpoint import (
        EarlyStopping,
    )

    es = EarlyStopping(patience=2)
    assert not es.update(0, 1.0)
    assert not es.update(1, 0.9)  # improvement resets
    assert not es.update(2, 0.95)
    assert es.update(3, 0.95)  # second bad epoch -> stop
    assert es.best == 0.9 and es.best_step == 1


def test_octseg_alias():
    import octseg

    assert "unet" in octseg.list_models()
