"""Int8 PTQ accuracy contract on a TRAINED network (VERDICT.md weak #6).

Round 1 measured the >=98% argmax contract on random-init weights; trained
networks have peakier activation distributions, so PTQ error behaves
differently. Here a small U-Net is actually trained on synthetic B-scans
(loss-decrease asserted) before calibration/quantization, and the contract
is checked on held-out data for both the all-int8 and the mixed
(bf16-shallow) serving paths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
    ModelConfig,
    TrainConfig,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
    calibrate_unet,
    fold_unet_bn,
    folded_forward,
    quantize_unet,
    quantize_unet_mixed,
    unet_int8_forward,
    unet_mixed_forward,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
    SyntheticOCTConfig,
    SyntheticOCTDataset,
    synth_batch,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
    Trainer,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained():
    data_cfg = SyntheticOCTConfig(height=64, width=64, num_layers=4,
                                  fluid=False, seed=3)
    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        OptimConfig,
    )

    cfg = TrainConfig(
        model=ModelConfig(name="unet", num_classes=data_cfg.num_classes,
                          kwargs={"init_features": 8}),
        optim=OptimConfig(learning_rate=3e-3),
        loss="dice_ce",
        num_epochs=3,
        compute_dtype="float32",
    )
    trainer = Trainer(cfg)
    train_ds = SyntheticOCTDataset(data_cfg, num_samples=48, batch_size=8)
    state = trainer.fit(train_ds)
    losses = [h["train_loss"] for h in trainer.history]
    assert losses[-1] < losses[0], losses
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return variables, data_cfg


def _heldout(data_cfg, n=8):
    return synth_batch(jax.random.PRNGKey(999), n, data_cfg)


def test_int8_contract_on_trained_checkpoint(trained):
    variables, data_cfg = trained
    layers = fold_unet_bn(variables)
    calib, _ = synth_batch(jax.random.PRNGKey(123), 4, data_cfg)
    taps = calibrate_unet(layers, [calib])
    x, _ = _heldout(data_cfg)

    ref = folded_forward(layers, x)
    q = unet_int8_forward(quantize_unet(layers, taps), x)
    agree = float(jnp.mean(jnp.argmax(q, -1) == jnp.argmax(ref, -1)))
    assert agree >= 0.98, f"trained-net int8 argmax agreement {agree}"


def test_mixed_contract_on_trained_checkpoint(trained):
    variables, data_cfg = trained
    layers = fold_unet_bn(variables)
    calib, _ = synth_batch(jax.random.PRNGKey(123), 4, data_cfg)
    taps = calibrate_unet(layers, [calib])
    mp = quantize_unet_mixed(layers, taps)
    x, _ = _heldout(data_cfg)

    ref = folded_forward(layers, x)
    for shallow in ("bf16", "int8"):
        out = unet_mixed_forward(mp, x, shallow=shallow)
        agree = float(jnp.mean(jnp.argmax(out, -1) == jnp.argmax(ref, -1)))
        assert agree >= 0.98, f"mixed({shallow}) agreement {agree}"
