"""ReLayNet int8 PTQ: BN/PReLU folding exactness + argmax agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.relaynet_int8 import (
    calibrate_relaynet,
    fold_relaynet_bn,
    quantize_relaynet,
    relaynet_folded_forward,
    relaynet_int8_forward,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.models.relaynet import (
    ReLayNet,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
    SyntheticOCTConfig,
    synth_batch,
)


def _trained_ish_variables(model, x, seed=0):
    variables = model.init(jax.random.PRNGKey(seed), x, train=True)
    rng = np.random.default_rng(seed)

    def jitter(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = jitter(v)
            elif k == "mean":
                out[k] = jnp.asarray(
                    rng.normal(0, 0.05, v.shape).astype(np.float32))
            elif k == "var":
                out[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
            else:
                out[k] = v
        return out

    return {"params": variables["params"],
            "batch_stats": jitter(variables["batch_stats"])}


def _setup(nc=5, f=8, size=64):
    model = ReLayNet(num_classes=nc, num_filters=f)
    cfg = SyntheticOCTConfig(height=size, width=size, num_layers=3, seed=0)
    x, _ = synth_batch(jax.random.PRNGKey(0), 2, cfg)
    variables = _trained_ish_variables(model, x[:1])
    return model, variables, x


def test_fold_exact():
    model, variables, x = _setup()
    want = model.apply(variables, x, train=False)
    layers = fold_relaynet_bn(variables)
    got = relaynet_folded_forward(layers, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_int8_argmax_agreement_random_init():
    """Random-init logits are near-degenerate (logit rms ~0.02, argmax
    margins ~1e-3 where int8 noise is ~1e-3) — the honest bound here is
    relative error + a loose agreement floor; the >=98% contract is
    checked on a TRAINED network below (same regime as the U-Net's
    tests/test_quantized_trained.py)."""
    model, variables, x = _setup()
    layers = fold_relaynet_bn(variables)
    taps = calibrate_relaynet(layers, [np.asarray(x)])
    qp = jax.tree.map(jnp.asarray, quantize_relaynet(layers, taps))

    ref = np.asarray(relaynet_folded_forward(layers, x))
    got = np.asarray(relaynet_int8_forward(qp, x))
    err = np.sqrt(((ref - got) ** 2).mean()) / np.sqrt((ref ** 2).mean())
    assert err < 0.10, err
    agreement = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agreement >= 0.90, agreement


@pytest.mark.slow
def test_int8_argmax_agreement_trained():
    """>=98% argmax agreement contract on a briefly-trained ReLayNet."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        ModelConfig, OptimConfig, TrainConfig,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
        SyntheticOCTDataset,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
        Trainer,
    )

    data_cfg = SyntheticOCTConfig(height=64, width=64, num_layers=4,
                                  fluid=False, seed=3)
    cfg = TrainConfig(
        model=ModelConfig(name="relaynet",
                          num_classes=data_cfg.num_classes,
                          kwargs={"num_filters": 8}),
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

    layers = fold_relaynet_bn(variables)
    xc, _ = synth_batch(jax.random.PRNGKey(7), 4, data_cfg)
    taps = calibrate_relaynet(layers, [np.asarray(xc)])
    qp = jax.tree.map(jnp.asarray, quantize_relaynet(layers, taps))

    xh, _ = synth_batch(jax.random.PRNGKey(999), 8, data_cfg)
    ref = np.argmax(np.asarray(relaynet_folded_forward(layers, xh)), -1)
    got = np.argmax(np.asarray(relaynet_int8_forward(qp, xh)), -1)
    agreement = (ref == got).mean()
    assert agreement >= 0.98, agreement


def test_int8_jit_and_dtype():
    model, variables, x = _setup(nc=4, f=4, size=32)
    layers = fold_relaynet_bn(variables)
    taps = calibrate_relaynet(layers, [np.asarray(x)])
    qp = jax.tree.map(jnp.asarray, quantize_relaynet(layers, taps))
    out = jax.jit(relaynet_int8_forward)(qp, jnp.asarray(x))
    assert out.shape == (x.shape[0], 32, 32, 4)
    assert out.dtype == jnp.float32
