"""Int8 quantized inference: BN-folding exactness + argmax agreement."""

import numpy as np

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
    calibrate_unet,
    fold_unet_bn,
    folded_forward,
    quantize_unet,
    unet_int8_forward,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import UNet
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
    SyntheticOCTConfig,
    synth_batch,
)


def _trained_ish_variables(model, x, seed=0):
    """Init + randomize batch_stats so BN folding is non-trivial."""
    variables = model.init(jax.random.PRNGKey(seed), x)
    rng = np.random.default_rng(seed)

    def jitter(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = jitter(v)
            elif k == "mean":
                out[k] = jnp.asarray(
                    rng.normal(0, 0.05, v.shape).astype(np.float32)
                )
            elif k == "var":
                out[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape).astype(np.float32)
                )
            else:
                out[k] = v
        return out

    return {"params": variables["params"],
            "batch_stats": jitter(variables["batch_stats"])}


def test_bn_folding_exact():
    model = UNet(out_channels=5, init_features=8)
    cfg = SyntheticOCTConfig(height=64, width=64, num_layers=3, seed=0)
    x, _ = synth_batch(jax.random.PRNGKey(0), 2, cfg)
    variables = _trained_ish_variables(model, x[:1])

    want = model.apply(variables, x, train=False)
    layers = fold_unet_bn(variables)
    got = folded_forward(layers, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_int8_argmax_agreement():
    model = UNet(out_channels=5, init_features=8)
    cfg = SyntheticOCTConfig(height=64, width=64, num_layers=3, seed=0)
    x, _ = synth_batch(jax.random.PRNGKey(0), 4, cfg)
    variables = _trained_ish_variables(model, x[:1])

    layers = fold_unet_bn(variables)
    taps = calibrate_unet(layers, [x[:2]])
    qparams = quantize_unet(layers, taps)

    ref_logits = folded_forward(layers, x)
    q_logits = unet_int8_forward(qparams, x)
    assert q_logits.shape == ref_logits.shape

    agree = np.mean(
        np.asarray(jnp.argmax(q_logits, -1) == jnp.argmax(ref_logits, -1))
    )
    assert agree > 0.98, f"argmax agreement {agree}"
