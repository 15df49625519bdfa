"""Packed (PSRP bf16) training forward vs UNet.apply(train=True)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
    UNet,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.packed_unet import (
    packed_unet_apply,
)


@pytest.fixture(scope="module")
def setup():
    model = UNet(out_channels=7, init_features=32, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                   train=True)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 32, 32, 1)),
        jnp.bfloat16,
    )
    return model, v, x


def test_forward_and_stats_match(setup):
    model, v, x = setup
    want, updates = model.apply(v, x, train=True, mutable=["batch_stats"])
    got, new_stats = packed_unet_apply(v, x)
    assert got.shape == want.shape
    # same math, different (banded, fp32-accum) accumulation order -> bf16
    # tolerance on logits
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.08, atol=0.08,
    )
    ref_stats = updates["batch_stats"]
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_stats)
    flat_got = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(new_stats)}
    assert len(flat_ref) == len(flat_got)
    for k, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_got[jax.tree_util.keystr(k)], np.float32),
            np.asarray(leaf, np.float32), rtol=0.05, atol=1e-3,
        )


@pytest.mark.parametrize("kw", [{"deep": "xla"}, {"deep": "psrp"},
                                {"deep": "xla", "mid": "xla"}])
def test_stage_impls_match(setup, kw):
    model, v, x = setup
    a, stats_a = packed_unet_apply(v, x, deep="psrp", mid="psrp")
    b, stats_b = packed_unet_apply(v, x, **kw)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               rtol=0.08, atol=0.08)
    flat_a = {jax.tree_util.keystr(k): la for k, la in
              jax.tree_util.tree_leaves_with_path(stats_a)}
    for kb, lb in jax.tree_util.tree_leaves_with_path(stats_b):
        np.testing.assert_allclose(
            np.asarray(flat_a[jax.tree_util.keystr(kb)], np.float32),
            np.asarray(lb, np.float32), rtol=0.05, atol=1e-3)


def test_remat_matches_norematerialized(setup):
    model, v, x = setup
    a, stats_a = packed_unet_apply(v, x)
    b, stats_b = packed_unet_apply(v, x, remat=True)
    # remat recomputes with a (potentially) different fusion/accumulation
    # order -> tight float tolerance, not bit equality
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               rtol=1e-5, atol=1e-5)
    for (ka, la), (kb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(stats_a),
        jax.tree_util.tree_leaves_with_path(stats_b),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(np.asarray(la, np.float32),
                                   np.asarray(lb, np.float32),
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_trainer_fit_packed():
    """Trainer.fit with cfg.packed_train: one tiny epoch trains (loss
    finite, state advances, batch_stats updated)."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        DataConfig, ModelConfig, TrainConfig,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
        SyntheticOCTConfig, SyntheticOCTDataset,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
        Trainer,
    )

    cfg = TrainConfig(
        model=ModelConfig(name="unet", num_classes=4,
                          kwargs={"init_features": 16}),
        data=DataConfig(image_size=(32, 32), batch_size=8, num_train=8,
                        num_val=8),
        num_epochs=1,
        eval_every_epochs=10,
        packed_train=True,
    )
    ds = SyntheticOCTDataset(
        SyntheticOCTConfig(height=32, width=32, num_layers=2), 8, 8)
    trainer = Trainer(cfg)
    state = trainer.fit(ds)
    assert int(state.step) == 1
    assert np.isfinite(trainer.history[-1]["train_loss"])


def test_fused_loss_step_matches(setup):
    """make_packed_train_step(fused_loss=True) (NCHW head + Pallas
    dice_ce) computes the same loss as the XLA-loss step on a
    kernel-supported width (W % 128 == 0)."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.losses import (
        dice_ce_loss,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.packed_unet import (
        make_packed_train_step,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.train_state import (
        TrainState,
    )
    import optax

    model, v, _ = setup
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((2, 32, 128, 1)),
        jnp.bfloat16,
    )
    v2 = model.init(jax.random.PRNGKey(1), x[:1], train=True)
    y = jnp.asarray(np.random.default_rng(12).integers(0, 7, (2, 32, 128)))
    state = TrainState.create(
        apply_fn=model.apply, params=v2["params"],
        tx=optax.adam(1e-3), batch_stats=v2["batch_stats"],
    )
    s_ref, l_ref = make_packed_train_step(dice_ce_loss)(state, x, y)
    s_got, l_got = make_packed_train_step(
        dice_ce_loss, fused_loss=True)(state, x, y)
    assert abs(float(l_ref) - float(l_got)) < 0.02 * max(1.0, float(l_ref))
    # parameter updates agree leaf-wise (same grads to bf16 tolerance)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s_ref.params),
        jax.tree_util.tree_leaves_with_path(s_got.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=2e-3, err_msg=jax.tree_util.keystr(k),
        )


def test_bad_geometry_raises(setup):
    model, v, _ = setup
    with pytest.raises(ValueError, match="divisible by 16"):
        packed_unet_apply(v, jnp.zeros((1, 24, 32, 1), jnp.bfloat16))


def test_grads_flow_and_match_direction(setup):
    model, v, x = setup
    y = jnp.asarray(
        np.random.default_rng(5).integers(0, 7, (2, 32, 32)))

    def loss_ref(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(lp, y[..., None], -1))

    def loss_packed(params):
        logits, _ = packed_unet_apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(lp, y[..., None], -1))

    l_ref, g_ref = jax.value_and_grad(loss_ref)(v["params"])
    l_got, g_got = jax.value_and_grad(loss_packed)(v["params"])
    assert abs(float(l_ref) - float(l_got)) < 0.02 * max(1.0, float(l_ref))
    # per-tensor cosine similarity of gradients
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_got),
    ):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-6 and nb < 1e-6:
            continue
        cos = float(a @ b / (na * nb + 1e-12))
        # bf16 accumulation-order noise dominates near-zero deep-stage
        # grads at this toy size — direction is meaningless there, but the
        # norms must still agree; check direction only above a noise floor.
        if max(na, nb) > 2e-3:
            assert cos > 0.95, (jax.tree_util.keystr(k), cos, na, nb)
        assert abs(na - nb) < 0.05 * max(na, nb) + 1e-6, (
            jax.tree_util.keystr(k), na, nb)
