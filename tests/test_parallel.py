"""Multi-chip tests on the 8-device virtual CPU mesh: DP training step,
spatial halo sharding, sliding-window inference."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from retinal_oct_image_segmentation_via_deep_learning_tpu.parallel.mesh import (
    DATA_AXIS,
    SPACE_AXIS,
    create_mesh,
)


def test_mesh_shapes():
    mesh = create_mesh(data=4, space=2)
    assert mesh.shape == {DATA_AXIS: 4, SPACE_AXIS: 2}


def test_dp_train_step_8way(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        ModelConfig,
        TrainConfig,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
        Trainer,
        make_train_step,
    )

    mesh = create_mesh(data=8)
    cfg = TrainConfig(
        model=ModelConfig(name="unet", num_classes=3,
                          kwargs={"init_features": 4}),
        compute_dtype="float32",
    )
    tr = Trainer(cfg, mesh=mesh)
    x = jnp.asarray(rng.random((8, 32, 32, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, (8, 32, 32)))
    state = tr.init_state(x[:1])
    xs, ys = tr._shard(x, y)
    step = jax.jit(make_train_step(tr.model, tr.loss_fn))
    state, loss = step(state, xs, ys)
    assert np.isfinite(float(loss))


def test_halo_exchange_matches_full_conv(rng):
    """Spatially sharded conv == unsharded conv when halo >= receptive field."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.parallel.halo import (
        spatial_shard_infer,
    )

    mesh = create_mesh(data=1, space=4)
    x = rng.standard_normal((2, 64, 32, 3)).astype(np.float32)
    w = rng.standard_normal((5, 5, 3, 4)).astype(np.float32)

    def apply_fn(variables, inp):
        return jax.lax.conv_general_dilated(
            inp, variables["w"], (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    variables = {"w": jnp.asarray(w)}
    full = apply_fn(variables, jnp.asarray(x))
    sharded = spatial_shard_infer(apply_fn, variables, jnp.asarray(x),
                                  mesh, halo=4)
    # interior must match exactly; shard boundaries see replicate-padded
    # halos only at the global image edge, which the full conv pads with
    # zeros -> compare away from the global border
    np.testing.assert_allclose(
        np.asarray(sharded)[:, 4:-4], np.asarray(full)[:, 4:-4], atol=1e-5
    )


def test_sliding_window_matches_direct(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.parallel.halo import (
        sliding_window_infer,
    )

    x = rng.standard_normal((1, 96, 16, 2)).astype(np.float32)

    def apply_fn(variables, inp):
        return inp * 2.0 + variables["b"]

    variables = {"b": jnp.asarray(1.5)}
    got = sliding_window_infer(apply_fn, variables, jnp.asarray(x),
                               tile=32, overlap=8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(x) * 2.0 + 1.5, atol=1e-5
    )
