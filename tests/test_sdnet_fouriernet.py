"""Tests for the SD_Layer_Net system and the FourierNet pipeline."""

import importlib
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_loader import REF

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------------------
# LayerEngine: true parity vs the reference (cuda-pinning patched to no-op)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_layer_engine():
    if not REF.exists():
        pytest.skip("reference not mounted")
    # The reference hardcodes .cuda() on constants (layer_engine.py:17-43);
    # patch to identity so it runs on cpu torch.
    torch.Tensor.cuda = lambda self, *a, **k: self
    pkg = types.ModuleType("sdref")
    pkg.__path__ = [str(REF / "SOTAS/Layers_Segment/SD_Layer_Net")]
    sys.modules["sdref"] = pkg
    return importlib.import_module("sdref.layer_engine")


def test_layer_engine_parity(ref_layer_engine, rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.sdnet.layer_engine import (
        LayerEngine,
    )

    n_classes, H, W = 12, 64, 64  # 11 layers = reference curv table size
    x = rng.standard_normal((2, n_classes - 1, H, W)).astype(np.float32) * 3

    tm = ref_layer_engine.LayerEngine(img_size=W, n_classes=n_classes)
    with torch.no_grad():
        lsm_t, pos_t, masks_t, losses_t = tm(torch.from_numpy(x))

    eng = LayerEngine(img_size=W, n_classes=n_classes)
    lsm, pos, masks, losses = eng(
        jnp.asarray(x.transpose(0, 2, 3, 1))
    )

    np.testing.assert_allclose(
        np.asarray(lsm), lsm_t.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pos), pos_t.numpy().transpose(0, 2, 1), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(masks), masks_t.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )
    keymap = {
        "std_deviations": (0, 2, 1),
        "topology_violations": (0, 2, 1),
        "continuity_violations": (0, 2, 1),
        "curvature_diffs": (0, 2, 1),
    }
    for k, perm in keymap.items():
        np.testing.assert_allclose(
            np.asarray(losses[k]),
            losses_t[k].numpy().transpose(*perm),
            atol=1e-3,
            err_msg=k,
        )


def test_topological_engine_1d_is_running_max(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.sdnet.layer_engine import (
        LayerEngine,
    )

    eng = LayerEngine(img_size=8, n_classes=5)
    pos = jnp.asarray(rng.standard_normal((1, 8, 4)).astype(np.float32))
    got = np.asarray(eng.topological_engine_1d(pos))
    want = np.maximum.accumulate(np.asarray(pos), axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # monotone non-decreasing boundary positions
    assert (np.diff(got, axis=-1) >= 0).all()


# ---------------------------------------------------------------------------
# SDNet composite
# ---------------------------------------------------------------------------


def test_sdnet_forward_shapes(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu import get_model

    model = get_model("sdnet", num_classes=4, img_size=64,
                      n_anatomical_factors=12,
                      channels=(8, 16, 32, 64, 128))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x
    )
    out = model.apply(variables, x, rngs={"latent": jax.random.PRNGKey(2)})
    assert out["clean_masks"].shape == (2, 64, 64, 4)
    assert out["hard_anatomy"].shape == (2, 64, 64, 12)
    assert out["reconstruction"].shape == (2, 64, 64, 1)
    assert out["z_mean"].shape == (2, 15)
    assert out["layer_positions"].shape == (2, 64, 3)
    # hard anatomy is rounded
    vals = np.unique(np.asarray(out["hard_anatomy"]).round(6))
    assert set(vals).issubset(set(np.round(np.arange(-10, 10.5, 1.0), 6)))


def test_sdnet_train_step_decreases_loss(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.sdnet_pipeline import (
        SDNetTrainer,
    )

    tr = SDNetTrainer(img_size=32, n_classes=4, n_anatomical_factors=6,
                      channels=(4, 8, 16, 32, 64), learning_rate=1e-3)
    x = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, (2, 32, 32)))
    variables, opt_state = tr.init(x)
    step = tr.make_train_step()
    losses = []
    for i in range(3):
        variables, opt_state, loss, metrics = step(
            variables, opt_state, x, y, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# FourierNet: FD maps + cascaded model + trainer
# ---------------------------------------------------------------------------


def test_fd_coefficients_match_reference_loops():
    """Vectorized FD computation vs the reference's per-point Python loops
    (calculateFourierDescriptors.py:21-57), re-implemented verbatim here."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.fd import (
        fourier_coefficients,
    )

    rng = np.random.default_rng(3)
    theta = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    pts = np.stack(
        [16 + (8 + rng.random(40)) * np.sin(theta),
         16 + (8 + rng.random(40)) * np.cos(theta)], axis=1
    ).round().astype(np.int64)

    def ref_fd(contour, N):
        center = contour.mean(axis=0)
        delta, l = [], []
        n = len(contour)
        for i in range(1, n + 1):
            p1 = contour[i - 1]
            p2 = contour[i % n]
            d1 = np.sqrt(((p1 - center) ** 2).sum())
            d2 = np.sqrt(((p2 - center) ** 2).sum())
            delta.append(d1 - d2)
            l.append(np.sqrt(((p1 - p2) ** 2).sum()))
        for i in range(1, len(l)):
            l[i] += l[i - 1]
        A = []
        L = l[-1]
        for k in range(1, N + 1):
            a = b = 0.0
            for i in range(len(l)):
                if delta[i] != 0:
                    a += delta[i] * np.sin(2 * np.pi * k * l[i] / L)
                    b += delta[i] * np.cos(2 * np.pi * k * l[i] / L)
            A.append(np.sqrt((a / (k * np.pi)) ** 2 + (-b / (k * np.pi)) ** 2))
        return np.array(A)

    got = fourier_coefficients(pts, 3)
    want = ref_fd(pts.astype(np.float64), 3)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fd_maps_shape_and_coverage():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.fd import fd_maps

    mask = np.zeros((32, 32), np.uint8)
    mask[8:24, 10:26] = 1
    maps = fd_maps(mask, n=2)
    assert maps.shape == (32, 32, 2)
    # every foreground pixel eventually got a contour amplitude
    assert (maps[mask > 0] != 0).any()
    assert (maps[mask == 0] == 0).all()


def test_fouriernet_end_to_end(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.fouriernet_pipeline import (
        FourierNetTrainer,
        prepare_dataset,
    )

    images = rng.random((6, 32, 32)).astype(np.float32)
    masks = np.zeros((6, 32, 32), np.uint8)
    masks[:, 10:22, 8:24] = 1
    data = prepare_dataset(images, masks, fd_channel=1)
    tr = FourierNetTrainer(
        features=(4, 8, 16, 32, 64), max_epochs=2, batch_size=2, patience=5
    )
    params = tr.fit(data, data)
    assert len(tr.history) == 2
    probs = tr.predict(params, data[0])
    assert probs.shape == (6, 32, 32)
    assert (probs >= 0).all() and (probs <= 1).all()
