"""Pallas kernel correctness (interpreter mode on CPU)."""

import numpy as np

import jax.numpy as jnp


def test_fused_column_softargmax_matches_reference(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_kernels import (
        fused_column_softargmax,
        reference_column_softargmax,
    )

    x = jnp.asarray(rng.standard_normal((2, 16, 200, 3)).astype(np.float32) * 2)
    sm_p, pos_p, std_p = fused_column_softargmax(x, interpret=True)
    sm_r, pos_r, std_r = reference_column_softargmax(x)
    np.testing.assert_allclose(np.asarray(sm_p), np.asarray(sm_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos_p), np.asarray(pos_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(std_p), np.asarray(std_r), atol=1e-4)


def test_volume_metrics(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.metrics.volume import (
        volume_confusion,
        volume_metrics,
        volume_thickness_maps,
    )

    yt = rng.integers(0, 4, (2, 16, 16))
    yp = rng.integers(0, 4, (2, 16, 16))
    cm = np.asarray(volume_confusion(jnp.asarray(yt), jnp.asarray(yp), 4))
    ref = np.zeros((4, 4))
    for t, p in zip(yt.reshape(-1), yp.reshape(-1)):
        ref[t, p] += 1
    np.testing.assert_allclose(cm, ref)

    m = volume_metrics(jnp.asarray(yt), jnp.asarray(yp), 4)
    for c in range(4):
        t = (yt == c).astype(float)
        p = (yp == c).astype(float)
        dice_ref = 2 * (t * p).sum() / (t.sum() + p.sum() + 1e-7)
        assert abs(float(m["dice"][c]) - dice_ref) < 1e-4

    tm = np.asarray(volume_thickness_maps(jnp.asarray(yt), num_classes=4))
    assert tm.shape == (2, 16, 4)
    np.testing.assert_allclose(tm[0, :, 1], (yt[0] == 1).sum(axis=0))
