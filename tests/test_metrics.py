"""Golden tests for the metrics families vs the reference NumPy formulas.

Each test re-implements the reference formula inline in NumPy (from
``/root/reference/Metrics/*.py``) and checks the JAX implementation to 1e-4,
per the fidelity contract in BASELINE.md.
"""

import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from retinal_oct_image_segmentation_via_deep_learning_tpu import metrics as M


def _masks(rng, shape=(64, 64)):
    y_true = (rng.random(shape) > 0.5).astype(np.float64)
    y_pred = (rng.random(shape) > 0.5).astype(np.float64)
    return y_true, y_pred


# ---------------------------------------------------------------------------
# Confusion-matrix family (ConfusionMatrix_based_metrics.py)
# ---------------------------------------------------------------------------


def test_accuracy(rng):
    yt, yp = _masks(rng)
    tp = np.sum(yt * yp)
    tn = np.sum((1 - yt) * (1 - yp))
    ref = (tp + tn) / np.prod(yt.shape)
    assert abs(float(M.accuracy(yt, yp)) - ref) < 1e-4


def test_sensitivity_precision_specificity(rng):
    yt, yp = _masks(rng)
    tp = np.sum(yt * yp)
    fn = np.sum(yt * (1 - yp))
    fp = np.sum((1 - yt) * yp)
    tn = np.sum((1 - yt) * (1 - yp))
    assert abs(float(M.sensitivity(yt, yp)) - tp / (tp + fn + 1e-7)) < 1e-4
    assert abs(float(M.cm_precision(yt, yp)) - tp / (tp + fp + 1e-7)) < 1e-4
    assert abs(float(M.specificity(yt, yp)) - tn / (tn + fp + 1e-7)) < 1e-4


@pytest.mark.parametrize("ties", [False, True])
def test_auc_matches_sklearn(rng, ties):
    yt = (rng.random(5000) > 0.7).astype(np.float64)
    ys = rng.random(5000)
    if ties:
        ys = np.round(ys, 2)  # heavy ties
    ref = roc_auc_score(yt, ys)
    assert abs(float(M.auc_score(yt, ys)) - ref) < 1e-4


def test_auc_single_class_fallback():
    # Reference returns 0.0 on ValueError (single class present), :78-82.
    yt = np.zeros(100)
    ys = np.linspace(0, 1, 100)
    assert float(M.auc_score(yt, ys)) == 0.0
    assert float(M.auc_score(np.ones(100), ys)) == 0.0


# ---------------------------------------------------------------------------
# Region family (Region_based_metrics.py)
# ---------------------------------------------------------------------------


def test_region_metrics(rng):
    yt, yp = _masks(rng)
    inter = np.sum(yt * yp)
    assert (
        abs(
            float(M.dice_coefficient(yt, yp))
            - 2 * inter / (yt.sum() + yp.sum() + 1e-7)
        )
        < 1e-4
    )
    union = yt.sum() + yp.sum() - inter
    assert abs(float(M.iou_score(yt, yp)) - inter / (union + 1e-7)) < 1e-4
    assert abs(float(M.precision(yt, yp)) - inter / (yp.sum() + 1e-7)) < 1e-4
    assert abs(float(M.recall(yt, yp)) - inter / (yt.sum() + 1e-7)) < 1e-4


def test_per_class_dice(rng):
    yt = rng.integers(0, 4, (32, 32))
    yp = rng.integers(0, 4, (32, 32))
    got = np.asarray(M.region.per_class_dice(yt, yp, 4))
    for c in range(4):
        t = (yt == c).astype(float)
        p = (yp == c).astype(float)
        ref = 2 * (t * p).sum() / (t.sum() + p.sum() + 1e-7)
        assert abs(got[c] - ref) < 1e-4


# ---------------------------------------------------------------------------
# Pixel-error family (PixelError_based_metrics.py)
# ---------------------------------------------------------------------------


def test_mse_rmse(rng):
    yt, yp = _masks(rng)
    ref = np.mean((yt - yp) ** 2)
    assert abs(float(M.mean_squared_error(yt, yp)) - ref) < 1e-4
    assert abs(float(M.root_mean_squared_error(yt, yp)) - np.sqrt(ref)) < 1e-4


# ---------------------------------------------------------------------------
# Biomarker family (Biomarker_based_metrics.py)
# ---------------------------------------------------------------------------


def test_thickness_difference(rng):
    yt, yp = _masks(rng)
    ref = np.mean(np.abs(np.sum(yt, axis=0) - np.sum(yp, axis=0)))
    assert abs(float(M.thickness_difference(yt, yp)) - ref) < 1e-4


def test_vascularity_index(rng):
    yt, yp = _masks(rng)
    ref = abs(yt.sum() / yt.size - yp.sum() / yp.size)
    assert abs(float(M.vascularity_index(yt, yp)) - ref) < 1e-4


# ---------------------------------------------------------------------------
# Contour family (Contour_based_metrics.py)
# ---------------------------------------------------------------------------


def _blob(shape, center, radius):
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    return ((yy - center[0]) ** 2 + (xx - center[1]) ** 2 <= radius**2).astype(
        np.float64
    )


def test_find_contours_rectangle():
    m = np.zeros((10, 12))
    m[3:6, 4:8] = 1.0  # rows 3..5, cols 4..7
    cs = M.find_contours(m, 0.5)
    assert len(cs) == 1
    c = cs[0]
    # closed loop
    assert np.allclose(c[0], c[-1])
    # all points at half-integer offsets crossing the 0/1 boundary
    rows, cols = c[:, 0], c[:, 1]
    assert rows.min() == 2.5 and rows.max() == 5.5
    assert cols.min() == 3.5 and cols.max() == 7.5


def test_contour_metrics_vs_python_double_loop():
    """The vectorized distance reduction must equal the reference's
    pure-Python double loop (Contour_based_metrics.py:19-20,36-37,53-54)."""
    yt = _blob((48, 48), (22, 24), 10)
    yp = _blob((48, 48), (25, 21), 12)
    ct = M.find_contours(yt, 0.5)[0]
    cp = M.find_contours(yp, 0.5)[0]
    d1 = [np.min(np.sqrt(np.sum((ct - p) ** 2, axis=1))) for p in cp]
    d2 = [np.min(np.sqrt(np.sum((cp - p) ** 2, axis=1))) for p in ct]
    hd_ref = max(np.max(d1), np.max(d2))
    hd95_ref = max(np.percentile(d1, 95), np.percentile(d2, 95))
    assd_ref = (np.mean(d1) + np.mean(d2)) / 2
    assert abs(M.hausdorff_distance(yt, yp) - hd_ref) < 1e-4
    assert abs(M.hausdorff_distance_95(yt, yp) - hd95_ref) < 1e-4
    assert abs(M.assd(yt, yp) - assd_ref) < 1e-4


def test_mad(rng):
    yt, yp = _masks(rng)
    ref = np.mean(np.abs(yt - yp))
    assert abs(float(M.mad(yt, yp)) - ref) < 1e-4


def test_identical_masks_zero_distance():
    m = _blob((32, 32), (16, 16), 8)
    assert M.hausdorff_distance(m, m) == 0.0
    assert M.assd(m, m) == 0.0


def test_device_surface_distances_close_to_exact():
    """The on-device boundary-pixel variant must track the host-exact
    (marching-squares) values within the documented <=0.7 px gap."""
    yt = _blob((48, 48), (22, 24), 10)
    yp = _blob((48, 48), (25, 21), 12)
    hd_exact = M.hausdorff_distance(yt, yp)
    assd_exact = M.assd(yt, yp)
    hd_dev = float(M.contour.hausdorff_distance_device(yt, yp))
    assd_dev = float(M.contour.assd_device(yt, yp))
    assert abs(hd_dev - hd_exact) <= 0.8
    assert abs(assd_dev - assd_exact) <= 0.8


def test_device_surface_distance_identity():
    m = _blob((32, 32), (16, 16), 8)
    assert float(M.contour.hausdorff_distance_device(m, m)) == 0.0
    assert float(M.contour.assd_device(m, m)) == 0.0


def test_volume_boundary_metrics(rng):
    """Per-class on-device contour+biomarker pass (Trainer.evaluate backend)."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.metrics.volume import (
        volume_boundary_metrics,
    )

    B, H, W, nc = 2, 32, 32, 3
    yt = rng.integers(0, 2, (B, H, W)).astype(np.int32)
    yt[:, 10:20, 10:20] = 2
    yp = np.roll(yt, 2, axis=1)
    out = volume_boundary_metrics(yt, yp, nc, max_points=512)
    assert out["hd95"].shape == (B, nc)
    assert bool(out["valid"].all())
    # identical volumes: zero distances / differences
    same = volume_boundary_metrics(yt, yt, nc, max_points=512)
    for k in ("hd95", "assd", "thickness_diff", "vi_diff"):
        assert float(np.nanmax(np.asarray(same[k]))) == 0.0
    # thickness_diff matches the reference column-sum formula per class
    c = 2
    td_ref = np.mean(
        np.abs((yt == c).sum(axis=1) - (yp == c).sum(axis=1)), axis=1
    )
    np.testing.assert_allclose(np.asarray(out["thickness_diff"])[:, c],
                               td_ref, atol=1e-4)


def test_find_contours_vectorized_chain_order_matches_walk():
    """The round-4 pointer-doubling chain assembly must reproduce the
    scalar walk exactly (component split, contour emission order, in-chain
    point order) on random masks."""
    import numpy as np

    from retinal_oct_image_segmentation_via_deep_learning_tpu.metrics import (
        contour as C,
    )

    rng = np.random.default_rng(42)
    for _ in range(25):
        H = W = int(rng.integers(8, 40))
        m = (rng.random((H, W)) < rng.uniform(0.25, 0.75)).astype(float)
        got = C.find_contours(m, 0.5)
        orig = C._order_chains_vec
        try:
            C._order_chains_vec = C._order_chains_walk
            want = C.find_contours(m, 0.5)
        finally:
            C._order_chains_vec = orig
        assert len(got) == len(want)
        for a, b in zip(got, want):
            assert a.shape == b.shape and np.allclose(a, b)
