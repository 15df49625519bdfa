"""Paired-PNG volume loader round trips (AROI-style layouts)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from retinal_oct_image_segmentation_via_deep_learning_tpu.training.png_volumes import (
    iter_png_volumes,
    load_png_volume,
)


def _write_volume(root, name, n=3, h=16, w=12, levels=(0, 64, 128, 255),
                  infix=True):
    rng = np.random.default_rng(0)
    idir = root / name / "raw"
    mdir = root / name / "mask"
    idir.mkdir(parents=True)
    mdir.mkdir(parents=True)
    masks = []
    for i in range(n):
        img = rng.integers(0, 255, (h, w)).astype(np.uint8)
        mask = np.asarray(levels, np.uint8)[
            rng.integers(0, len(levels), (h, w))
        ]
        istem = f"{name}_raw_{i:04d}" if infix else f"{i:04d}"
        mstem = f"{name}_mask_{i:04d}" if infix else f"{i:04d}"
        cv2.imwrite(str(idir / f"{istem}.png"), img)
        cv2.imwrite(str(mdir / f"{mstem}.png"), mask)
        masks.append(mask)
    return np.stack(masks)


def test_order_matched_with_value_map(tmp_path):
    levels = (0, 64, 128, 255)
    raw_masks = _write_volume(tmp_path, "patient1", levels=levels)
    vmap = {v: i for i, v in enumerate(levels)}
    images, labels, stems = load_png_volume(
        str(tmp_path / "patient1" / "raw"),
        str(tmp_path / "patient1" / "mask"),
        value_map=vmap, match="order",
    )
    assert images.shape == (3, 16, 12, 1) and images.dtype == np.float32
    assert 0.0 <= images.min() and images.max() <= 1.0
    want = np.zeros(256, np.int32)
    for v, c in vmap.items():
        want[v] = c
    assert np.array_equal(labels, want[raw_masks])


def test_stem_matched_auto_compaction(tmp_path):
    raw_masks = _write_volume(tmp_path, "v2", levels=(0, 50, 200),
                              infix=False)
    images, labels, _ = load_png_volume(
        str(tmp_path / "v2" / "raw"), str(tmp_path / "v2" / "mask"),
    )
    # values 0/50/200 compact to 0/1/2
    lut = {0: 0, 50: 1, 200: 2}
    want = np.vectorize(lut.get)(raw_masks)
    assert np.array_equal(labels, want)


def test_iter_volumes(tmp_path):
    _write_volume(tmp_path, "patient1")
    _write_volume(tmp_path, "patient2")
    (tmp_path / "notes").mkdir()
    vols = list(iter_png_volumes(str(tmp_path)))
    assert [v["volume"] for v in vols] == ["patient1", "patient2"]
    assert vols[0]["images"].shape == (3, 16, 12, 1)
    assert vols[0]["labels"].shape == (3, 16, 12)


def test_iter_volumes_global_class_ids(tmp_path):
    # patient1 is missing level 128 entirely; per-volume compaction would
    # map level 255 to class 2 there but class 3 in patient2. The global
    # pre-scan must assign consistent ids across volumes.
    _write_volume(tmp_path, "patient1", levels=(0, 64, 255))
    _write_volume(tmp_path, "patient2", levels=(0, 64, 128, 255))
    vols = {v["volume"]: v for v in iter_png_volumes(str(tmp_path))}
    # global sorted values (0, 64, 128, 255) -> ids (0, 1, 2, 3)
    assert set(np.unique(vols["patient1"]["labels"])) <= {0, 1, 3}
    assert 2 not in np.unique(vols["patient1"]["labels"])
    assert set(np.unique(vols["patient2"]["labels"])) <= {0, 1, 2, 3}
