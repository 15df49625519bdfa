"""Duke DME .mat loader: synthetic-format round-trip (v5 and v7.3/HDF5)."""

import numpy as np
import pytest

from retinal_oct_image_segmentation_via_deep_learning_tpu.training.duke import (
    DUKE_NUM_CLASSES,
    FLUID_CLASS,
    DukeDMEDataset,
    annotated_slices,
    load_duke_dme_volume,
    rasterize_surfaces,
)


def _fake_volume(H=64, W=48, B=5, S=8, annotated=(1, 3)):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (H, W, B)).astype(np.uint8)
    layers = np.full((S, W, B), np.nan)
    fluid = np.zeros((H, W, B))
    for b in annotated:
        base = np.linspace(10, 14, W)
        for s in range(S):
            layers[s, :, b] = base + s * 5
        fluid[30:35, 10:20, b] = 255
    return images, layers, fluid


def _check(images, labels, valid):
    assert images.shape == (5, 64, 48, 1) and images.dtype == np.float32
    assert labels.shape == (5, 64, 48)
    assert list(annotated_slices(labels, valid)) == [1, 3]
    b = labels[1]
    # above ILM -> 0; inside layer s -> s; below last surface -> 0
    assert b[5, 0] == 0
    assert b[12, 0] == 1  # between surf1 (10) and surf2 (15)
    assert b[52, 0] == 0  # below surf8 (45+... = 10+7*5=45, +? ) choroid
    assert (labels[1][30:35, 10:20] == FLUID_CLASS).all()
    assert labels.max() < DUKE_NUM_CLASSES
    assert not valid[0].any() and valid[1].all()


def test_load_duke_v5(tmp_path):
    import scipy.io as sio

    images, layers, fluid = _fake_volume()
    sio.savemat(tmp_path / "Subject_01.mat",
                {"images": images, "manualLayers1": layers,
                 "manualFluid1": fluid})
    _check(*load_duke_dme_volume(str(tmp_path / "Subject_01.mat")))


def test_load_duke_v73_hdf5(tmp_path):
    h5py = pytest.importorskip("h5py")
    images, layers, fluid = _fake_volume()
    path = tmp_path / "Subject_02.mat"
    with h5py.File(path, "w") as f:  # MATLAB v7.3 stores axis-reversed
        f["images"] = images.transpose(2, 1, 0)
        f["manualLayers1"] = layers.transpose(2, 1, 0)
        f["manualFluid1"] = fluid.transpose(2, 1, 0)
    # scipy raises NotImplementedError on HDF5 -> h5py fallback path
    _check(*load_duke_dme_volume(str(path)))


def test_rasterize_nan_columns():
    surf = np.array([[10.0, np.nan], [20.0, np.nan]])
    labels, valid = rasterize_surfaces(surf, None, 32)
    assert valid[:, 0].all() and not valid[:, 1].any()
    assert labels[15, 0] == 1 and labels[15, 1] == 0


def test_duke_dataset_batches(tmp_path):
    import scipy.io as sio

    images, layers, fluid = _fake_volume()
    sio.savemat(tmp_path / "Subject_01.mat",
                {"images": images, "manualLayers1": layers,
                 "manualFluid1": fluid})
    ds = DukeDMEDataset(str(tmp_path), batch_size=2, image_size=(32, 64))
    batches = list(ds.epoch(0))
    assert len(batches) == ds.steps_per_epoch == 1
    xb, yb = batches[0]
    assert xb.shape == (2, 32, 64, 1) and yb.shape == (2, 32, 64)
