"""Duke DME .mat volume loader (Chiu et al. 2015 format).

The reference documents the dataset (``Datasets.md``) but ships no loader —
its only real-data pipeline is FourierNet's per-image cv2 reads
(``trainTestModels.py:38-59``). The BASELINE accuracy target ("Dice parity
on Duke DME layers") needs real volumes, so this module parses the public
distribution format directly:

Each ``Subject_*.mat`` holds (H=496, W=768, B=61) arrays:
- ``images``          uint8 B-scans
- ``manualLayers1/2`` (8, W, B) row positions of the 8 layer surfaces per
  A-scan (NaN where unannotated — only 11 of 61 B-scans have expert labels)
- ``manualFluid1/2``  (H, W, B) fluid annotation masks (NaN/0 background)

Labels are rasterized to per-pixel classes with the same convention as the
synthetic generator (``training.data``): 0 = background (vitreous above the
ILM and choroid below the last surface), 1..7 = retinal layers between
consecutive surfaces, 8 = fluid. A per-pixel validity mask marks A-scans
whose surfaces are annotated (metrics should ignore the rest).

Both MAT containers are supported: v5/v7 via ``scipy.io.loadmat`` and v7.3
(HDF5) via ``h5py`` (where MATLAB arrays arrive axis-reversed).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

DUKE_NUM_CLASSES = 9  # bg + 7 layers + fluid
FLUID_CLASS = 8


def _load_mat(path: str) -> dict:
    try:
        import scipy.io as sio

        return {
            k: np.asarray(v)
            for k, v in sio.loadmat(path).items()
            if not k.startswith("__")
        }
    except (NotImplementedError, ValueError):
        # MAT v7.3 = HDF5 (scipy raises NotImplementedError on real v7.3
        # files, ValueError on headerless HDF5); MATLAB order arrives
        # reversed.
        import h5py

        out = {}
        with h5py.File(path, "r") as f:
            for k in f.keys():
                arr = np.asarray(f[k])
                out[k] = arr.transpose(range(arr.ndim)[::-1])
        return out


def rasterize_surfaces(surfaces: np.ndarray, fluid: np.ndarray | None,
                       height: int):
    """(S, W) surface rows (+ optional (H, W) fluid mask) -> per-pixel labels.

    label(y, x) = number of surfaces at-or-above y while inside the retina
    (y in [surf_1, surf_S)); 0 outside; FLUID_CLASS where fluid. Columns with
    any NaN surface are marked invalid (labels forced 0, valid False).
    """
    S, W = surfaces.shape
    valid_cols = ~np.isnan(surfaces).any(axis=0)
    surf = np.where(valid_cols[None, :], surfaces, np.inf)
    rows = np.arange(height, dtype=np.float64)
    below = (rows.reshape(height, 1, 1) >= surf.reshape(1, S, W)).sum(axis=1)
    labels = np.where((below >= 1) & (below < S), below, 0).astype(np.int32)
    if fluid is not None:
        f = np.nan_to_num(np.asarray(fluid, np.float64)) > 0
        labels = np.where(f & valid_cols[None, :], FLUID_CLASS, labels)
    valid = np.broadcast_to(valid_cols[None, :], labels.shape)
    return labels, np.ascontiguousarray(valid)


def load_duke_dme_volume(path: str, annotator: int = 1):
    """-> (images (B, H, W, 1) float32 in [0,1], labels (B, H, W) int32,
    valid (B, H, W) bool). B iterates the volume's B-scans; only annotated
    slices carry nonzero ``valid``."""
    mat = _load_mat(path)
    images = np.asarray(mat["images"], np.float32) / 255.0  # (H, W, B)
    layers = np.asarray(mat[f"manualLayers{annotator}"], np.float64)
    fluid = mat.get(f"manualFluid{annotator}")
    H, W, B = images.shape
    labels = np.zeros((B, H, W), np.int32)
    valid = np.zeros((B, H, W), bool)
    for b in range(B):
        fl = None if fluid is None else np.asarray(fluid, np.float64)[:, :, b]
        labels[b], valid[b] = rasterize_surfaces(layers[:, :, b], fl, H)
    return images.transpose(2, 0, 1)[..., None], labels, valid


def annotated_slices(labels: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Indices of B-scans that carry any annotation."""
    return np.nonzero(valid.any(axis=(1, 2)))[0]


class DukeDMEDataset:
    """Epoch iterator over annotated Duke DME B-scans from a directory of
    ``Subject_*.mat`` files. Crops/pads to ``image_size`` (H, W) top-left,
    matching the Trainer's (images, labels) batch contract."""

    def __init__(self, root: str, batch_size: int = 8,
                 image_size: tuple[int, int] | None = None,
                 annotator: int = 1, shuffle: bool = True, seed: int = 0):
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.shuffle = shuffle
        imgs, labs = [], []
        files = sorted(
            f for f in os.listdir(root) if f.lower().endswith(".mat")
        )
        if not files:
            raise FileNotFoundError(f"no .mat volumes under {root}")
        for f in files:
            images, labels, valid = load_duke_dme_volume(
                os.path.join(root, f), annotator
            )
            for b in annotated_slices(labels, valid):
                img, lab = images[b], labels[b]
                if image_size is not None:
                    th, tw = image_size
                    img = img[:th, :tw]
                    lab = lab[:th, :tw]
                    ph, pw = th - img.shape[0], tw - img.shape[1]
                    if ph > 0 or pw > 0:
                        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
                        lab = np.pad(lab, ((0, ph), (0, pw)))
                imgs.append(img)
                labs.append(lab)
        self.images = np.stack(imgs)
        self.labels = np.stack(labs)
        self.steps_per_epoch = max(len(self.images) // batch_size, 1)

    def epoch(self, epoch_idx: int) -> Iterator[tuple]:
        idx = np.arange(len(self.images))
        if self.shuffle:
            self.rng.shuffle(idx)
        for s in range(self.steps_per_epoch):
            sel = idx[s * self.batch_size : (s + 1) * self.batch_size]
            yield self.images[sel], self.labels[sel]
