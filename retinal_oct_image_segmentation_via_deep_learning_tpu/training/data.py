"""Data pipelines: synthetic Duke-DME-shaped OCT volumes + on-disk loader.

The reference documents 21 public datasets (``Datasets.md:3-26``) but ships
no loader except FourierNet's per-image cv2 reads
(``trainTestModels.py:38-59``). Since the datasets cannot be downloaded in
this environment, the primary pipeline is a deterministic synthetic generator
producing retina-like B-scans (smooth layer boundaries, per-layer intensity,
multiplicative speckle, optional fluid pockets) with per-pixel layer labels —
shaped like Duke DME (512x512, ~8 layers + fluid + background).

Generation is pure-JAX and jit-able, so data can be synthesized *on device*
at far beyond north-star throughput; the host loop only feeds PRNG keys.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SyntheticOCTConfig:
    height: int = 512
    width: int = 512
    num_layers: int = 8  # retinal layers between ILM and BM
    fluid: bool = True  # lesion pockets (class num_layers+1)
    speckle: float = 0.35
    seed: int = 0

    @property
    def num_classes(self) -> int:
        # background + layers (+ fluid)
        return 1 + self.num_layers + (1 if self.fluid else 0)


def _smooth_curves(key, batch, width, num_layers, height):
    """(B, L+1, W) monotone layer boundary rows, smooth in W."""
    k1, k2, k3 = jax.random.split(key, 3)
    xs = jnp.linspace(0, 2 * jnp.pi, width)
    # low-frequency undulation per sample
    amp = jax.random.uniform(k1, (batch, 1, 3), minval=4.0, maxval=18.0)
    phase = jax.random.uniform(k2, (batch, 1, 3), minval=0, maxval=2 * jnp.pi)
    freq = jnp.array([1.0, 2.0, 3.0])[None, None, :]
    base = jnp.sum(
        amp * jnp.sin(freq * xs[None, :, None] + phase), axis=-1
    )  # (B, W)
    top = height * 0.25 + base
    # layer thicknesses (positive, summing to ~height/2)
    th = jax.random.uniform(k3, (batch, num_layers), minval=0.5, maxval=1.5)
    th = th / jnp.sum(th, axis=1, keepdims=True) * (height * 0.5)
    offsets = jnp.concatenate(
        [jnp.zeros((batch, 1)), jnp.cumsum(th, axis=1)], axis=1
    )  # (B, L+1)
    return top[:, None, :] + offsets[:, :, None]  # (B, L+1, W)


@partial(jax.jit, static_argnums=(1, 2))
def synth_batch(key, batch: int, cfg: SyntheticOCTConfig):
    """Generate (images (B,H,W,1) float32, labels (B,H,W) int32) on device."""
    H, W, L = cfg.height, cfg.width, cfg.num_layers
    kb, ki, ks, kf = jax.random.split(key, 4)
    bounds = _smooth_curves(kb, batch, W, L, H)  # (B, L+1, W)

    rows = jnp.arange(H)[None, :, None, None]  # (1, H, 1, 1)
    b = bounds[:, None, :, :]  # (B, 1, L+1, W)
    # label = number of boundaries at/above this row: 0 = vitreous above ILM,
    # 1..L = retinal layers, L+1 = below BM -> background again.
    above = jnp.sum(rows >= b, axis=2)  # (B, H, W)
    labels = jnp.where(above > L, 0, above).astype(jnp.int32)

    # per-layer base reflectivity (layers alternate bright/dark like OCT)
    refl = jnp.concatenate(
        [
            jnp.full((1,), 0.05),  # vitreous/background
            0.35 + 0.5 * (jnp.arange(L) % 2).astype(jnp.float32) * 0.6,
        ]
    )
    intensity = refl[labels]

    if cfg.fluid:
        # elliptical hypo-reflective pockets in mid layers
        cy = jax.random.uniform(kf, (batch, 1, 1), minval=0.45, maxval=0.6) * H
        cx = jax.random.uniform(ks, (batch, 1, 1), minval=0.2, maxval=0.8) * W
        ry = jax.random.uniform(ki, (batch, 1, 1), minval=8.0, maxval=30.0)
        rx = ry * jax.random.uniform(kf, (batch, 1, 1), minval=1.5, maxval=3.0)
        yy = jnp.arange(H)[None, :, None]
        xx = jnp.arange(W)[None, None, :]
        ell = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        in_retina = (labels > 0) & (labels <= L)
        fluid_mask = ell & in_retina
        labels = jnp.where(fluid_mask, L + 1, labels)
        intensity = jnp.where(fluid_mask, 0.08, intensity)

    # multiplicative speckle + additive noise
    noise = jax.random.gamma(ki, 4.0, (batch, H, W)) / 4.0
    img = intensity * (1.0 + cfg.speckle * (noise - 1.0))
    img = img + 0.02 * jax.random.normal(ks, (batch, H, W))
    return img[..., None].astype(jnp.float32), labels


class SyntheticOCTDataset:
    """Epoch iterator over deterministic on-device synthetic batches."""

    def __init__(self, cfg: SyntheticOCTConfig, num_samples: int, batch_size: int):
        self.cfg = cfg
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.steps_per_epoch = max(num_samples // batch_size, 1)

    def epoch(self, epoch_idx: int):
        base = jax.random.PRNGKey(self.cfg.seed)
        for step in range(self.steps_per_epoch):
            key = jax.random.fold_in(
                jax.random.fold_in(base, epoch_idx), step
            )
            yield synth_batch(key, self.batch_size, self.cfg)


def numpy_folder_dataset(images: np.ndarray, labels: np.ndarray, batch_size: int,
                         shuffle: bool = True, seed: int = 0):
    """Minimal host loader for real data already in arrays (N,H,W,1)/(N,H,W)."""
    n = images.shape[0]
    rng = np.random.default_rng(seed)
    idx = np.arange(n)

    def epoch(_epoch_idx: int):
        if shuffle:
            rng.shuffle(idx)
        for i in range(0, n - batch_size + 1, batch_size):
            sel = idx[i : i + batch_size]
            yield jnp.asarray(images[sel]), jnp.asarray(labels[sel])

    ds = type("Ds", (), {})()
    ds.epoch = epoch
    ds.steps_per_epoch = n // batch_size
    return ds


# ---------------------------------------------------------------------------
# dataset spec dispatcher: one string selects synthetic or a real-data loader
# ---------------------------------------------------------------------------


def _crop_pad(img: np.ndarray, lab: np.ndarray, size):
    th, tw = size
    img, lab = img[:th, :tw], lab[:th, :tw]
    ph, pw = th - img.shape[0], tw - img.shape[1]
    if ph > 0 or pw > 0:
        img = np.pad(img, ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2))
        lab = np.pad(lab, ((0, ph), (0, pw)))
    return img, lab


def load_real_dataset(spec: str, image_size, return_volumes: bool = False):
    """'duke:<dir>' | 'retouch:<dir>' | 'png:<dir>' ->
    (images (N,H,W,1) f32, labels (N,H,W) i32, num_classes[, vol_ids]).

    Only labeled B-scans are kept; volumes are flattened into one B-scan
    pool, cropped/padded top-left to ``image_size`` (the Duke convention).
    With ``return_volumes=True`` also returns a per-B-scan int volume id so
    callers can split train/val at volume granularity.
    """
    kind, _, root = spec.partition(":")
    if not root:
        raise ValueError(f"dataset spec needs a path: '{spec}'")
    imgs, labs, vols = [], [], []
    if kind == "duke":
        from .duke import annotated_slices, load_duke_dme_volume

        files = sorted(
            f for f in os.listdir(root) if f.lower().endswith(".mat")
        )
        for v, f in enumerate(files):
            images, labels, valid = load_duke_dme_volume(
                os.path.join(root, f)
            )
            for b in annotated_slices(labels, valid):
                imgs.append(images[b])
                labs.append(labels[b])
                vols.append(v)
    elif kind == "retouch":
        from .retouch import iter_cases

        for v, case in enumerate(iter_cases(root)):
            if case["labels"] is None:
                continue
            for b in range(case["images"].shape[0]):
                imgs.append(case["images"][b][..., None])
                labs.append(case["labels"][b])
                vols.append(v)
    elif kind == "png":
        from .png_volumes import iter_png_volumes

        for v, vol in enumerate(iter_png_volumes(root)):
            if vol["labels"] is None:
                continue
            for b in range(vol["images"].shape[0]):
                imgs.append(vol["images"][b])
                labs.append(vol["labels"][b])
                vols.append(v)
    else:
        raise ValueError(f"unknown dataset kind '{kind}'")
    if not imgs:
        raise FileNotFoundError(f"no labeled B-scans under {root}")
    pairs = [_crop_pad(i, l, image_size) for i, l in zip(imgs, labs)]
    images = np.stack([p[0] for p in pairs]).astype(np.float32)
    labels = np.stack([p[1] for p in pairs]).astype(np.int32)
    out = (images, labels, int(labels.max()) + 1)
    return out + (np.asarray(vols),) if return_volumes else out


def make_datasets(spec: str, image_size, batch_size: int,
                  num_train: int = 128, num_val: int = 16,
                  val_fraction: float = 0.1, seed: int = 0):
    """-> (train_ds, val_ds, num_classes | None).

    spec: 'synthetic' (on-device generator; num_classes from the caller) or
    a real-data spec for ``load_real_dataset``. The validation split holds
    out WHOLE volumes (last volumes until >= ``val_fraction`` of B-scans) so
    adjacent near-duplicate B-scans of one volume never straddle the split;
    with a single volume it falls back to a B-scan index split.
    """
    if spec in (None, "", "synthetic", "synthetic_duke_dme"):
        return None  # caller builds the synthetic datasets (needs classes)
    images, labels, num_classes, vols = load_real_dataset(
        spec, image_size, return_volumes=True
    )
    n = images.shape[0]
    n_val = max(int(n * val_fraction), min(batch_size, n // 2))
    unique_vols = np.unique(vols)
    if len(unique_vols) > 1:
        counts = {v: int(np.sum(vols == v)) for v in unique_vols}
        val_vols, acc = [], 0
        for v in unique_vols[::-1]:
            if acc >= n_val or len(val_vols) >= len(unique_vols) - 1:
                break
            val_vols.append(v)
            acc += counts[v]
        is_val = np.isin(vols, val_vols)
    else:
        is_val = np.arange(n) >= n - n_val
    train = numpy_folder_dataset(
        images[~is_val], labels[~is_val], batch_size, seed=seed
    )
    val = numpy_folder_dataset(
        images[is_val], labels[is_val], batch_size, shuffle=False
    )
    return train, val, num_classes
