"""FourierNet train/test pipeline — the reference's only full training loop.

Capability source: reference
``SOTAS/Layers_Segment/FourierNet/trainTestModels.py``:
- data: image read + per-image z-score (``readOneImage``, :13-36), FD-map
  targets (precomputed by ``ops.fd``; the reference loads ``np.loadtxt``
  files) z-scored, gold masks binarized and one-hot'ed (``taskLists``,
  :78-92);
- training (``trainModel``, :94-107): multi-head loss = MSE per FD head +
  categorical cross-entropy on the 2-class head, Adadelta optimizer
  (``deepModels.py:62``), up to ``max_epochs`` with best-val-loss
  checkpointing and EarlyStopping(patience) restore (:71-76);
- inference (``testUnet``, :128-133): rebuild + load weights, batched
  predict, export class-1 probability maps (:170-174).

Differences by design: batched jit train steps on device (the reference runs
batch=1 Keras fit with per-image Python I/O), Orbax checkpoints instead of
HDF5.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.fouriernet import FourierNet
from ..ops.fd import fd_maps
from .checkpoint import EarlyStopping


def zscore_image(img: np.ndarray) -> np.ndarray:
    """Per-image z-score (reference readOneImage, :17)."""
    return (img - img.mean()) / (img.std() + 1e-7)


def list_image_files(directory: str) -> list[str]:
    """Sorted image filenames in a directory (reference ``listAllImageFiles``,
    :62-69)."""
    import os

    exts = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")
    return sorted(
        f for f in os.listdir(directory) if f.lower().endswith(exts)
    )


def read_folder_dataset(image_dir: str, gold_dir: str | None = None):
    """Load (images, masks) arrays from image/gold directories via cv2 —
    the reference's ``readOneDataset`` flow (:38-59) without the per-image
    Python in the hot loop (arrays are batched once, preprocessing runs on
    device)."""
    import os

    import cv2

    names = list_image_files(image_dir)
    images, masks = [], []
    for n in names:
        img = cv2.imread(os.path.join(image_dir, n), cv2.IMREAD_GRAYSCALE)
        images.append(img.astype(np.float32))
        if gold_dir is not None:
            gold = cv2.imread(os.path.join(gold_dir, n), cv2.IMREAD_GRAYSCALE)
            masks.append((gold > 0).astype(np.uint8))  # binarize (:31-34)
    images = np.stack(images)
    masks = np.stack(masks) if masks else None
    return images, masks, names


def prepare_dataset(images: np.ndarray, masks: np.ndarray, fd_channel: int = 1):
    """Build (inputs, fd_targets, onehot_masks) arrays from raw images+masks.

    Mirrors ``taskLists`` (:78-92): z-scored inputs, z-scored FD maps, one-hot
    binarized gold. ``images``: (N, H, W); ``masks``: (N, H, W) binary.
    """
    xs, fds, ys = [], [], []
    for img, msk in zip(images, masks):
        xs.append(zscore_image(img.astype(np.float64))[..., None])
        fd = fd_maps((msk > 0).astype(np.uint8), fd_channel)
        fds.append(zscore_image(fd))
        onehot = np.zeros(msk.shape + (2,))
        binm = (msk > 0).astype(int)
        onehot[..., 0] = 1 - binm
        onehot[..., 1] = binm
        ys.append(onehot)
    return (
        np.stack(xs).astype(np.float32),
        np.stack(fds).astype(np.float32),
        np.stack(ys).astype(np.float32),
    )


@dataclasses.dataclass
class FourierNetTrainer:
    fd_channel: int = 1
    features: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: float = 0.2
    learning_rate: float = 0.01  # reference main, :158
    max_epochs: int = 500  # reference trainModel, :105
    patience: int = 50  # reference createCallbacks, :74
    batch_size: int = 4
    seed: int = 0

    def __post_init__(self):
        self.model = FourierNet(
            fd_channel=self.fd_channel,
            features=tuple(self.features),
            dropout=self.dropout,
        )
        self.tx = optax.adadelta(self.learning_rate)

    # -- loss: sum of per-head MSE + CCE (deepModels.py:85-89) -------------
    def _loss(self, params, batch, rngs):
        x, fd_t, y_t = batch
        fd_maps_out, final = self.model.apply(
            {"params": params}, x, train=bool(rngs), rngs=rngs
        )
        loss = 0.0
        for i in range(self.fd_channel):
            loss = loss + jnp.mean(
                (fd_maps_out[i][..., 0] - fd_t[..., i]) ** 2
            )
        cce = -jnp.mean(
            jnp.sum(y_t * jnp.log(jnp.clip(final, 1e-7, 1.0)), axis=-1)
        )
        return loss + cce

    def init(self, sample_x):
        params = self.model.init(
            jax.random.PRNGKey(self.seed), sample_x, train=False
        )["params"]
        return params, self.tx.init(params)

    def fit(self, train_data, val_data):
        """train/val data: tuples from :func:`prepare_dataset`."""
        x, fd_t, y_t = train_data
        params, opt_state = self.init(x[:1])

        @jax.jit
        def step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(self._loss)(
                params, batch, {"dropout": rng}
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def val_loss_fn(params, batch):
            return self._loss(params, batch, {})

        stopper = EarlyStopping(self.patience)
        best_params = params
        n = x.shape[0]
        rng = jax.random.PRNGKey(self.seed + 1)
        history = []
        for epoch in range(self.max_epochs):
            rng, shuf, drop = jax.random.split(rng, 3)
            order = np.asarray(
                jax.random.permutation(shuf, n)
            )  # shuffle=True (:106)
            ep_loss, nb = 0.0, 0
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                sel = order[i : i + self.batch_size]
                drop = jax.random.fold_in(drop, i)
                params, opt_state, loss = step(
                    params, opt_state, (x[sel], fd_t[sel], y_t[sel]), drop
                )
                ep_loss += float(loss)
                nb += 1
            vloss = float(val_loss_fn(params, val_data))
            history.append(
                {"epoch": epoch, "loss": ep_loss / max(nb, 1), "val_loss": vloss}
            )
            if vloss < stopper.best:
                best_params = params
            if stopper.update(epoch, vloss):
                break
        self.history = history
        return best_params

    def predict(self, params, x, batch_size: int = 4):
        """Class-1 probability maps (testUnet/:170-174 export convention)."""
        @jax.jit
        def fwd(params, xb):
            _, final = self.model.apply({"params": params}, xb, train=False)
            return final[..., 1]

        outs = [
            np.asarray(fwd(params, x[i : i + batch_size]))
            for i in range(0, x.shape[0], batch_size)
        ]
        return np.concatenate(outs)
