"""Unified trainer: pjit-sharded data-parallel train/eval over a device mesh.

The reference has exactly one training loop (Keras ``model.fit`` with batch=1
and per-image Python I/O, ``trainTestModels.py:94-107``). This trainer drives
*any* registry model: batch sharded over the mesh "data" axis via
NamedSharding, parameters replicated, gradient all-reduce emitted by XLA —
no hand-written collectives on the DP path.

Per-epoch: train steps -> val loss + per-class Dice -> Orbax best-checkpoint
-> early stopping (patience semantics from the reference callbacks,
``trainTestModels.py:71-76``).
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import TrainConfig
from ..metrics.region import per_class_dice
from ..parallel.mesh import DATA_AXIS, local_mesh
from ..registry import get_model
from ..utils.dtype import resolve_dtype
from .checkpoint import CheckpointManager, EarlyStopping
from .losses import get_loss
from .train_state import TrainState, create_train_state


def make_train_step(model, loss_fn: Callable, class_weights=None,
                    remat: str | None = None):
    """remat="full" recomputes the whole forward in the backward
    (jax.checkpoint around model.apply) — trades ~1.3x FLOPs for dropping
    all activation residuals, which can beat XLA's own rematerialization
    under memory pressure (A/B via perf/loss_bisect.py)."""
    import os as _os

    remat = remat or _os.environ.get("OCTSEG_TRAIN_REMAT") or None

    def train_step(state: TrainState, images, labels):
        def loss_of(params):
            variables = {"params": params}
            has_stats = state.batch_stats is not None and state.batch_stats
            if has_stats:
                variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"] if has_stats else []

            def fwd(v, x):
                return model.apply(v, x, train=True, mutable=mutable)

            if remat == "full":
                fwd = jax.checkpoint(fwd)
            out = fwd(variables, images)
            logits, updates = out if isinstance(out, tuple) else (out, {})
            loss = loss_fn(logits, labels, class_weights)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        if updates:
            state = state.replace(batch_stats=updates["batch_stats"])
        return state, loss

    return train_step


def make_eval_step(model, loss_fn: Callable, num_classes: int,
                   class_weights=None):
    def eval_step(state: TrainState, images, labels):
        variables = {"params": state.params}
        if state.batch_stats is not None and state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, images, train=False)
        loss = loss_fn(logits, labels, class_weights)
        preds = jnp.argmax(logits, axis=-1)
        dice = per_class_dice(labels, preds, num_classes)
        return loss, dice

    return eval_step


class Trainer:
    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else local_mesh()
        dtype = resolve_dtype(cfg.compute_dtype)
        self.model = get_model(
            cfg.model.name,
            in_channels=cfg.model.in_channels,
            num_classes=cfg.model.num_classes,
            dtype=dtype,
            **cfg.model.kwargs,
        )
        self.loss_fn = get_loss(cfg.loss)
        self.class_weights = (
            jnp.asarray(cfg.class_weights) if cfg.class_weights else None
        )
        self._batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        self._rep = NamedSharding(self.mesh, P())
        self.ckpt = (
            CheckpointManager(cfg.checkpoint_dir, cfg.keep_checkpoints)
            if cfg.checkpoint_dir
            else None
        )
        self.history: list[dict] = []

    # -- setup ------------------------------------------------------------
    def init_state(self, sample_images) -> TrainState:
        variables = self.model.init(
            jax.random.PRNGKey(self.cfg.seed), sample_images
        )
        state = create_train_state(self.model, variables, self.cfg.optim)
        return jax.device_put(state, self._rep)

    def _preprocess(self, images):
        d = self.cfg.data
        if d.flatten_retina or d.denoise or d.normalize:
            from ..ops.preprocess import preprocess

            images = preprocess(
                images,
                flatten=d.flatten_retina,
                denoise=d.denoise,
                normalize=d.normalize,
            )
        return images

    def _shard(self, images, labels):
        images = self._preprocess(images)
        put = lambda x: jax.device_put(
            x, NamedSharding(self.mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        )
        return put(images), put(labels)

    # -- loops ------------------------------------------------------------
    def fit(self, train_ds, val_ds=None, state: TrainState | None = None):
        cfg = self.cfg
        if state is None:
            images, labels = next(iter(train_ds.epoch(0)))
            state = self.init_state(images[:1])

        if cfg.packed_train:
            if cfg.model.name != "unet":
                raise ValueError(
                    "packed_train supports only the flagship 'unet' model, "
                    f"got {cfg.model.name!r}"
                )
            from .packed_unet import make_packed_train_step

            step_fn = make_packed_train_step(
                self.loss_fn, self.class_weights,
                remat=cfg.packed_train == "remat",
            )
        else:
            step_fn = make_train_step(
                self.model, self.loss_fn, self.class_weights
            )
        train_step = jax.jit(step_fn, donate_argnums=0)
        eval_step = jax.jit(
            make_eval_step(
                self.model, self.loss_fn, cfg.model.num_classes,
                self.class_weights,
            )
        )
        stopper = EarlyStopping(cfg.early_stop_patience)
        best_state = state

        for epoch in range(cfg.num_epochs):
            t0 = time.perf_counter()
            train_loss = 0.0
            nsteps = 0
            # Double-buffered ingest: preprocess + DP device_put of batch
            # k+1 overlaps the step on batch k (training/input_pipeline.py).
            # steps_per_epoch bounds the SOURCE iterator (islice) so the
            # producer thread always drains and exits.
            import itertools

            from .input_pipeline import prefetch_to_device

            epoch_iter = train_ds.epoch(epoch)
            if cfg.steps_per_epoch:
                epoch_iter = itertools.islice(epoch_iter, cfg.steps_per_epoch)
            batches = prefetch_to_device(
                epoch_iter, transform=lambda b: self._shard(*b)
            )
            for images, labels in batches:
                state, loss = train_step(state, images, labels)
                train_loss += float(loss)
                nsteps += 1
            record: dict[str, Any] = {
                "epoch": epoch,
                "train_loss": train_loss / max(nsteps, 1),
                "time_s": time.perf_counter() - t0,
            }

            if val_ds is not None and (epoch + 1) % cfg.eval_every_epochs == 0:
                vloss, vdice, vn = 0.0, None, 0
                for images, labels in val_ds.epoch(epoch):
                    images, labels = self._shard(images, labels)
                    loss, dice = eval_step(state, images, labels)
                    vloss += float(loss)
                    vdice = dice if vdice is None else vdice + dice
                    vn += 1
                record["val_loss"] = vloss / max(vn, 1)
                record["val_dice"] = (
                    jnp.asarray(vdice / max(vn, 1)).tolist()
                    if vdice is not None
                    else None
                )
                if self.ckpt:
                    self.ckpt.save(
                        epoch, jax.device_get(state),
                        {"val_loss": record["val_loss"]},
                    )
                if record["val_loss"] < stopper.best:
                    best_state = state
                if stopper.update(epoch, record["val_loss"]):
                    self.history.append(record)
                    break
            self.history.append(record)
        if self.ckpt:
            self.ckpt.wait()
        return best_state if val_ds is not None else state

    def evaluate(self, state: TrainState, dataset, epoch: int = 0,
                 contour_metrics: bool = True, max_points: int = 1024,
                 predict_fn=None):
        """Full on-device metric suite over a dataset (BASELINE config 5):
        per-class Dice/IoU/sensitivity/specificity/precision + confusion
        matrix in one aggregated confusion pass, plus (``contour_metrics``)
        per-class HD95/ASSD and thickness/vascularity differences — all five
        reference metric families (SURVEY.md §2.1) in one call.

        ``predict_fn(state, images) -> (B, H, W) labels`` overrides the fp32
        model forward — e.g. a quantized serving graph, so the SAME metric
        suite measures PTQ accuracy cost (cli eval --quantize int8)."""
        import numpy as np

        from ..metrics.volume import volume_boundary_metrics, volume_confusion

        if predict_fn is None:
            predict_fn = self.predict
        nc = self.cfg.model.num_classes
        cm = jnp.zeros((nc, nc), jnp.float32)
        bnd_sums: dict[str, Any] = {}
        valid_count = jnp.zeros((nc,), jnp.float32)
        n_slices = 0
        for images, labels in dataset.epoch(epoch):
            preds = predict_fn(state, images)
            cm = cm + volume_confusion(labels, preds, nc)
            if contour_metrics:
                b = volume_boundary_metrics(labels, preds, nc, max_points)
                v = b["valid"].astype(jnp.float32)  # (B, nc)
                valid_count = valid_count + jnp.sum(v, axis=0)
                n_slices += labels.shape[0]
                for k in ("hd95", "assd"):
                    s = jnp.sum(jnp.where(b["valid"], b[k], 0.0), axis=0)
                    bnd_sums[k] = bnd_sums.get(k, 0.0) + s
                for k in ("thickness_diff", "vi_diff"):
                    bnd_sums[k] = bnd_sums.get(k, 0.0) + jnp.sum(b[k], axis=0)
        # derive the metric dict from the aggregated confusion matrix
        total = jnp.sum(cm)
        tp = jnp.diag(cm)
        fp = jnp.sum(cm, axis=0) - tp
        fn = jnp.sum(cm, axis=1) - tp
        tn = total - tp - fp - fn
        eps = 1e-7
        out = {
            "confusion": np.asarray(cm),
            "dice": np.asarray(2 * tp / (2 * tp + fp + fn + eps)),
            "iou": np.asarray(tp / (tp + fp + fn + eps)),
            "sensitivity": np.asarray(tp / (tp + fn + eps)),
            "specificity": np.asarray(tn / (tn + fp + eps)),
            "precision": np.asarray(tp / (tp + fp + eps)),
            "pixel_accuracy": float(jnp.sum(tp) / jnp.maximum(total, 1.0)),
        }
        if contour_metrics and n_slices:
            denom = jnp.maximum(valid_count, 1.0)
            out["hd95"] = np.asarray(bnd_sums["hd95"] / denom)
            out["assd"] = np.asarray(bnd_sums["assd"] / denom)
            out["thickness_diff"] = np.asarray(
                bnd_sums["thickness_diff"] / n_slices
            )
            out["vi_diff"] = np.asarray(bnd_sums["vi_diff"] / n_slices)
            out["contour_valid_slices"] = np.asarray(valid_count)
        return out

    # -- inference --------------------------------------------------------
    def predict(self, state: TrainState, images):
        images = self._preprocess(images)
        variables = {"params": state.params}
        if state.batch_stats is not None and state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False)
        )(variables, images)
        return jnp.argmax(logits, axis=-1)
