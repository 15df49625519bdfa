"""Orbax checkpointing: (params, batch_stats, opt_state, step) + best-metric
retention and restore-for-eval.

Replaces the reference's two ad-hoc mechanisms — whole-module torch pickle
(``ReLayNet_2017.py:117-126``) and Keras best-val-loss weights-only HDF5
ModelCheckpoint + EarlyStopping restore (``trainTestModels.py:71-76``) — with
a single async-capable Orbax manager.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 1):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            best_fn=lambda m: m.get("val_loss", float("inf")),
            best_mode="min",
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: dict | None = None):
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics=metrics or {},
        )

    def restore_best(self, template: Any):
        step = self._mgr.best_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_latest(self, template: Any):
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_model(path: str, state: Any):
    """One-call whole-state save (the role of ``ReLayNet.save``,
    ``ReLayNet_2017.py:117-126`` — which pickles the module and has no load
    path in the reference; here both directions exist)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state)
    ckptr.wait_until_finished()
    ckptr.close()


def load_model(path: str, template: Any):
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), template)
    ckptr.close()
    return out


class EarlyStopping:
    """Best-val tracking + patience, mirroring the reference Keras callbacks
    (EarlyStopping(patience=50, restore_best_weights=True),
    ``trainTestModels.py:74-76``)."""

    def __init__(self, patience: int | None):
        self.patience = patience
        self.best = float("inf")
        self.best_step = -1
        self.bad_epochs = 0

    def update(self, step: int, val_loss: float) -> bool:
        """Record a validation result; returns True if training should stop."""
        if val_loss < self.best:
            self.best = val_loss
            self.best_step = step
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.patience is not None and self.bad_epochs >= self.patience
