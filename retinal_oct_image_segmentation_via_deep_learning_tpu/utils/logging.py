"""Host-side metric logging (CSV / JSONL).

The reference's observability is ``print()`` statements and Keras progress
bars (SURVEY.md §5); here per-epoch records stream to JSONL (and optionally
CSV) for downstream tooling.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Any, Mapping


class MetricLogger:
    def __init__(self, path: str | None = None, also_print: bool = True):
        self.path = path
        self.also_print = also_print
        self._csv_writer = None
        self._csv_file = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, record: Mapping[str, Any]):
        rec = {k: _to_py(v) for k, v in record.items()}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.also_print:
            parts = [f"{k}={_fmt(v)}" for k, v in rec.items()]
            print("  ".join(parts), flush=True)

    def close(self):
        if self._csv_file:
            self._csv_file.close()


def _to_py(v):
    try:
        import numpy as np

        if isinstance(v, (np.generic,)):
            return v.item()
        if hasattr(v, "tolist"):
            return v.tolist()
    except Exception:
        pass
    return v


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.5g}"
    return v


def export_prob_maps(probs, directory: str, names=None, fmt: str = "%.8g"):
    """Export per-image probability maps as text files — the reference's
    inference output convention (``trainTestModels.py:170-174``)."""
    import numpy as np

    os.makedirs(directory, exist_ok=True)
    probs = np.asarray(probs)
    for i in range(probs.shape[0]):
        name = names[i] if names else f"prob_{i:04d}.txt"
        np.savetxt(os.path.join(directory, name), probs[i], fmt=fmt)
