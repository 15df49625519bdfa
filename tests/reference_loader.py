"""Load reference implementations (torch) for parity ground truth.

SURVEY.md §6: "Accuracy ground truth for parity checks must be produced by
running the reference implementations directly". Modules are loaded from
/root/reference by path; tests are skipped gracefully if the tree is absent
(e.g. CI without the reference mount).
"""

import importlib.util
import sys
from pathlib import Path

import pytest

REF = Path("/root/reference")


def load_reference(rel_path: str, name: str):
    path = REF / rel_path
    if not path.exists():
        pytest.skip(f"reference not mounted: {path}")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
