"""Numeric sanitizers (SURVEY.md §5: the realistic failure class in a
functional JAX stack is numeric, not races).

- ``nan_debugging()``: context manager enabling jax's NaN checker
  (``jax_debug_nans``) so the first NaN-producing primitive raises with a
  traceback.
- ``assert_finite(tree, name)``: host-side check for use at epoch
  boundaries / checkpoint time.
- ``find_nonfinite(tree)``: paths of non-finite leaves for diagnostics.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


@contextlib.contextmanager
def nan_debugging(enabled: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def find_nonfinite(tree) -> list[str]:
    bad = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    return bad


def assert_finite(tree, name: str = "tree"):
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}: {', '.join(bad[:10])}"
            + ("..." if len(bad) > 10 else "")
        )
