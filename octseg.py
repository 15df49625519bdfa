"""Convenience alias: ``import octseg`` for the (long) canonical package.

Registers the canonical package and its submodules under the short name so
``octseg.models``, ``octseg.metrics`` etc. resolve.
"""

import importlib
import sys

_pkg = importlib.import_module(
    "retinal_oct_image_segmentation_via_deep_learning_tpu"
)
sys.modules[__name__] = _pkg
