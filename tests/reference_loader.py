"""Load reference implementations (torch) for parity ground truth.

SURVEY.md §6: "Accuracy ground truth for parity checks must be produced by
running the reference implementations directly". Modules are loaded from
/root/reference by path; tests are skipped gracefully if the tree is absent
(e.g. CI without the reference mount).
"""

import importlib.util
import sys
import types
from pathlib import Path

import pytest

REF = Path("/root/reference")


def randomize_torch(model, seed: int = 0):
    """Re-initialize a torch reference model with variance-preserving weights.

    Torch's default conv init shrinks activation variance ~3x per layer, so an
    untrained net's deep-layer signal decays below parity tolerance and a
    parity test would only exercise the first blocks + bias plumbing (found
    empirically: zeroing whole mid-network conv kernels moved the output by
    <1e-6). Kaiming-magnitude weights + randomized BN affine/running stats
    keep every layer's contribution O(1), making the 1e-4 comparison strict.
    """
    import math

    import torch

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            cls = type(m).__name__
            if "BatchNorm" in cls or "GroupNorm" in cls or "LayerNorm" in cls:
                if getattr(m, "weight", None) is not None:
                    m.weight.uniform_(0.8, 1.2, generator=gen)
                if getattr(m, "bias", None) is not None:
                    m.bias.normal_(0, 0.1, generator=gen)
                if getattr(m, "running_mean", None) is not None:
                    m.running_mean.normal_(0, 0.1, generator=gen)
                if getattr(m, "running_var", None) is not None:
                    m.running_var.uniform_(0.5, 1.5, generator=gen)
            elif hasattr(m, "weight") and getattr(m, "weight", None) is not None \
                    and m.weight.dim() >= 2:
                fan_in = m.weight[0].numel()
                if "ConvTranspose" in cls:
                    # weight (in, out, kh, kw): fan_in for the op is
                    # in_ch * k * k / stride^2-ish; plain kaiming is fine
                    fan_in = m.weight.shape[0] * m.weight[0, 0].numel()
                m.weight.normal_(0, math.sqrt(2.0 / fan_in), generator=gen)
                if getattr(m, "bias", None) is not None:
                    m.bias.normal_(0, 0.1, generator=gen)
    return model


def stub_timm():
    """Provide the two timm.models.layers symbols the reference imports
    (LightReSeg_2024.py:5,11) — timm itself is not installed here."""
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as tnn

    class DropPath(tnn.Module):  # imported but unused by the reference
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm = types.ModuleType("timm")
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def load_reference(rel_path: str, name: str):
    path = REF / rel_path
    if not path.exists():
        pytest.skip(f"reference not mounted: {path}")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
