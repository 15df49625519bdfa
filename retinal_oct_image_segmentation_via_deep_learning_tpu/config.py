"""Dataclass configuration system.

The reference has no config layer — hyper-parameters live in constructor
defaults and hard-coded ``main`` constants (reference
``SOTAS/Layers_Segment/FourierNet/trainTestModels.py:137-164``). Here a small
frozen-dataclass tree drives a single CLI/trainer for every model in the zoo.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence


@dataclasses.dataclass
class ModelConfig:
    """Which architecture to build and its constructor overrides."""

    name: str = "unet"
    in_channels: int = 1
    num_classes: int = 10
    # Free-form per-architecture kwargs forwarded to the registry constructor.
    kwargs: dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class OptimConfig:
    optimizer: str = "adam"  # adam | adamw | sgd | adadelta
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    momentum: float = 0.9
    grad_clip_norm: float | None = None
    # Linear warmup steps then cosine decay to `lr_min_ratio * learning_rate`.
    warmup_steps: int = 0
    decay_steps: int | None = None
    lr_min_ratio: float = 0.0


@dataclasses.dataclass
class DataConfig:
    dataset: str = "synthetic_duke_dme"
    image_size: tuple[int, int] = (512, 512)
    batch_size: int = 8
    # On-device preprocessing toggles (see ops/preprocess.py).
    flatten_retina: bool = False
    denoise: bool = False
    normalize: bool = True
    num_train: int = 128
    num_val: int = 16
    seed: int = 0


@dataclasses.dataclass
class TrainConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    loss: str = "dice_ce"
    class_weights: Sequence[float] | None = None
    num_epochs: int = 10
    steps_per_epoch: int | None = None
    eval_every_epochs: int = 1
    # Early stopping on val loss, mirroring the reference Keras callbacks
    # (trainTestModels.py:71-76): best-checkpoint retention + patience.
    early_stop_patience: int | None = 50
    checkpoint_dir: str | None = None
    keep_checkpoints: int = 1
    seed: int = 0
    # Dtype policy: "float32" | "bfloat16" (compute dtype; params stay fp32).
    compute_dtype: str = "bfloat16"
    # Packed (PSRP bf16 Pallas) training forward for the flagship U-Net —
    # same variable tree/math, ~16-20% faster steps on TPU at 512^2
    # (training/packed_unet.py). Only valid for model.name == "unet" with
    # H, W divisible by 16. "remat" additionally checkpoints each block.
    packed_train: bool | str = False
    # Mesh axis sizes; data parallelism over axis "data".
    mesh_shape: Mapping[str, int] | None = None
    log_every_steps: int = 50


def flat_update(cfg: Any, updates: Mapping[str, Any]) -> Any:
    """Return a copy of a (possibly nested) dataclass with dotted-key updates.

    ``flat_update(cfg, {"optim.learning_rate": 3e-4})``
    """
    for key, value in updates.items():
        parts = key.split(".")
        node_path = []
        node = cfg
        for p in parts[:-1]:
            node_path.append((node, p))
            node = getattr(node, p)
        node = dataclasses.replace(node, **{parts[-1]: value})
        for parent, attr in reversed(node_path):
            node = dataclasses.replace(parent, **{attr: node})
        cfg = node
    return cfg
