"""TPU-native retinal OCT segmentation framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capability surface of
``ZhangHH233/Retinal_OCT_Image_Segmentation_via_Deep_Learning``:

- ``models``   — the 13-architecture model zoo (layers + lesions segmentation),
  built from one shared Flax block library instead of 13 copy-pasted stacks.
- ``metrics``  — the five metric families (confusion-matrix, region, contour,
  pixel-error, biomarker) as vectorized, jit-able JAX ops; numerically matched
  to the reference NumPy formulas to 1e-4.
- ``ops``      — TPU-first functional ops (PyTorch-exact resize, index
  max-unpool, Haar DWT, FFT conv helpers, preprocessing pipeline, ...).
- ``parallel`` — device-mesh runtime: data-parallel pjit sharding and a
  ``shard_map`` spatial (halo-exchange) path.
- ``training`` — unified trainer: losses, train state, Orbax checkpointing,
  early stopping, synthetic + on-disk data pipelines.

Conventions: arrays are NHWC (TPU-native), parameters float32, compute
optionally bfloat16 via the dtype policy in ``utils.dtype``.

Import as::

    import retinal_oct_image_segmentation_via_deep_learning_tpu as octseg
    model = octseg.get_model("unet", in_channels=1, num_classes=10)
"""

__version__ = "0.1.0"

from .registry import get_model, list_models, register_model  # noqa: F401
from .config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
