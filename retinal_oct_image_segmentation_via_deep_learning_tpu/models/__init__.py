"""Model zoo: 13 OCT segmentation architectures, one shared block library.

All modules are Flax linen, NHWC, ``__call__(x, train=False)`` returning NHWC
logits (or architecture-specific tuples, documented per model). Constructors
are reachable through the registry (``registry.py``), mirroring the
reference's ``get_model`` factory (``SOTAS/Lesions_Segment/YNet_2022.py:496``).
"""

from . import blocks  # noqa: F401
