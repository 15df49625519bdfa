"""Quantized-serving artifacts: persist qparams once, serve anywhere.

The quantizers (``quantized.quantize_unet``, ``psrp.quantize_unet_psrp``,
``packed.quantize_unet_packed``) produce a nested pytree of int8 weight
packs, fp32 scales/biases, and the activation-scale dict. Recomputing them
per process needs the fp32 checkpoint AND calibration data; production
serving wants a single artifact. This module round-trips any such tree
through one ``.npz`` file: leaf arrays stored under path-encoded keys
(dict segments verbatim, tuple/list slots as ``[i]``), so no pickle and no
version-fragile treedefs.

Reference provenance: the reference's only persisted artifact is a Keras
weights hdf5 (`/root/reference/SOTAS/Layers_Segment/FourierNet/trainTestModels.py:71-76`);
quantized serving artifacts are TPU-framework machinery with no reference
counterpart.
"""

from __future__ import annotations

import numpy as np

_SEP = "\x1f"  # key-segment separator (never appears in layer names)


def _flatten(obj, prefix, out):
    if isinstance(obj, dict):
        for k in obj:
            assert isinstance(k, str) and _SEP not in k, k
            _flatten(obj[k], prefix + [k], out)
    elif isinstance(obj, (tuple, list)):
        for i, v in enumerate(obj):
            _flatten(v, prefix + [f"[{i}]"], out)
    else:
        out[_SEP.join(prefix)] = np.asarray(obj)


def save_qparams(path: str, qparams) -> None:
    """Write a quantized-params tree to ``path`` (.npz)."""
    flat: dict[str, np.ndarray] = {}
    _flatten(qparams, [], flat)
    np.savez(path, **flat)


def load_qparams(path: str):
    """Read a tree written by ``save_qparams``. Tuple slots come back as
    tuples (the Pallas weight packs are consumed positionally)."""
    with np.load(path) as z:
        items = {k: z[k] for k in z.files}

    root: dict = {}
    for key, val in items.items():
        segs = key.split(_SEP)
        node = root
        for s in segs[:-1]:
            node = node.setdefault(s, {})
        leaf = val if val.ndim else val[()]  # 0-d -> scalar
        node[segs[-1]] = leaf

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("[") for k in node):
            return tuple(
                rebuild(node[f"[{i}]"]) for i in range(len(node))
            )
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)
