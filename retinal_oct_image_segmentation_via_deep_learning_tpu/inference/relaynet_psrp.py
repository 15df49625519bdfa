"""PSRP int8 serving for ReLayNet — the Pallas kernel family generalized
past the flagship U-Net (round 4).

The all-XLA int8 ReLayNet path (``inference/relaynet_int8.py``) measured
466 scans/s at 512^2 b64: its 7x3 convs at 64 channels are exactly the
lane-starved geometry the PSRP formulation fixes, and the taller H-band
is *better* for banding — at by=2 the per-tap K is (2+6)*64 = 512
(MXU-granule exact) with 7/8 = 87.5% band density vs the 3x3 family's
50% at by=4.

Graph (512^2, f=64, 10 classes):

    stage  layout in -> out                         kernel
    b0     image (ps BY=32, nph=2) -> P(2,2)@512^2  stem7_psrp [+pool+idx]
    b1     P(2,2)@256^2 [+pool+idx]                 conv7x3_psrp
    b2     P(2,2)@128^2 [+pool+idx]                 conv7x3_psrp
    b3     P(2,2)@64^2 (bottleneck)                 conv7x3_psrp
    b4-b6  cat [skip, unpool] P(2,2)                conv7x3_psrp (folded cat)
    head   P(2,2)@512^2 -> (N, H, W) labels         head_argmax_psrp

Index pools fuse into the producing conv's epilogue (fp32 pre-requant
argmax, torch flat order); unpools are elementwise XLA writes straight
into the consuming conv's packed planes (``unpool_psrp``); decoder skips
feed RAW int8 with their requant folded into the weight quantization
(same trick as the U-Net path — ``quantize_relaynet`` already does this).

Reference provenance: ReLayNet per
`/root/reference/SOTAS/Lesions_Segment/ReLayNet_2017.py:21-116`; the
serving machinery is TPU-native with no reference counterpart.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.pallas_conv_psrp import (
    pack_head_psrp_weights,
    pack_psrp,
    prep_stem_input,
    unpack_psrp,
)
from ..ops.pallas_conv_psrp7 import (
    conv7x3_psrp,
    pack_psrp7_weights,
    stem7_psrp,
    unpool_psrp,
)
from .psrp import head_argmax_psrp
from .relaynet_int8 import quantize_relaynet

STEM_BY = 32
NPH = 2
BY = 2

# per-stage Pallas G-tiles (overridable via OCTSEG_RELAY_TG for sweeps)
STAGE_TG = {"b1": 16, "b2": 16, "b3": 8, "b4": 16, "b5": 16, "b6": 16,
            "head": 16}


def quantize_relaynet_psrp(layers, taps):
    """qparams for ``relaynet_psrp_forward`` (adds packed weights to the
    all-XLA quantization — same scales, same folded skip requants)."""
    q = quantize_relaynet(layers, taps)
    f = int(q["b0"]["w_q"].shape[-1])
    stem_mats, _ = pack_psrp7_weights(q["b0"]["w_q"], STEM_BY, NPH)
    q["b0"]["w_stem"] = tuple(jnp.asarray(m) for m in stem_mats)
    cins = {"b1": (f,), "b2": (f,), "b3": (f,),
            "b4": (f, f), "b5": (f, f), "b6": (f, f)}
    for name, ci in cins.items():
        mats, _ = pack_psrp7_weights(q[name]["w_q"], BY, NPH, cins=ci)
        q[name]["w_psrp"] = tuple(jnp.asarray(m) for m in mats)
    q["head"]["w_head"] = jnp.asarray(
        pack_head_psrp_weights(q["head"]["w_q"], BY)
    )
    return q


def relaynet_psrp_forward(qparams, x, num_classes: int = 10, tg=None):
    """x: (N, H, W, 1) fp32 -> (N, H, W) int8 argmax labels."""
    import os as _os

    tgs = dict(STAGE_TG)
    if isinstance(tg, int):
        tgs = {k: tg for k in tgs}
    elif tg:
        tgs.update(tg)
    for kv in filter(None,
                     _os.environ.get("OCTSEG_RELAY_TG", "").split(",")):
        k, _, v = kv.partition("=")
        tgs[k] = int(v)
    s = qparams["_act_scales"]
    interp = jax.default_backend() != "tpu"

    def eff(name):
        lw = qparams[name]
        return (s[f"{name}_in"] * lw["s_w"] / s[f"{name}_out"],
                lw["b"] / s[f"{name}_out"], lw["alpha"])

    def conv(inputs, name, cins, pool=False):
        scale, bias, alpha = eff(name)
        return conv7x3_psrp(
            tuple(inputs), qparams[name]["w_psrp"], scale, bias, alpha,
            by=BY, nph=NPH, cins=cins, kh=7, tg=tgs[name], pool=pool,
            interpret=interp,
        )

    f = int(qparams["b0"]["w_q"].shape[-1])
    xp = prep_stem_input(x, s["b0_in"], BY=STEM_BY, nph=NPH)
    sc, b, al = eff("b0")
    skip0, h, idx0 = stem7_psrp(
        xp, qparams["b0"]["w_stem"], sc, b, al, BY=STEM_BY, by_out=BY,
        nph=NPH, kh=7, pool=True, interpret=interp,
    )  # skip0 P(2,2)@512^2; h plain @256^2

    skip1, h, idx1 = conv([pack_psrp(h, BY, NPH)], "b1", (f,), pool=True)
    skip2, h, idx2 = conv([pack_psrp(h, BY, NPH)], "b2", (f,), pool=True)
    h = conv([pack_psrp(h, BY, NPH)], "b3", (f,))  # bottleneck P(2,2)

    for name, skip, idx in (("b4", skip2, idx2), ("b5", skip1, idx1),
                            ("b6", skip0, idx0)):
        up = unpool_psrp(unpack_psrp(h, BY, NPH), idx)
        h = conv([skip, up], name, (f, f))

    hw = qparams["head"]
    return head_argmax_psrp(
        h, hw["w_head"], s["b6_out"] * hw["s_w"], hw["b"], by=BY, nph=NPH,
        nc=num_classes, tg=tgs["head"], interpret=interp,
    )
