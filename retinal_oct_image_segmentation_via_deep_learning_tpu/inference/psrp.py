"""Serving U-Net forward on the phase-split row-packed (PSRP) layout — v3.

Replaces the round-2 row-packed graph (``inference/packed.py``) whose e2e
time was dominated by XLA boundary taxes (round-3 trace: ~44 ms/batch of
relayout copies + glue at batch 128 / 512^2). In PSRP (see
``ops/pallas_conv_psrp``) every shallow-stage tensor keeps W-phases as
major dims, so:

* transpose convs write their output planes directly (no pack-transposes),
* pools fuse into the producing conv (plane-pair max + lane-group max),
* pooling lands exactly in the next stage's layout (incl. the deep region's
  plain NHWC — no unpack pass),
* skip concats fold into the consuming conv's GEMM with the skip requant
  pre-folded into its weight quantization (as in round 2),
* the 32-ch stages run fused K=576/384 dots (90% MXU K-efficiency) and the
  64-ch stages by=2 banded K=512/256 (100%, 75% density).

Stage table (f=32, H=W=512, batch-agnostic):

    stage        layout in -> out                      kernel
    stem         image (ps by BY=32, nph=4) -> P(4,4)  stem_psrp
    blk0_conv1   P(4,4) -> P(4,4) [+pool -> P(2,2)]    conv3x3_psrp
    blk1_conv0   P(2,2) 32ch -> P(2,2) 64ch            conv3x3_psrp
    blk1_conv1   P(2,2) -> P(2,2) [+pool -> NHWC]      conv3x3_psrp
    blk2..blk6   NHWC int8 (by=1 kernels + XLA cts)    conv3x3_int8
    ct2          NHWC 128ch -> P(2,2) 64ch             ct_up_psrp
    blk7_conv0/1 P(2,2)                                 conv3x3_psrp
    ct3          P(2,2) 64ch -> P(4,4) 32ch            ct_psrp
    blk8_conv0/1 P(4,4)                                 conv3x3_psrp
    head         P(4,4) -> (N, H, W) labels            head_argmax_psrp

Reference provenance: serves the reference U-Net
(`/root/reference/SOTAS/Lesions_Segment/YNet_2022.py:509-602`); the layout
machinery is TPU-native with no reference counterpart.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.pallas_conv_int8 import (
    conv3x3_int8,
    ct2x2_int8,
    pack_ct2x2_weights,
    pack_weights,
)
from ..ops.pallas_conv_psrp import (
    conv3x3_psrp,
    ct_psrp,
    ct_up_psrp,
    head_argmax_psrp,
    pack_ct_psrp_weights,
    pack_ct_up_weights,
    pack_head_psrp_weights,
    pack_psrp,
    pack_psrp_weights,
    pack_stem2_weights,
    pack_stem_psrp_weights,
    prep_stem_input,
    prep_stem_window,
    stem_conv_psrp,
    stem_psrp,
    unpack_psrp,
)
from .quantized import DEEP_STAGES, _pick_th, _qconv, quantize_unet

STEM_BY = 32  # deep row packing of the 1-channel input image
NPH_STEM = 4

# stage -> (by, nph, cins); cat stages list (up, skip) channel splits.
PSRP_STAGES = {
    "blk0_conv1": (4, 4, (32,)),
    "blk1_conv0": (2, 2, (32,)),
    "blk1_conv1": (2, 2, (64,)),
    "blk7_conv0": (2, 2, (64, 64)),
    "blk7_conv1": (2, 2, (64,)),
    "blk8_conv0": (4, 4, (32, 32)),
    "blk8_conv1": (4, 4, (32,)),
}

# f=16 secondary serving config (~4x fewer FLOPs; see docs/PERF.md for the
# Dice-delta evidence). by*cin stays 128 at the 512^2 stages (by=8) and the
# band density IMPROVES to by/(by+2) = 80% vs f=32's 66.7%. The two layout
# differences vs f=32 are at the deep boundary: the blk1 pool lands in
# (by=2, nph=1) instead of plain NHWC (one cheap unpack copy at 128^2), and
# ct2 consumes a (2, 1)-packed deep tensor via the generic ``ct_psrp``
# instead of ``ct_up_psrp``.
PSRP_STAGES_F16 = {
    "blk0_conv1": (8, 4, (16,)),
    "blk1_conv0": (4, 2, (16,)),
    "blk1_conv1": (4, 2, (32,)),
    "blk7_conv0": (4, 2, (32, 32)),
    "blk7_conv1": (4, 2, (32,)),
    "blk8_conv0": (8, 4, (16, 16)),
    "blk8_conv1": (8, 4, (16,)),
}


# Doubled-(by, nph) f=32 table (OCTSEG_PSRP_DOUBLE=1 A/B): same (by, nph)
# per stage as the f=16 table, so by*cin = 256 lanes at every psrp stage.
# Band density rises from by/(by+2) = 66.7% -> 80% at 512^2 and 50% -> 66.7%
# at 256^2 — the banded GEMMs do ~1.2x fewer wasted FLOPs.
PSRP_STAGES_F32D = {
    name: (by, nph, PSRP_STAGES[name][2])
    for name, (by, nph, _) in PSRP_STAGES_F16.items()
}


def _psrp_config(f: int):
    """(stage_table, stem by_out) for a supported init_features."""
    import os as _os

    if f == 32:
        if _os.environ.get("OCTSEG_PSRP_DOUBLE"):
            return PSRP_STAGES_F32D, 8
        return PSRP_STAGES, 4
    if f == 16:
        return PSRP_STAGES_F16, 8
    raise ValueError(f"PSRP serving supports f in (16, 32), got {f}")

# Per-stage G-tile defaults from the round-3 on-chip sweeps
# (perf/psrpbench.py; re-swept after the per-kernel VMEM cap raise made
# tg>=32 compilable: 512^2 stages prefer 32, 256^2 stages 64 — e.g.
# d2c1 2.54 -> 2.09 ms, e2a 2.03 -> 1.76). ct/head tiles keyed separately.
STAGE_TG = {
    "blk0_conv1": 32,
    "blk1_conv0": 64,
    "blk1_conv1": 64,
    "blk7_conv0": 64,
    "blk7_conv1": 64,
    "blk8_conv0": 32,
    "blk8_conv1": 32,
    "ct01": 8,   # deep ct2x2 kernels (tr)
    "ct2": 32,   # ct_up_psrp (tr)
    "ct3": 16,   # ct_psrp (tg)
    "head": 16,
}

# by=8 stages double the banded-K intermediates per tile; tg=16 overflows
# the 16M Mosaic stack (measured on-chip: blk8_conv0 f=16 wanted 20.68M).
# Halve the tile for every by=8 stage in the f=16 / doubled-f32 tables.
def _stage_tg_for(stage_table):
    tgs = dict(STAGE_TG)
    for name, (by, _nph, _cins) in stage_table.items():
        if by >= 8:
            tgs[name] = 8
    return tgs


def _quant_w(w, lim: int = 127):
    # 4-bit weights use plain per-channel absmax: an MSE-optimal
    # shrink-fraction scan was A/B'd on the trained-checkpoint contract and
    # LOST (w4-only argmax agreement vs int8: absmax 96.6% vs MSE 95.2% —
    # clipping outlier weights hurts agreement more than the rounding
    # noise it saves; perf/psrp_accuracy.py, round 5). Do not retry.
    s_w = np.max(np.abs(w), axis=(0, 1, 2)) / lim
    s_w = np.maximum(s_w, 1e-12).astype(np.float32)
    w_q = np.clip(np.round(w / s_w), -lim, lim).astype(np.int8)
    return w_q, s_w


# 4-bit activation tensors under the w4a4 mode (every tensor consumed by an
# int4 dot). Two encodings:
#
# * ZP7_KEYS — relu-produced tensors, quantized to levels [0, 14] and STORED
#   as level-7 in [-7, 7] ("zero-point 7"): true zero sits at stored -7, so
#   the non-negative relu range gets 15 levels instead of 8. The shift is
#   free: producers fold the -7 into the conv bias (relu is subsumed by the
#   symmetric clip's lower bound), consumers fold the +7*sum(w) back in
#   (uniform because kernels pad borders with the stored true-zero, -7).
# * SYM7_KEYS — the ct0/ct1 transpose-conv outputs (no relu, signed):
#   plain symmetric [-7, 7].
#
# ``ct2_in``/``ct3_in`` (the decoder boundary) and the enc0/enc1 skips
# deliberately stay 8-bit: pool=True stages emit the skip at the full int8
# base scale and requantize only the POOLED tensor via the fused
# pool_rescale/pool_shift epilogue (split scale).
ZP7_KEYS = frozenset(
    [f"blk{i}_conv{j}_in" for i in (1, 2, 3, 4) for j in (0, 1)]
    + ["ct0_in", "blk5_conv1_in", "ct1_in", "blk6_conv1_in",
       "blk7_conv1_in"]
)
SYM7_KEYS = frozenset(["blk5_cat", "blk6_cat"])
INT4_KEYS = ZP7_KEYS | SYM7_KEYS
# int8-range / 4-bit-range scale ratios: an INT4_KEYS tensor's effective
# scale is s[key] * ratio (calibrated absmax maps to 14 or 7 vs 127).
ZP7_RATIO = 127.0 / 14.0
SYM7_RATIO = 127.0 / 7.0
# PSRP (mid-res, by=2) stages whose MXU dots also run int4 under the w4a4
# mode. blk7_conv0 stays int8 (its enc1 skip input keeps 8-bit precision;
# only its OUTPUT is requantized to 4-bit for blk7_conv1); the 512^2 by=4
# stages are patch-assembly-bound, where the int4 dot rate buys little and
# the extra in-kernel casts cost VPU time.
INT4_PSRP_STAGES = ("blk1_conv0", "blk1_conv1", "blk7_conv1")


def quantize_unet_psrp(layers, taps, init_features: int = 32,
                       deep_int4=False, int4_w8_stages=()):
    """qparams for ``unet_psrp_forward`` (f=init_features U-Net).

    ``deep_int4=True``: serve the deep region (blk2..blk6 + ct0/ct1, plus
    the mid-res INT4_PSRP_STAGES) as w4a4 — weights quantized with absmax/7
    and activations held in [-7, 7], so those kernels' MXU dots run at the
    2x int4 rate (647 vs 367 TOPs measured, perf/int4probe.py). Values stay
    in int8 storage; the cast happens inside the kernels. Shallow PSRP
    stages, the enc0/enc1 skips, and ct3_in/ct2_in keep full int8.

    ``deep_int4="w4"``: 4-bit WEIGHTS only (activations full int8, int8
    dots — an accuracy-attribution mode, no speedup).
    ``deep_int4="a4"``: 4-bit ACTIVATIONS only (weights int8, int8 dots —
    accuracy attribution).

    ``int4_w8_stages``: stage names (conv stages or "ct0"/"ct1") whose
    WEIGHTS stay full int8 under deep_int4 (their dots then run int8 on the
    4-bit activations) — per-stage mixed precision for accuracy recovery.
    Recorded as pytree-structure keys so the forward picks it up under jit.
    """
    w4 = deep_int4 in (True, "w4")
    a4 = deep_int4 in (True, "a4")
    assert deep_int4 in (False, True, "w4", "a4"), deep_int4
    w8set = frozenset(int4_w8_stages) if deep_int4 else frozenset()
    stage_table, _ = _psrp_config(init_features)
    q = quantize_unet(layers, taps, pallas=False)
    s = {k: np.float32(v) for k, v in q["_act_scales"].items()}

    wlim = 7 if w4 else 127
    if deep_int4:
        # mode carried as pytree STRUCTURE (key presence — values are
        # tracers under jit): _deep_int4 => w4a4 (int4 dots),
        # _deep_a4 => activation-only 4-bit (int8 dots).
        q["_deep_int4" if deep_int4 is True else f"_deep_{deep_int4}"] = True
        for name in w8set:
            q[f"_w8_{name}"] = True
    if w4:
        for name in DEEP_STAGES + ("ct0", "ct1"):
            if name in w8set:
                continue
            q[name]["w_q"], q[name]["s_w"] = _quant_w(
                layers[name]["w"], wlim
            )
    for name in DEEP_STAGES:
        q[name]["w_packed"] = pack_weights(q[name]["w_q"], 1)

    def effs(key):
        """Effective STORED scale of a tensor under the active mode."""
        if a4 and key in ZP7_KEYS:
            return s[key] * np.float32(ZP7_RATIO)
        if a4 and key in SYM7_KEYS:
            return s[key] * np.float32(SYM7_RATIO)
        return s[key]

    # cat convs: fold the skip requant (s_skip -> s_cat) into the skip-half
    # weight quantization — exact up to int8 weight rounding (round 2).
    # Round 3 extends this to the DEEP cat convs too, so the deep skips feed
    # the folded-concat kernel raw (no separate requant pass, no concat copy).
    # Folds use EFFECTIVE scales: the deep skips (blk4/blk3_conv0_in) are
    # zp7-stored while the cat is sym7; the enc0/enc1 skips stay stored at
    # the full-int8 base scale (pool split-scale), so blk7/blk8 use base.
    skip_scale = {
        "blk5_conv0": effs("blk4_conv0_in") / effs("blk5_cat"),
        "blk6_conv0": effs("blk3_conv0_in") / effs("blk6_cat"),
        "blk7_conv0": s["blk2_conv0_in"] / s["blk7_cat"],
        "blk8_conv0": s["blk1_conv0_in"] / s["blk8_cat"],
    }
    for name, (by, nph, cins) in stage_table.items():
        w = layers[name]["w"].copy()
        if name in skip_scale:
            w[:, :, cins[0]:, :] *= skip_scale[name]
        w_q, s_w = _quant_w(
            w, 7 if (w4 and name in INT4_PSRP_STAGES
                     and name not in w8set) else 127
        )
        q[name]["w_q"], q[name]["s_w"] = w_q, s_w
        mats, _ = pack_psrp_weights(w_q, by, nph, cins=cins)
        q[name]["w_psrp"] = tuple(mats)
    for name in ("blk5_conv0", "blk6_conv0"):
        w = layers[name]["w"].copy()
        half = w.shape[2] // 2
        w[:, :, half:, :] *= skip_scale[name]
        w_q, s_w = _quant_w(w, 7 if (w4 and name not in w8set) else 127)
        q[name]["w_q"], q[name]["s_w"] = w_q, s_w
        q[name]["w_packed"] = pack_weights(w_q, 1)

    if a4:
        # Consumer-side zero-point corrections: the forward adds
        # 7 * scale_vec * wsum4 to the bias of every conv consuming a
        # zp7-stored input (uniform across pixels — kernels pad borders
        # with the stored true-zero). Sums taken over the FINAL
        # (fold-scaled) quantized weights, zp7 input channels only.
        for name in DEEP_STAGES:
            wq = q[name]["w_q"]
            if name in ("blk5_conv0", "blk6_conv0"):
                wq = wq[:, :, wq.shape[2] // 2 :, :]  # zp7 skip half only
            q[name]["wsum4"] = wq.sum((0, 1, 2)).astype(np.float32)
        for name in INT4_PSRP_STAGES:
            q[name]["wsum4"] = (
                q[name]["w_q"].sum((0, 1, 2)).astype(np.float32)
            )
        for name in ("ct0", "ct1"):  # per-(dy, dx) single-tap sums
            q[name]["wsum4"] = q[name]["w_q"].sum(2).astype(np.float32)

    stem_mats, _ = pack_stem_psrp_weights(
        q["blk0_conv0"]["w_q"], STEM_BY, NPH_STEM
    )
    q["blk0_conv0"]["w_stem"] = tuple(stem_mats)
    by1 = stage_table["blk0_conv1"][0]
    q["blk0_conv0"]["w_stem2"] = tuple(
        pack_stem2_weights(q["blk0_conv0"]["w_q"], by1, NPH_STEM)
    )
    by_full = stage_table["blk8_conv1"][0]
    q["head"]["w_head"] = pack_head_psrp_weights(q["head"]["w_q"], by_full)
    by3 = stage_table["blk7_conv1"][0]
    if stage_table["blk1_conv1"][0] // 2 == 1:
        # plain-NHWC deep boundary: ct2 runs the specialised NHWC->P(2,2) up
        ct_packers = {"ct2": pack_ct_up_weights,
                      "ct3": lambda w: pack_ct_psrp_weights(w, by_in=by3)}
    else:  # packed deep boundary: both decoder ups run the generic ct_psrp
        ct_packers = {"ct2": lambda w: pack_ct_psrp_weights(w, by_in=2),
                      "ct3": lambda w: pack_ct_psrp_weights(w, by_in=by3)}
    for name, packer in ct_packers.items():
        q[name]["w_ct"] = tuple(packer(q[name]["w_q"]))
    for name in ("ct0", "ct1"):
        q[name]["w_ct"] = tuple(pack_ct2x2_weights(q[name]["w_q"]))
    return q


def unet_psrp_forward(qparams, x, num_classes: int, tg=None):
    """x: (N, H, W, 1) fp32/bf16 -> (N, H, W) int8 argmax labels.

    ``tg`` is the Pallas G-tile (rows of by-packed groups per VMEM block):
    an int applies globally, a mapping overrides per stage, None uses the
    swept per-stage defaults (``STAGE_TG``).
    """
    f0 = int(qparams["blk0_conv0"]["w_q"].shape[-1])
    base_tg = _stage_tg_for(_psrp_config(f0)[0])
    if tg is None:
        tgs = dict(base_tg)
    elif isinstance(tg, int):
        tgs = {k: tg for k in base_tg}
    else:
        tgs = {**base_tg, **tg}
    import os as _os

    for kv in filter(None, _os.environ.get("OCTSEG_PSRP_TG", "").split(",")):
        k, _, v = kv.partition("=")
        tgs[k] = int(v)  # on-chip sweep override (perf use only)
    s = qparams["_act_scales"]
    # key PRESENCE, not value: under jit the qparams leaves are tracers, so
    # the flag must be part of the pytree STRUCTURE (quantize_unet_psrp only
    # adds the keys in the 4-bit modes). deep_i4 drives the [-7,7]
    # activation bookkeeping; dot4 additionally runs the int4 MXU dots.
    deep_i4 = "_deep_int4" in qparams or "_deep_a4" in qparams
    dot4 = "_deep_int4" in qparams

    def sdeep(key):
        """Effective STORED activation scale under the 4-bit modes."""
        if deep_i4 and key in ZP7_KEYS:
            return s[key] * np.float32(ZP7_RATIO)
        if deep_i4 and key in SYM7_KEYS:
            return s[key] * np.float32(SYM7_RATIO)
        return s[key]

    def zp_in(key):
        return deep_i4 and key in ZP7_KEYS
    N, H, W, _ = x.shape
    f = int(qparams["blk0_conv0"]["w_q"].shape[-1])
    stage_table, by_stem_out = _psrp_config(f)
    interp = jax.default_backend() != "tpu"  # CPU tests: interpret mode

    def eff(name, in_key, out_key):
        lw = qparams[name]
        return (s[in_key] * lw["s_w"] / s[out_key], lw["b"] / s[out_key])

    def pconv(inputs, name, in_key, out_key, pool=False):
        by, nph, cins = stage_table[name]
        lw = qparams[name]
        # pool=True stages feed BOTH a skip (unpooled, kept 8-bit at the
        # base scale) and a downstream consumer (pooled). Under w4a4 the
        # pooled tensor alone is requantized to [-7, 7] inside the pool
        # epilogue (pool_rescale) — a split scale, so skips lose nothing.
        s_out = s[out_key] if pool else sdeep(out_key)
        scale = sdeep(in_key) * lw["s_w"] / s_out
        bias = lw["b"] / s_out
        kw = {}
        relu = True
        if deep_i4:
            if zp_in(in_key):
                # consumer-side zero-point fold (+7 * sum(w) per channel;
                # uniform — the kernel pads borders with the stored -7)
                bias = bias + 7.0 * scale * lw["wsum4"]
                kw["pad_val"] = -7
            if (dot4 and name in INT4_PSRP_STAGES
                    and f"_w8_{name}" not in qparams):
                kw["dot_int4"] = True
            if out_key in INT4_KEYS:
                if pool:
                    # split scale: the POOLED tensor alone requantizes to
                    # zp7 levels in the fused epilogue; the unpooled skip
                    # keeps the full-int8 base scale
                    kw["pool_rescale"] = float(1.0 / ZP7_RATIO)
                    kw["pool_shift"] = -7.0
                    kw["pool_clip"] = 7.0
                else:
                    # producer-side zp: -7 folds into the bias; relu is
                    # subsumed by the symmetric clip's lower bound
                    bias = bias - 7.0
                    relu = False
                    kw["out_clip"] = 7.0
        return conv3x3_psrp(
            tuple(inputs), lw["w_psrp"], scale, bias,
            by=by, nph=nph, cins=cins, tg=tgs[name], pool=pool,
            relu=relu, interpret=interp, **kw,
        )

    if _os.environ.get("OCTSEG_PSRP_STEM_FUSE") and not deep_i4:
        # (w4a4 note: the fused stem's pooled output has no split-scale
        # epilogue, so deep_int4 always takes the two-kernel stem path.)
        # fused stem + blk0_conv1 + pool: the full-res stem tensor never
        # round-trips HBM (bit-identical to the two-kernel path). OPT-IN:
        # on-chip A/B (512^2 b128) measured it 24 ms/batch SLOWER than the
        # two-kernel path — the in-register stage-1/stage-2 serialization
        # and the lane-duplicated row-window input outweigh the saved HBM
        # round-trip. Kept for other geometries / future Mosaic versions.
        by1 = stage_table["blk0_conv1"][0]
        sc0, b0 = eff("blk0_conv0", "blk0_conv0_in", "blk0_conv1_in")
        sc1, b1 = eff("blk0_conv1", "blk0_conv1_in", "blk1_conv0_in")
        xwin = prep_stem_window(x, s["blk0_conv0_in"], by=by1, nph=NPH_STEM)
        enc0, h = stem_conv_psrp(
            xwin, qparams["blk0_conv0"]["w_stem2"], sc0, b0,
            qparams["blk0_conv1"]["w_psrp"], sc1, b1, by=by1,
            nph=NPH_STEM, tg=tgs["blk0_conv1"], pool=True,
            interpret=interp,
        )  # pooled: P(2,2) 32ch
    else:
        xp = prep_stem_input(x, s["blk0_conv0_in"], BY=STEM_BY,
                             nph=NPH_STEM)
        sc, b = eff("blk0_conv0", "blk0_conv0_in", "blk0_conv1_in")
        h = stem_psrp(
            xp, qparams["blk0_conv0"]["w_stem"], sc, b,
            BY=STEM_BY, by_out=by_stem_out, nph=NPH_STEM, interpret=interp,
        )
        enc0, h = pconv([h], "blk0_conv1", "blk0_conv1_in",
                        "blk1_conv0_in", pool=True)  # pooled: P(2,2) 32ch
    h = pconv([h], "blk1_conv0", "blk1_conv0_in", "blk1_conv1_in")
    enc1, hp = pconv([h], "blk1_conv1", "blk1_conv1_in", "blk2_conv0_in",
                     pool=True)
    # f=32: the nph=2 pool lands (by=1, nph=1) = the plain deep layout via a
    # free reshape; f=16 it lands (by=2, nph=1) — one cheap unpack copy of a
    # 128^2 tensor.
    by_deep = stage_table["blk1_conv1"][0] // 2
    if by_deep == 1:
        G, W2 = hp.shape[1], hp.shape[3]
        hq = hp.reshape(N, G, W2, hp.shape[-1])
    else:
        hq = unpack_psrp(hp, by_deep, 1)
    # (w4a4: hq already arrives in [-7, 7] — blk1_conv1's pool epilogue
    # applies the 8->4 split-scale rescale in-register, so the enc1 skip
    # stays 8-bit and no extra requant pass runs.)

    # --- deep region: by=1 kernels with folded cat; reshape-lowered pools.
    # Pool lowerings A/B'd on-chip (perf/poolbench.py): XLA reshape-max 1.7
    # ms isolated (+~1.6 of boundary relayout copies in-graph, from the s8
    # reduce preferring batch-minor layouts); Pallas pool2x2_int8 5.1 (the
    # sublane W-pair reshape lowers as shuffles); XLA strided-slice max 7.7.
    def _dpool(t):
        n, h, w, c = t.shape
        return jnp.max(t.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))

    def dconv(inputs, name, in_key, out_key):
        layer = qparams[name]
        if not isinstance(inputs, (tuple, list)):
            inputs = (inputs,)
        scale = sdeep(in_key) * layer["s_w"] / sdeep(out_key)
        bias = layer["b"] / sdeep(out_key)
        relu, clip, pad_vals = True, 127.0, None
        if deep_i4:
            # every deep input is 4-bit: singles zp7, cat stages
            # (sym7 up-half, zp7 skip-half); wsum4 covers the zp7
            # channels only (quantize_unet_psrp)
            bias = bias + 7.0 * scale * layer["wsum4"]
            pad_vals = (0, -7) if len(inputs) > 1 else (-7,)
            if out_key in ZP7_KEYS:
                bias, relu, clip = bias - 7.0, False, 7.0
            # interpret path: the same Pallas kernel (interpret mode) —
            # _qconv cannot express the zp border padding
            return conv3x3_int8(
                tuple(inputs), layer["w_packed"], scale, bias, by=1,
                relu=relu, out_int8=True, th=_pick_th(inputs[0].shape[1]),
                dot_int4=dot4 and f"_w8_{name}" not in qparams,
                out_clip=clip, pad_vals=pad_vals,
                interpret=interp,
            )
        if not interp:
            return conv3x3_int8(
                tuple(inputs), layer["w_packed"], scale, bias, by=1,
                relu=True, out_int8=True, th=_pick_th(inputs[0].shape[1]),
            )
        cat = (jnp.concatenate(inputs, axis=-1) if len(inputs) > 1
               else inputs[0])
        return _qconv(cat, sdeep(in_key), layer, sdeep(out_key))

    deep_enc = []
    for i in (2, 3):
        hq = dconv(hq, f"blk{i}_conv0", f"blk{i}_conv0_in",
                   f"blk{i}_conv1_in")
        nxt = f"blk{i+1}_conv0_in"
        hq = dconv(hq, f"blk{i}_conv1", f"blk{i}_conv1_in", nxt)
        deep_enc.append(hq)
        hq = _dpool(hq)
    hq = dconv(hq, "blk4_conv0", "blk4_conv0_in", "blk4_conv1_in")
    hq = dconv(hq, "blk4_conv1", "blk4_conv1_in", "ct0_in")
    hs = sdeep("ct0_in")
    for ct, blk in ((0, 5), (1, 6)):
        cat_s = sdeep(f"blk{blk}_cat")
        lw = qparams[f"ct{ct}"]
        scale_v = hs * lw["s_w"] / cat_s
        bias_v = lw["b"] / cat_s
        kw = {}
        if deep_i4:
            # per-(dy, dx) zero-point fold: each ct output pixel is
            # exactly one tap of one zp7-stored input pixel
            bmat = bias_v + 7.0 * scale_v * lw["wsum4"]  # (2, 2, cout)
            bias_v = jnp.concatenate([bmat[:, 0], bmat[:, 1]], axis=-1)
            kw = dict(dot_int4=dot4 and f"_w8_ct{ct}" not in qparams,
                      out_clip=7.0)
        up = ct2x2_int8(
            hq, lw["w_ct"], scale_v, bias_v,
            tr=tgs["ct01"], interpret=interp, **kw,
        )
        # skip feeds RAW — its requant is folded into the conv's weights
        hq = dconv((up, deep_enc[1 - ct]), f"blk{blk}_conv0",
                   f"blk{blk}_cat", f"blk{blk}_conv1_in")
        nxt = f"ct{ct+1}_in"
        hq = dconv(hq, f"blk{blk}_conv1", f"blk{blk}_conv1_in", nxt)
        hs = sdeep(nxt)

    # --- PSRP decoder ---
    sc = s["ct2_in"] * qparams["ct2"]["s_w"] / s["blk7_cat"]
    b = qparams["ct2"]["b"] / s["blk7_cat"]
    if by_deep == 1:
        up = ct_up_psrp(hq, qparams["ct2"]["w_ct"], sc, b, tr=tgs["ct2"],
                        interpret=interp)
    else:
        # deep (N, H, W, C) -> (by=2, nph=1) packed, then the generic
        # PSRP transpose conv doubles it to (by=4, nph=2)
        up = ct_psrp(pack_psrp(hq, 2, 1), qparams["ct2"]["w_ct"], sc, b,
                     by_in=2, nph_in=1, tg=min(tgs["ct2"], 16),
                     interpret=interp)
    h = pconv([up, enc1], "blk7_conv0", "blk7_cat", "blk7_conv1_in")
    h = pconv([h], "blk7_conv1", "blk7_conv1_in", "ct3_in")
    sc = s["ct3_in"] * qparams["ct3"]["s_w"] / s["blk8_cat"]
    b = qparams["ct3"]["b"] / s["blk8_cat"]
    by3, nph3 = stage_table["blk7_conv1"][0], stage_table["blk7_conv1"][1]
    up = ct_psrp(h, qparams["ct3"]["w_ct"], sc, b, by_in=by3, nph_in=nph3,
                 tg=tgs["ct3"], interpret=interp)
    h = pconv([up, enc0], "blk8_conv0", "blk8_cat", "blk8_conv1_in")

    lw = qparams["head"]
    by_h, nph_h = stage_table["blk8_conv1"][0], stage_table["blk8_conv1"][1]
    if not _os.environ.get("OCTSEG_PSRP_HEAD_FUSE"):
        # Fused blk8_conv1+head (below) is also OPT-IN: measured +1.5
        # ms/batch on-chip — the M=16 head dots serialize inside the conv
        # kernel and stall its pipeline more than the saved full-res int8
        # round-trip is worth.
        h = pconv([h], "blk8_conv1", "blk8_conv1_in", "head_in")
        return head_argmax_psrp(
            h, lw["w_head"], s["head_in"] * lw["s_w"], lw["b"], by=by_h,
            nph=nph_h, nc=num_classes, tg=tgs["head"], interpret=interp,
        )
    # blk8_conv1 + head + argmax in ONE kernel: the full-res 32-ch int8
    # tensor (2 GB/batch HBM round-trip at 512^2 b128) never leaves VMEM.
    name = "blk8_conv1"
    by_, nph_, cins = stage_table[name]
    scale, bias = eff(name, "blk8_conv1_in", "head_in")
    G, W2 = h.shape[1], h.shape[3]
    out = conv3x3_psrp(
        (h,), qparams[name]["w_psrp"], scale, bias, by=by_, nph=nph_,
        cins=cins, tg=tgs[name],
        head=(lw["w_head"], s["head_in"] * lw["s_w"], lw["b"]),
        interpret=interp,
    )
    return (
        out.reshape(N, nph_, by_, G, W2)
        .transpose(0, 3, 2, 4, 1)
        .reshape(N, G * by_, W2 * nph_)
    )
