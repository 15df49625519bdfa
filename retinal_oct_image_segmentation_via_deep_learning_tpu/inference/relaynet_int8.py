"""Int8 PTQ serving for ReLayNet — second zoo model on the quantized
pipeline.

Same recipe as the flagship U-Net path (``inference/quantized.py``):
fold BN into the 7x3 convs, calibrate activation absmax on sample
batches, per-output-channel symmetric int8 weights, then an all-XLA int8
forward with fused requant epilogues. ReLayNet-specific pieces:

* PReLU (single shared slope, torch default) applied in fp32 before the
  requant — monotone for alpha > 0, so int8 max-pool/argmax afterwards
  is exact w.r.t. the folded fp32 graph's pooling decisions.
* Index max-pool / max-unpool (``ops.pooling``): argmax indices computed
  on int8 values (requant is monotone -> identical window argmax up to
  requant ties); unpool is pure data movement and keeps the scale.
* Decoder concat [skip, unpool]: the two halves arrive at different
  activation scales; the skip half's requant is folded into the
  consuming conv's weight quantization (skip feeds RAW int8 — same trick
  as the U-Net PSRP path, exact up to int8 weight rounding).

Reference provenance: ReLayNet per
`/root/reference/SOTAS/Lesions_Segment/ReLayNet_2017.py:21-116` (encoder
blocks :151-171, MaxUnpool decoder :182-187, 1x1 head :199-201); the
quantization machinery is TPU-native with no reference counterpart.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.pooling import max_pool_argmax, max_unpool

_EPS = 1e-5
_NBLOCKS = 7  # 3 encoders + bottleneck + 3 decoders, in call order


def fold_relaynet_bn(variables):
    """-> {"b{i}": {"w", "b", "alpha"}, "head": {"w", "b"}}; BN folded
    into each block's conv (conv bias included)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    layers = {}
    for i in range(_NBLOCKS):
        blk = f"ReLayNetBlock_{i}"
        w = np.asarray(params[blk]["Conv_0"]["Conv_0"]["kernel"])
        cb = np.asarray(params[blk]["Conv_0"]["Conv_0"]["bias"])
        bn_p = params[blk]["BatchNorm_0"]["BatchNorm_0"]
        bn_s = stats[blk]["BatchNorm_0"]["BatchNorm_0"]
        k = np.asarray(bn_p["scale"]) / np.sqrt(
            np.asarray(bn_s["var"]) + _EPS
        )
        layers[f"b{i}"] = {
            "w": (w * k).astype(np.float32),
            "b": (np.asarray(bn_p["bias"])
                  + (cb - np.asarray(bn_s["mean"])) * k).astype(np.float32),
            "alpha": np.float32(
                np.asarray(params[blk]["PReLU_0"]["alpha"]).reshape(())
            ),
        }
    head = params["Conv_0"]["Conv_0"]
    layers["head"] = {
        "w": np.asarray(head["kernel"], np.float32),
        "b": np.asarray(head["bias"], np.float32),
    }
    return layers


def _same_pad(w):
    ph, pw = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
    return [(ph, ph), (pw, pw)]


def _fconv(x, lw):
    y = jax.lax.conv_general_dilated(
        x, lw["w"], (1, 1), _same_pad(lw["w"]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + lw["b"]
    a = lw["alpha"]
    return jnp.where(y >= 0, y, a * y)


def relaynet_folded_forward(layers, x, taps=None):
    """fp32 forward over folded layers (the calibration/parity graph).

    ``taps`` (a dict) records per-tap activation absmax: "in" for the
    image, "b{i}_out" per block output."""

    def tap(key, t):
        if taps is not None:
            taps[key] = max(taps.get(key, 0.0), float(jnp.max(jnp.abs(t))))
        return t

    x = tap("in", x.astype(jnp.float32))
    skips, idxs = [], []
    h = x
    for i in range(3):
        s = tap(f"b{i}_out", _fconv(h, layers[f"b{i}"]))
        skips.append(s)
        h, idx = max_pool_argmax(s)
        idxs.append(idx)
    h = tap("b3_out", _fconv(h, layers["b3"]))
    for j, (s, idx) in enumerate(zip(reversed(skips), reversed(idxs))):
        up = max_unpool(h, idx)
        h = tap(f"b{4+j}_out",
                _fconv(jnp.concatenate([s, up], axis=-1),
                       layers[f"b{4+j}"]))
    hw = layers["head"]
    return jax.lax.conv_general_dilated(
        h, hw["w"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + hw["b"]


def calibrate_relaynet(layers, sample_batches):
    taps: dict = {}
    for b in sample_batches:
        relaynet_folded_forward(layers, jnp.asarray(b), taps)
    return taps


def _quant_w(w):
    s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
    s_w = np.maximum(s_w, 1e-12).astype(np.float32)
    return np.clip(np.round(w / s_w), -127, 127).astype(np.int8), s_w


def quantize_relaynet(layers, taps):
    """-> qparams for ``relaynet_int8_forward``. Decoder skip-half requant
    is folded into the weight quantization (see module docstring)."""
    s = {k: np.float32(max(v, 1e-12) / 127.0) for k, v in taps.items()}
    # conv input scale per block (pool/unpool/cat keep their input scales)
    in_scale = {
        "b0": s["in"], "b1": s["b0_out"], "b2": s["b1_out"],
        "b3": s["b2_out"],
        # decoder cat [skip, unpool(prev)] — quantized at the UNPOOL
        # half's scale; the skip half's ratio folds into the weights
        "b4": s["b3_out"], "b5": s["b4_out"], "b6": s["b5_out"],
    }
    skip_of = {"b4": "b2_out", "b5": "b1_out", "b6": "b0_out"}
    q = {}
    for i in range(_NBLOCKS):
        name = f"b{i}"
        lw = layers[name]
        w = lw["w"].copy()
        if name in skip_of:
            half = w.shape[2] // 2
            w[:, :, :half] *= s[skip_of[name]] / in_scale[name]
        w_q, s_w = _quant_w(w)
        q[name] = {"w_q": w_q, "s_w": s_w, "b": lw["b"],
                   "alpha": lw["alpha"]}
    hw_q, hs_w = _quant_w(layers["head"]["w"])
    q["head"] = {"w_q": hw_q, "s_w": hs_w, "b": layers["head"]["b"]}
    q["_act_scales"] = {**s, **{f"{k}_in": v for k, v in in_scale.items()}}
    return q


def _qconv_prelu(xq, s_in, layer, s_out):
    """int8 conv + PReLU + requant epilogue (fp32 epilogue, int8 out)."""
    acc = jax.lax.conv_general_dilated(
        xq, layer["w_q"], (1, 1), _same_pad(layer["w_q"]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_in * layer["s_w"]) + layer["b"]
    y = jnp.where(y >= 0.0, y, layer["alpha"] * y)
    return jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)


def relaynet_int8_forward(qparams, x):
    """Full int8 ReLayNet forward. x: fp32/bf16 NHWC -> fp32 logits."""
    s = qparams["_act_scales"]
    hq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s["in"]), -127, 127
    ).astype(jnp.int8)
    skips, idxs = [], []
    for i in range(3):
        sq = _qconv_prelu(hq, s[f"b{i}_in"], qparams[f"b{i}"],
                          s[f"b{i}_out"])
        skips.append(sq)
        hq, idx = max_pool_argmax(sq)
        idxs.append(idx)
    hq = _qconv_prelu(hq, s["b3_in"], qparams["b3"], s["b3_out"])
    for j, (sq, idx) in enumerate(zip(reversed(skips), reversed(idxs))):
        up = max_unpool(hq, idx)
        # skip feeds RAW int8 — its requant is folded into the conv weights
        cat = jnp.concatenate([sq, up], axis=-1)
        hq = _qconv_prelu(cat, s[f"b{4+j}_in"], qparams[f"b{4+j}"],
                          s[f"b{4+j}_out"])
    hw = qparams["head"]
    acc = jax.lax.conv_general_dilated(
        hq, hw["w_q"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (s["b6_out"] * hw["s_w"]) + hw["b"]
