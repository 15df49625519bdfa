"""Fully-Pallas int8 U-Net serving forward on row-packed activations.

The endgame of the round-2 layout war (docs/PERF.md): any XLA conv in a
graph containing Pallas custom calls triggers global layout-assignment
conflicts (batch-minor conv layouts vs the custom calls' default layouts),
costing full-resolution relayout copies and unfused epilogues. Here the
shallow stages run on ``ops.pallas_conv_packed`` kernels over row-packed
int8 activations (rows in lanes -> full 128-lane GEMMs at 32/64 channels,
no HBM tile padding), the deep stages on ``ops.pallas_conv_int8``, and XLA
handles only elementwise glue, pools, and the four 2x2 transpose convs.

Skip concats are folded into the following conv's GEMM (two packed inputs,
channels interleaved per patch row-group), and the skip's requantization
(s_skip -> s_cat) is folded into the conv's *weight quantization* — the
skip-half columns of the float kernel are pre-scaled by s_skip/s_cat before
int8 rounding, so no separate requant pass exists at all.

The head (1x1 conv) + per-pixel argmax run fused in one kernel emitting
int8 labels — the serving output — instead of round-tripping bf16 logits
through HBM (measured 7.9 ms/batch).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.pallas_conv_int8 import conv3x3_int8, pack_weights
from ..ops.pallas_conv_packed import (
    conv3x3_int8_packed,
    finish_pool_w,
    head_argmax_packed,
    pack_head_weights,
    pack_rows,
    pack_stem_weights,
    stem_conv3x3_int8_packed,
    unpack_rows,
)
from .quantized import DEEP_STAGES, _pick_th, _pool, _qconv, quantize_unet

BY = 4  # shallow row-packing factor (lanes = 4*32 = 128 at the 32-ch level)
STEM_BY = 32  # deep row packing of the 1-channel input image

# shallow 3x3 stages running on the packed kernel, with their (cins) layout;
# cat stages list (up, skip) channel splits.
PACKED_STAGES = {
    "blk0_conv1": (32,),
    "blk1_conv0": (32,),
    "blk1_conv1": (64,),
    "blk7_conv0": (64, 64),
    "blk7_conv1": (64,),
    "blk8_conv0": (32, 32),
    "blk8_conv1": (32,),
}


def _quant_w(w):
    s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
    s_w = np.maximum(s_w, 1e-12).astype(np.float32)
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    return w_q, s_w


def quantize_unet_packed(layers, taps, init_features: int = 32):
    """qparams for ``unet_packed_forward`` (f=init_features U-Net).

    Extends ``quantize_unet`` with: stem/head packed weights, by=BY banded
    weights for the shallow stages (skip-requant folded into the cat convs'
    weight quantization), by=1 banded weights for the deep stages.
    """
    assert init_features == 32, "packing table assumes f=32"
    q = quantize_unet(layers, taps, pallas=False)
    s = {k: np.float32(v) for k, v in q["_act_scales"].items()}

    for name in DEEP_STAGES:
        q[name]["w_packed"] = pack_weights(q[name]["w_q"], 1)

    # cat convs: pre-scale the skip-half float weights by s_skip/s_cat, then
    # re-quantize (replaces the explicit skip requant pass exactly, up to
    # int8 weight rounding).
    skip_scale = {
        "blk7_conv0": s["blk2_conv0_in"] / s["blk7_cat"],
        "blk8_conv0": s["blk1_conv0_in"] / s["blk8_cat"],
    }
    for name, cins in PACKED_STAGES.items():
        w = layers[name]["w"].copy()
        if name in skip_scale:
            w[:, :, cins[0]:, :] *= skip_scale[name]
        w_q, s_w = _quant_w(w)
        q[name]["w_q"], q[name]["s_w"] = w_q, s_w
        q[name]["w_packed_by"] = pack_weights(w_q, BY)

    q["blk0_conv0"]["w_stem"] = pack_stem_weights(
        q["blk0_conv0"]["w_q"], STEM_BY
    )
    q["head"]["w_head"] = pack_head_weights(q["head"]["w_q"], BY)
    return q


def ct_dot(xq, s_in, layer, s_out, pack_by: int | None = None):
    """2x2/2 transpose conv as a per-pixel int8 dot + one transpose pass.

    The XLA lhs-dilated transpose convs measured ~45 ms/batch of glue in the
    packed graph (dilated-input pad fusions, batch-minor relayout copies,
    unfused requants — round-2 trace). Here: out[2r+dy, 2w+dx] = x[r,w] @
    w[dy,dx] becomes one dot_general to (N, H, W, 2, 2, co) with the requant
    fused elementwise, and a single transpose materializes either the
    standard (N, 2H, 2W, co) layout or directly the row-packed layout
    (pack_by), folding ``pack_rows`` into the same pass.
    """
    w_q = layer["w_q"]  # (2, 2, cin, cout)
    kh, kw, cin, cout = w_q.shape
    assert (kh, kw) == (2, 2)
    N, H, W, _ = xq.shape
    wmat = jnp.reshape(
        jnp.transpose(w_q, (2, 0, 1, 3)), (cin, kh * kw * cout)
    )
    acc = jax.lax.dot_general(
        xq.reshape(N * H * W, cin), wmat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(N, H, W, 2, 2, cout)
    scale = (s_in / s_out) * jnp.tile(layer["s_w"], 4).reshape(2, 2, cout)
    y = acc.astype(jnp.float32) * scale + (layer["b"] / s_out)
    yq = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    if pack_by is None:
        # (n, r, w, dy, dx, c) -> (N, 2H, 2W, C)
        return jnp.transpose(yq, (0, 1, 3, 2, 4, 5)).reshape(
            N, 2 * H, 2 * W, cout
        )
    by = pack_by
    assert (2 * H) % by == 0
    # row-packed: out (n, g, w', (i, c)) with r' = by*g + i = 2r + dy,
    # w' = 2w + dx; split r -> (g, r2) with i = 2*r2 + dy.
    y6 = yq.reshape(N, (2 * H) // by, by // 2, W, 2, 2, cout)
    return jnp.transpose(y6, (0, 1, 3, 5, 2, 4, 6)).reshape(
        N, (2 * H) // by, 2 * W, by * cout
    )


def unet_packed_forward(qparams, x, num_classes: int):
    """x: (N, H, W, 1) fp32/bf16 -> (N, H, W) int8 argmax labels."""
    s = qparams["_act_scales"]
    N, H, W, _ = x.shape
    interp = jax.default_backend() != "tpu"  # CPU tests: interpret mode

    def eff_scale(name, in_key, out_key):
        lw = qparams[name]
        return (s[in_key] * lw["s_w"] / s[out_key],
                lw["b"] / s[out_key])

    # --- stem: quantize + deep-row-pack the image, banded stem GEMM ---
    xq = jnp.clip(
        jnp.round(x[..., 0].astype(jnp.float32) / s["blk0_conv0_in"]),
        -127, 127,
    ).astype(jnp.int8)
    xp = pack_rows(xq[..., None], STEM_BY).reshape(N, H // STEM_BY, W, STEM_BY)
    sc, b = eff_scale("blk0_conv0", "blk0_conv0_in", "blk0_conv1_in")
    h = stem_conv3x3_int8_packed(
        xp, qparams["blk0_conv0"]["w_stem"], sc, b, BY=STEM_BY, by_out=BY,
        interpret=interp,
    )  # (N, H/BY, W, BY*32)

    def pconv(inputs, name, in_key, out_key, cins, pool=False):
        scale, bias = eff_scale(name, in_key, out_key)
        # fuse_dx stays off: Mosaic can't lane-concat the three dx-shifted
        # patch slices (offset mismatch on non-concat dim); the K=192
        # 1.5-pass cost at 32ch stands until the patches are rebuilt with
        # offset-aligned rolls.
        return conv3x3_int8_packed(
            tuple(inputs), qparams[name]["w_packed_by"], scale, bias,
            by=BY, cins=cins, pool=pool, interpret=interp,
        )

    enc0, hp = pconv([h], "blk0_conv1", "blk0_conv1_in",
                     "blk1_conv0_in", (32,), pool=True)
    h = finish_pool_w(hp)
    h = pconv([h], "blk1_conv0", "blk1_conv0_in", "blk1_conv1_in", (32,))
    enc1, hp = pconv([h], "blk1_conv1", "blk1_conv1_in", "blk2_conv0_in",
                     (64,), pool=True)
    h = finish_pool_w(hp)

    # --- deep region (unpacked, by=1 kernels + XLA transpose convs) ---
    hq = unpack_rows(h, BY)  # (N, H/4, W/4, 64) int8 at s[blk2_conv0_in]

    def dconv(hq, name, in_key, out_key):
        layer = qparams[name]
        if jax.default_backend() == "tpu":
            scale = s[in_key] * layer["s_w"] / s[out_key]
            bias = layer["b"] / s[out_key]
            return conv3x3_int8(
                hq, layer["w_packed"], scale, bias, by=1, relu=True,
                out_int8=True, th=_pick_th(hq.shape[1]),
            )
        return _qconv(hq, s[in_key], layer, s[out_key])

    deep_enc = []
    for i in (2, 3):
        hq = dconv(hq, f"blk{i}_conv0", f"blk{i}_conv0_in",
                   f"blk{i}_conv1_in")
        nxt = f"blk{i+1}_conv0_in"
        hq = dconv(hq, f"blk{i}_conv1", f"blk{i}_conv1_in", nxt)
        deep_enc.append((hq, s[nxt]))
        hq = _pool(hq)
    hq = dconv(hq, "blk4_conv0", "blk4_conv0_in", "blk4_conv1_in")
    hq = dconv(hq, "blk4_conv1", "blk4_conv1_in", "ct0_in")
    hs = s["ct0_in"]
    for ct, blk in ((0, 5), (1, 6)):
        cat_s = s[f"blk{blk}_cat"]
        up = ct_dot(hq, hs, qparams[f"ct{ct}"], cat_s)
        sk_q, sk_s = deep_enc[1 - ct]
        sk = jnp.clip(
            jnp.round(sk_q.astype(jnp.float32) * (sk_s / cat_s)), -127, 127
        ).astype(jnp.int8)
        hq = jnp.concatenate([up, sk], axis=-1)
        hq = dconv(hq, f"blk{blk}_conv0", f"blk{blk}_cat",
                   f"blk{blk}_conv1_in")
        nxt = f"ct{ct+1}_in"
        hq = dconv(hq, f"blk{blk}_conv1", f"blk{blk}_conv1_in", nxt)
        hs = s[nxt]

    # --- packed shallow decoder ---
    # ct2: XLA transpose conv (int8) then row-pack; skip requant is folded
    # into blk7_conv0's weights, so enc1 concats as-is.
    up = ct_dot(hq, hs, qparams["ct2"], s["blk7_cat"], pack_by=BY)
    h = pconv([up, enc1], "blk7_conv0", "blk7_cat", "blk7_conv1_in",
              (64, 64))
    h = pconv([h], "blk7_conv1", "blk7_conv1_in", "ct3_in", (64,))
    up = ct_dot(unpack_rows(h, BY), s["ct3_in"], qparams["ct3"],
                s["blk8_cat"], pack_by=BY)
    h = pconv([up, enc0], "blk8_conv0", "blk8_cat", "blk8_conv1_in",
              (32, 32))
    h = pconv([h], "blk8_conv1", "blk8_conv1_in", "head_in", (32,))

    lw = qparams["head"]
    return head_argmax_packed(
        h, lw["w_head"], s["head_in"] * lw["s_w"], lw["b"], by=BY,
        nc=num_classes, interpret=interp,
    )
