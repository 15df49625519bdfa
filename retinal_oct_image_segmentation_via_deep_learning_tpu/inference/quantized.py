"""Int8 post-training-quantized U-Net inference (serving path).

Provides 4x smaller weights and int8 activations end-to-end (half the HBM
traffic of bf16). NOTE on compute: although v5e's MXU rates int8 at 2x bf16,
XLA's ``lax.conv`` int8 path measured *no* kernel-time win on this stack
(perf probe: 59.0ms int8 vs 56.5ms bf16 for the same 128ch conv) — the
throughput claim must come from a hand-written Pallas int8 matmul path,
which is future work; until then this module is a memory/serving feature
with a tested accuracy contract. This module provides:

1. ``fold_unet_bn``: folds inference BatchNorm into the preceding conv
   (w' = w * g/sqrt(v+eps), b' = beta - mean * g/sqrt(v+eps)) for the UNet
   parameter tree — exact at eval time.
2. ``calibrate_unet``: runs the folded fp32 forward over sample batches,
   recording per-tensor activation absmax at every quantization point.
3. ``quantize_unet``: per-output-channel symmetric int8 weights + the
   calibrated activation scales -> a flat qparams dict.
4. ``unet_int8_forward``: the full U-Net forward with int8 convs
   (``preferred_element_type=int32``) and int8 activations end-to-end —
   requantization is fused into each conv epilogue
   (acc * (s_in*s_w/s_out), relu as clamp[0,127]); max-pool and concat
   operate directly on int8 (order-preserving); transpose-convs run int8 as
   lhs-dilated convs.

Accuracy contract (tested): >=99% argmax agreement with the bf16 forward on
synthetic B-scans.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

_EPS = 1e-5  # torch BN epsilon, matching models.blocks.BatchNorm


# ---------------------------------------------------------------------------
# 1. BN folding over the UNet variables tree
# ---------------------------------------------------------------------------


def _unet_block_names(params):
    return sorted(
        (k for k in params if k.startswith("UNetBlock_")),
        key=lambda s: int(s.split("_")[1]),
    )


def fold_unet_bn(variables):
    """-> dict of layers: {name: {"w": (kh,kw,ci,co), "b": (co,)}} in forward
    order, BN folded. Layer names: blk{i}_conv{j}, ct{i}, head."""
    params = variables["params"]
    stats = variables["batch_stats"]
    layers = {}
    for blk in _unet_block_names(params):
        for j in (0, 1):
            w = np.asarray(params[blk][f"Conv_{j}"]["Conv_0"]["kernel"])
            bn_p = params[blk][f"BatchNorm_{j}"]["BatchNorm_0"]
            bn_s = stats[blk][f"BatchNorm_{j}"]["BatchNorm_0"]
            g = np.asarray(bn_p["scale"])
            beta = np.asarray(bn_p["bias"])
            mean = np.asarray(bn_s["mean"])
            var = np.asarray(bn_s["var"])
            k = g / np.sqrt(var + _EPS)
            i = int(blk.split("_")[1])
            layers[f"blk{i}_conv{j}"] = {
                "w": (w * k).astype(np.float32),
                "b": (beta - mean * k).astype(np.float32),
            }
    for name, node in params.items():
        if name.startswith("ConvTranspose_"):
            i = int(name.split("_")[1])
            layers[f"ct{i}"] = {
                "w": np.asarray(node["kernel"], np.float32),
                "b": np.asarray(node["bias"], np.float32),
            }
    head = params["Conv_0"]["Conv_0"]
    layers["head"] = {
        "w": np.asarray(head["kernel"], np.float32),
        "b": np.asarray(head["bias"], np.float32),
    }
    return layers


# ---------------------------------------------------------------------------
# shared forward skeleton over folded layers
# ---------------------------------------------------------------------------


def _same_pad(w):
    ph, pw = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
    return [(ph, ph), (pw, pw)]


def _conv(x, w, b, relu=True):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), _same_pad(w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(x.dtype)
    return jnp.maximum(y, 0) if relu else y


def _convt(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1)).astype(x.dtype), (1, 1),
        [(1, 1), (1, 1)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(x.dtype)


def _pool(x):
    if os.environ.get("OCTSEG_POOL") == "reshape":
        # reshape+max lowering: unlike reduce-window (which pins its operand
        # to the default layout, forcing relayout copies + unfused bias/relu
        # upstream of every shallow pool — round-2 trace), strided maxes are
        # layout-agnostic fusions. Slice to even extents first so odd H/W
        # agrees with the reduce-window VALID path (silent truncation).
        n, h, w, c = x.shape
        y = x[:, : h // 2 * 2, : w // 2 * 2].reshape(
            n, h // 2, 2, w // 2, 2, c
        )
        return jnp.max(jnp.max(y, axis=4), axis=2)
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype != jnp.int8 else jnp.int8(-128),
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


def folded_forward(layers, x, taps=None):
    """fp32 forward over folded layers; optionally records activation absmax
    into ``taps`` at every conv/convT input and the concat outputs."""

    def tap(name, t):
        if taps is not None:
            taps[name] = max(
                taps.get(name, 0.0), float(jnp.max(jnp.abs(t)))
            )
        return t

    def block(i, t):
        tap(f"blk{i}_conv0_in", t)
        t = _conv(t, layers[f"blk{i}_conv0"]["w"], layers[f"blk{i}_conv0"]["b"])
        tap(f"blk{i}_conv1_in", t)
        return _conv(t, layers[f"blk{i}_conv1"]["w"], layers[f"blk{i}_conv1"]["b"])

    enc = []
    h = x
    for i in range(4):
        h = block(i, h)
        enc.append(h)
        h = _pool(h)
    h = block(4, h)
    for ct, (blk, skip) in enumerate(zip((5, 6, 7, 8), (3, 2, 1, 0))):
        tap(f"ct{ct}_in", h)
        h = _convt(h, layers[f"ct{ct}"]["w"], layers[f"ct{ct}"]["b"])
        h = jnp.concatenate([h, enc[skip]], axis=-1)
        tap(f"blk{blk}_cat", h)
        h = block(blk, h)
    tap("head_in", h)
    return _conv(h, layers["head"]["w"], layers["head"]["b"], relu=False)


def calibrate_unet(layers, sample_batches):
    """Per-tensor absmax at each quantization point over calibration data."""
    taps: dict[str, float] = {}
    for xb in sample_batches:
        folded_forward(layers, jnp.asarray(xb, jnp.float32), taps)
    return taps


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------


def quantize_unet(layers, taps, pallas: bool = True):
    """-> qparams: int8 weights + fp32 scale vectors per layer.

    ``pallas=True`` additionally packs every 3x3 conv's weights into the
    block-banded layout of ``ops.pallas_conv_int8`` (``by`` output rows per
    GEMM block chosen to fill the MXU's 128 lanes: by = 128/cout, capped 4);
    ``unet_int8_forward`` then routes those convs through the Pallas int8
    kernel (332-386 TFLOPs measured on v5e vs XLA int8's bf16-rate)."""
    from ..ops.pallas_conv_int8 import pack_weights

    q = {}
    for name, lw in layers.items():
        w = lw["w"]
        s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0  # per out-channel
        s_w = np.maximum(s_w, 1e-12)
        w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
        q[name] = {
            "w_q": w_q,
            "s_w": s_w.astype(np.float32),
            "b": lw["b"],
        }
        cin, cout = w.shape[2], w.shape[3]
        # Pallas wins only when the contraction is MXU-deep (cin >= 128)
        # AND the output fills the lanes natively (cout >= 128, by == 1):
        # the by>1 5-D lane-packed output forces XLA layout copies around
        # every call, and the by>1 in-kernel lane-concats of sub-128 pieces
        # are slow (round-2 traces, docs/PERF.md). cin/cout < 128 stages
        # stay on lax.conv.
        if pallas and w.shape[:2] == (3, 3) and cin >= 128 and cout >= 128:
            q[name]["w_packed"] = pack_weights(w_q, 1)
    scales = {}
    for key, absmax in taps.items():
        scales[key] = np.float32(max(absmax, 1e-12) / 127.0)
    q["_act_scales"] = scales
    return q


def _pick_th(H):
    """Grid strip rows: 16 pipelines well (measured); whole-image for small H."""
    if H <= 32:
        return H
    return 16 if H % 16 == 0 else 8


# ---------------------------------------------------------------------------
# mixed-precision serving path (round 2)
# ---------------------------------------------------------------------------

# Stages whose convs sit deep enough (>=128 output channels at <=128^2
# resolution) that the Pallas int8 kernel beats XLA's bf16-rate int8 convs.
# blk2..blk6 form a CONTIGUOUS region of the U-Net's data flow — everything
# between pool(blk1) and ct2's input — so XLA<->Pallas layout boundaries
# (XLA convs pick batch-minor layouts; each crossing costs an unfused
# full-tensor relayout pass, ~2 ms at 512^2, measured round 2) occur only at
# the region's entry/exit where tensors are 16x smaller than full res.
DEEP_BLOCKS = (2, 3, 4, 5, 6)
DEEP_STAGES = tuple(
    f"blk{i}_conv{j}" for i in DEEP_BLOCKS for j in (0, 1)
)


def quantize_unet_mixed(layers, taps):
    """Params for ``unet_mixed_forward``: int8 (+Pallas-packed) deep stages,
    bf16 copies of every layer for the shallow stages, calibrated scales."""
    from ..ops.pallas_conv_int8 import pack_weights

    q = quantize_unet(layers, taps, pallas=False)
    for name in DEEP_STAGES:
        q[name]["w_packed"] = pack_weights(q[name]["w_q"], 1)
    for name, lw in layers.items():
        q[name]["w_bf16"] = lw["w"].astype(jnp.bfloat16)
        q[name]["b_f32"] = lw["b"].astype(np.float32)
    return q


def _bconv(layer, x, relu=True, transpose=False):
    w, b = layer["w_bf16"], layer["b_f32"]
    if transpose:
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(w, (0, 1)), (1, 1), [(1, 1), (1, 1)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), _same_pad(w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    y = y + b.astype(y.dtype)
    return jnp.maximum(y, 0) if relu else y


def unet_mixed_forward(qparams, x, *, shallow="bf16", deep="pallas"):
    """Mixed-precision U-Net serving forward.

    Shallow stages (blk0/1 encoder, blk7/8 + ct2/3 decoder, head) run in
    ``shallow`` precision ("bf16" exact-after-folding XLA convs — measured
    faster than XLA's lane-starved int8 at 32-64 channels — or "int8" XLA).
    Deep stages (blk2..blk6 + ct0/1) always run int8; with ``deep="pallas"``
    the ten 3x3 convs use the int8 MXU kernel (ops/pallas_conv_int8, ~2x
    XLA's rate at >=128 ch). Returns bf16/f32 logits.
    """
    s = qparams["_act_scales"]
    use_pallas = deep == "pallas" and jax.default_backend() == "tpu"
    # Optionally shield the XLA shallow stages from the Pallas region's
    # default-layout constraint (round-2 traces: without a barrier, layout
    # assignment propagates the custom call's layout up through pools into
    # the 512^2/256^2 stages, un-fusing conv epilogues and inserting ~6 ms
    # full-res relayout copies).
    barrier = (
        jax.lax.optimization_barrier
        if os.environ.get("OCTSEG_LAYOUT_BARRIER") == "1"
        else (lambda t: t)
    )

    def dconv(hq, in_key, name, out_key, relu=True):
        layer = qparams[name]
        s_in, s_out = s[in_key], s[out_key]
        if use_pallas and "w_packed" in layer:
            from ..ops.pallas_conv_int8 import conv3x3_int8

            scale = s_in * layer["s_w"] / s_out
            bias = layer["b"] / s_out
            return conv3x3_int8(
                hq, layer["w_packed"], scale, bias,
                by=1, relu=relu, out_int8=True, th=_pick_th(hq.shape[1]),
            )
        return _qconv(hq, s_in, layer, s_out, relu=relu)

    if shallow == "bf16":
        h = x.astype(jnp.bfloat16)
        h = _bconv(qparams["blk0_conv0"], h)
        h = _bconv(qparams["blk0_conv1"], h)
        enc0 = h
        h = _pool(h)
        h = _bconv(qparams["blk1_conv0"], h)
        h = _bconv(qparams["blk1_conv1"], h)
        enc1 = h
        h = _pool(h)
        # enter the int8 region
        hq = jnp.clip(
            jnp.round(h.astype(jnp.float32) / s["blk2_conv0_in"]), -127, 127
        ).astype(jnp.int8)
        hq = barrier(hq)
    else:
        hq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s["blk0_conv0_in"]), -127, 127
        ).astype(jnp.int8)
        shallow_enc = []
        for i in (0, 1):
            hq = _qconv(hq, s[f"blk{i}_conv0_in"], qparams[f"blk{i}_conv0"],
                        s[f"blk{i}_conv1_in"])
            nxt = f"blk{i+1}_conv0_in"
            hq = _qconv(hq, s[f"blk{i}_conv1_in"], qparams[f"blk{i}_conv1"],
                        s[nxt])
            shallow_enc.append((hq, s[nxt]))
            hq = _pool(hq)
        hq = barrier(hq)

    # --- contiguous int8 deep region: blk2 -> blk3 -> blk4 -> ct0 ->
    #     blk5 -> ct1 -> blk6 ---
    deep_enc = []
    for i in (2, 3):
        hq = dconv(hq, f"blk{i}_conv0_in", f"blk{i}_conv0",
                   f"blk{i}_conv1_in")
        nxt = f"blk{i+1}_conv0_in"
        hq = dconv(hq, f"blk{i}_conv1_in", f"blk{i}_conv1", nxt)
        deep_enc.append((hq, s[nxt]))
        hq = _pool(hq)
    hq = dconv(hq, "blk4_conv0_in", "blk4_conv0", "blk4_conv1_in")
    hq = dconv(hq, "blk4_conv1_in", "blk4_conv1", "ct0_in")
    hs = s["ct0_in"]
    for ct, blk in ((0, 5), (1, 6)):
        cat_s = s[f"blk{blk}_cat"]
        up = _qconv(hq, hs, qparams[f"ct{ct}"], cat_s, relu=False,
                    transpose=True)
        sk_q, sk_s = deep_enc[1 - ct]
        hq = jnp.concatenate([up, _requant(sk_q, sk_s, cat_s)], axis=-1)
        hq = dconv(hq, f"blk{blk}_cat", f"blk{blk}_conv0",
                   f"blk{blk}_conv1_in")
        nxt = f"ct{ct+1}_in"
        hq = dconv(hq, f"blk{blk}_conv1_in", f"blk{blk}_conv1", nxt)
        hs = s[nxt]

    # --- shallow decoder ---
    hq = barrier(hq)
    if shallow == "bf16":
        h = hq.astype(jnp.bfloat16) * jnp.bfloat16(hs)
        for ct, (blk, skip) in ((2, (7, enc1)), (3, (8, enc0))):
            h = _bconv(qparams[f"ct{ct}"], h, relu=False, transpose=True)
            h = jnp.concatenate([h, skip], axis=-1)
            h = _bconv(qparams[f"blk{blk}_conv0"], h)
            h = _bconv(qparams[f"blk{blk}_conv1"], h)
        return _bconv(qparams["head"], h, relu=False)
    for ct, (blk, skip) in ((2, (7, 1)), (3, (8, 0))):
        cat_s = s[f"blk{blk}_cat"]
        up = _qconv(hq, hs, qparams[f"ct{ct}"], cat_s, relu=False,
                    transpose=True)
        sk_q, sk_s = shallow_enc[skip]
        hq = jnp.concatenate([up, _requant(sk_q, sk_s, cat_s)], axis=-1)
        hq = _qconv(hq, cat_s, qparams[f"blk{blk}_conv0"],
                    s[f"blk{blk}_conv1_in"])
        nxt = "ct3_in" if ct == 2 else "head_in"
        hq = _qconv(hq, s[f"blk{blk}_conv1_in"], qparams[f"blk{blk}_conv1"],
                    s[nxt])
        hs = s[nxt]
    return _qconv(hq, s["head_in"], qparams["head"], None, relu=False)


def _qconv(xq, s_in, layer, s_out, relu=True, transpose=False,
           clip_out=127.0):
    """int8 conv + fused requant epilogue.

    xq int8, s_in scalar; layer holds w_q (int8) + per-channel s_w + fp bias.
    Output int8 at scale s_out (or fp32 when s_out is None). Runs on XLA
    convs everywhere; the Pallas int8 routes live in ``unet_mixed_forward``
    and ``inference/packed.py`` (mixing Pallas custom calls into THIS all-XLA
    graph measured slower end-to-end — layout-assignment conflicts, see
    docs/PERF.md round 2).
    """
    dn = ("NHWC", "HWIO", "NHWC")
    if transpose:
        # k=2/s=2 non-overlapping transpose: each output row depends on
        # exactly one input row (the other taps hit dilation zeros/pad), so
        # it is a LOCAL op under spatial (H-shard) partitioning — same
        # argument as the fp32 path (models/blocks.ConvTranspose).
        acc = jax.lax.conv_general_dilated(
            xq, jnp.flip(layer["w_q"], (0, 1)), (1, 1), [(1, 1), (1, 1)],
            lhs_dilation=(2, 2), dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
    else:
        # Spatial partitioning: exchange this conv's own padding rows with
        # mesh neighbors (zeros at the global border == unsharded 'same'
        # zero-padding), then convolve VALID in H — exact per-layer context
        # parallelism for the int8 serving graph (parallel/halo.py).
        from ..parallel.halo import current_spatial_axis, halo_exchange

        pad = _same_pad(layer["w_q"])
        axis = current_spatial_axis()
        if axis is not None and pad[0][0] > 0:
            xq = halo_exchange(xq, pad[0][0], axis_name=axis, edge="zero")
            pad = [(0, 0), pad[1]]
        acc = jax.lax.conv_general_dilated(
            xq, layer["w_q"], (1, 1), pad,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
    scale = s_in * layer["s_w"]  # (co,) fp32
    y = acc.astype(jnp.float32) * scale + layer["b"]
    if s_out is None:
        return y
    y = y / s_out
    lo = 0.0 if relu else -clip_out
    return jnp.clip(jnp.round(y), lo, clip_out).astype(jnp.int8)


def _requant(xq, s_from, s_to):
    return jnp.clip(
        jnp.round(xq.astype(jnp.float32) * (s_from / s_to)), -127, 127
    ).astype(jnp.int8)


def unet_int8_forward(qparams, x):
    """Full int8 U-Net forward. x: fp32/bf16 NHWC -> fp32 logits."""
    s = qparams["_act_scales"]

    def quant_in(t, key):
        return jnp.clip(
            jnp.round(t.astype(jnp.float32) / s[key]), -127, 127
        ).astype(jnp.int8), s[key]

    # Quantized activations flow with explicit scale bookkeeping.
    enc = []  # (tensor_q, scale)
    hq, hs = quant_in(x, "blk0_conv0_in")
    for i in range(4):
        hq = _qconv(hq, s[f"blk{i}_conv0_in"], qparams[f"blk{i}_conv0"],
                    s[f"blk{i}_conv1_in"])
        # output scale of block = next stage's input scale
        nxt = f"blk{i+1}_conv0_in"
        hq = _qconv(hq, s[f"blk{i}_conv1_in"], qparams[f"blk{i}_conv1"],
                    s[nxt])
        enc.append((hq, s[nxt]))
        hq = _pool(hq)  # int8 max-pool, scale unchanged

    hq = _qconv(hq, s["blk4_conv0_in"], qparams["blk4_conv0"],
                s["blk4_conv1_in"])
    hq = _qconv(hq, s["blk4_conv1_in"], qparams["blk4_conv1"], s["ct0_in"])
    hs = s["ct0_in"]

    for ct, (blk, skip) in enumerate(zip((5, 6, 7, 8), (3, 2, 1, 0))):
        cat_s = s[f"blk{blk}_cat"]
        up = _qconv(hq, hs, qparams[f"ct{ct}"], cat_s, relu=False,
                    transpose=True)
        sk_q, sk_s = enc[skip]
        sk = _requant(sk_q, sk_s, cat_s)
        hq = jnp.concatenate([up, sk], axis=-1)
        hq = _qconv(hq, cat_s, qparams[f"blk{blk}_conv0"],
                    s[f"blk{blk}_conv1_in"])
        nxt = f"ct{ct+1}_in" if ct < 3 else "head_in"
        hq = _qconv(hq, s[f"blk{blk}_conv1_in"], qparams[f"blk{blk}_conv1"],
                    s[nxt])
        hs = s[nxt]

    return _qconv(hq, s["head_in"], qparams["head"], None, relu=False)
