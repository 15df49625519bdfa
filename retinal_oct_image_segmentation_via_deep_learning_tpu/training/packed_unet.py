"""Packed (PSRP bf16) training forward for the flagship U-Net.

XLA trains the f=32 U-Net at ~26 TFLOPs on its full-res convs (the GEMM
N dim pads 32 -> 128 lanes; perf/convroof_probe.py) — the measured step
is 359 ms at 512^2 b32. This module runs the SAME model (same Flax
variable tree from ``models.unet.UNet``, same math) with activations in
the serving path's phase-split row-packed layout and every 3x3 conv on
``ops.pallas_conv_bf16.conv3x3_psrp_bf16`` (banded GEMM, N=by*cout=128,
2.4x faster than XLA fwd+bwd at the 512^2/32ch geometry on-chip).

Layout plan (f=32, 512^2 — mirrors inference/psrp.py):

    stage            layout                 conv impl
    blk0 conv0       NHWC (cin=1)           XLA (negligible FLOPs)
    blk0 conv1       P(4,4)                 Pallas bf16
    blk1 conv0/1     P(2,2)                 Pallas bf16
    blk2..blk6       P(1,1) (= NHWC view)   Pallas bf16 (100% band density)
    blk7 conv0/1     P(2,2)                 Pallas bf16
    blk8 conv0/1     P(4,4)                 Pallas bf16
    transpose convs  NHWC                   XLA (torch-exact dilated form)
    head 1x1         NHWC                   XLA

Pools are jnp max pairs on packed tensors (plane-pair + lane-row-pair,
landing exactly in the next stage's layout, as in serving); BatchNorm is
the existing fused one-pass ``ops.fused_bn.bn_train`` applied on a
(by, cin)-split lane view (per-channel stats are exact — the lane split
is a free reshape). The variable tree, running-stat updates (0.9/0.1,
stop-gradient), and all math match ``UNet.apply(train=True)`` up to bf16
accumulation order.

Reference provenance: trains the reference U-Net
(`/root/reference/SOTAS/Lesions_Segment/YNet_2022.py:509-602`).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.fused_bn import bn_train
from ..ops.pallas_conv_bf16 import conv3x3_psrp_bf16
from ..ops.pallas_conv_psrp import pack_psrp, unpack_psrp


def _interp():
    return jax.default_backend() != "tpu"


def _bn_packed(xp, by, bnp, updates: dict, path: str):
    """Fused train BN on a packed tensor via a (by, cin)-split lane view;
    records the running-stat update (flax 0.9/0.1 semantics) in
    ``updates[path]``."""
    *lead, L = xp.shape
    cin = L // by
    x2 = xp.reshape(*lead, by, cin) if by > 1 else xp
    y, mean, var = bn_train(x2, bnp["scale"], bnp["bias"])
    mean = jax.lax.stop_gradient(mean)
    var = jax.lax.stop_gradient(var)
    updates[path] = (mean, var)
    return y.reshape(*lead, L) if by > 1 else y


def _conv_bn_relu(xp, w, by, nph, tg, bnp, updates, path, interpret):
    y = conv3x3_psrp_bf16(xp.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                          by, nph, tg, interpret)
    y = _bn_packed(y, by, bnp, updates, path)
    return jax.nn.relu(y)


def _pool_packed(xp, by, nph, cout):
    """2x2/2 max pool on P(by, nph) -> P(by/2, nph/2) (the serving pool's
    math in jnp: plane-pair max then lane row-pair max)."""
    n, g, nph_, w2, L = xp.shape
    m = jnp.maximum(xp[:, :, 0::2], xp[:, :, 1::2])  # (n, g, nph/2, w2, L)
    m = m.reshape(n, g, nph // 2, w2, by // 2, 2, cout)
    m = jnp.max(m, axis=5)
    return m.reshape(n, g, nph // 2, w2, (by // 2) * cout)


def _cat_packed(a, b, by):
    """Concat along channels of two same-(by, nph) packed tensors: split
    lanes (by, c), concat, re-fuse (lane interleave)."""
    *lead, La = a.shape
    Lb = b.shape[-1]
    ca, cb = La // by, Lb // by
    out = jnp.concatenate(
        [a.reshape(*lead, by, ca), b.reshape(*lead, by, cb)], axis=-1
    )
    return out.reshape(*lead, La + Lb)


def _ct(x, ctp, dt):
    """torch-exact 2x2/2 transpose conv (models.blocks.ConvTranspose's
    dilated form)."""
    w = ctp["kernel"].astype(dt)
    y = jax.lax.conv_general_dilated(
        x.astype(dt), jnp.flip(w, axis=(0, 1)), (1, 1),
        [(1, 1), (1, 1)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + ctp["bias"].astype(y.dtype)


def packed_unet_apply(variables, x, *, tg: int | None = None,
                      remat: bool = False, deep: str | None = None,
                      mid: str | None = None,
                      logits_layout: str = "nhwc"):
    """Train-mode forward: (N, H, W, 1) -> (logits (N, H, W, nc) bf16,
    batch_stats updates pytree matching ``variables['batch_stats']``).

    Requires H, W divisible by 16 and ``init_features`` such that the
    packed stages' lanes are MXU-friendly (f=32 is the tuned config).

    ``deep`` selects the conv impl for the P(1,1) stages (blk2..blk6,
    cout >= 4f, where XLA has no lane-padding handicap): "xla"
    (lax.conv, default — beats the by=1 Pallas kernel by ~10.6 ms/step
    at 512^2 b16 on-chip) or "psrp". ``mid`` does the same for the H/2
    stages (blk1/blk7, cout = 2f): "xla" (default — NHWC end-to-end at
    H/2, no pack/unpack at those boundaries; 131.8 -> 126.8 ms on-chip)
    or "psrp". Pallas keeps only the full-res cout = f stages, where
    XLA's 32 -> 128 lane padding costs 4x. A/B'd in perf/packed_bisect.py.
    """
    p = variables["params"]
    _, H, W_, _ = x.shape
    if H % 16 or W_ % 16:
        raise ValueError(
            "packed_unet_apply needs H, W divisible by 16 (4 pools + the "
            f"P(4,4) packing), got {(H, W_)}"
        )
    dt = jnp.bfloat16
    tg = tg or int(os.environ.get("OCTSEG_PACKED_TG", "8"))
    deep = deep or os.environ.get("OCTSEG_PACKED_DEEP", "xla")
    mid = mid or os.environ.get("OCTSEG_PACKED_MID", "xla")
    interp = _interp()
    upd: dict = {}

    # remat_stages=True wraps blocks as CheckpointUNetBlock_N — resolve
    # either spelling so checkpoints from both model configs load
    def _blk(name):
        return p[name] if name in p else p["Checkpoint" + name]

    def W(blk, i):
        return _blk(blk)[f"Conv_{i}"]["Conv_0"]["kernel"]

    def BN(blk, i):
        return _blk(blk)[f"BatchNorm_{i}"]["BatchNorm_0"]

    def blk_packed(xp, blk, by, nph):
        def body(xp):
            # pure: BN stat updates returned, not written to `upd`, so the
            # body is safe under jax.checkpoint (no tracer leaks)
            stats = {}
            for i in (0, 1):
                xp = _conv_bn_relu(xp, W(blk, i), by, nph, tg, BN(blk, i),
                                   stats, f"{blk}/BatchNorm_{i}", interp)
            return xp, stats
        if remat:
            xp, stats = jax.checkpoint(body)(xp)
        else:
            xp, stats = body(xp)
        upd.update(stats)
        return xp

    def blk_xla(h, blk):
        def body(h):
            stats = {}
            for i in (0, 1):
                h = jax.lax.conv_general_dilated(
                    h.astype(dt), W(blk, i).astype(dt), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                h = _bn_packed(h, 1, BN(blk, i), stats,
                               f"{blk}/BatchNorm_{i}")
                h = jax.nn.relu(h)
            return h, stats
        if remat:
            h, stats = jax.checkpoint(body)(h)
        else:
            h, stats = body(h)
        upd.update(stats)
        return h

    def blk_deep(h, blk):
        if deep == "xla":
            return blk_xla(h, blk)
        n, hh, ww, c = h.shape
        xp = h.reshape(n, hh, 1, ww, c)
        xp = blk_packed(xp, blk, 1, 1)
        return xp.reshape(n, hh, ww, xp.shape[-1])

    def dpool(h):
        n, hh, ww, c = h.shape
        return jnp.max(h.reshape(n, hh // 2, 2, ww // 2, 2, c),
                       axis=(2, 4))

    # --- encoder
    # stem (1 -> f): XLA conv, then BN/relu, then pack
    h = jax.lax.conv_general_dilated(
        x.astype(dt), W("UNetBlock_0", 0).astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h = _bn_packed(h, 1, BN("UNetBlock_0", 0), upd,
                   "UNetBlock_0/BatchNorm_0")
    h = jax.nn.relu(h)
    f = h.shape[-1]
    hp = pack_psrp(h, 4, 4)
    enc1 = _conv_bn_relu(hp, W("UNetBlock_0", 1), 4, 4, tg,
                         BN("UNetBlock_0", 1), upd,
                         "UNetBlock_0/BatchNorm_1", interp)
    h22 = _pool_packed(enc1, 4, 4, f)
    if mid == "xla":
        # NHWC end-to-end at H/2: unpack once after the pool, nothing to
        # repack until the decoder's blk8 boundary
        enc2 = blk_xla(unpack_psrp(h22, 2, 2), "UNetBlock_1")
        hd = dpool(enc2)
    else:
        enc2 = blk_packed(h22, "UNetBlock_1", 2, 2)
        hp = _pool_packed(enc2, 2, 2, 2 * f)
        n, g, _, w2, L = hp.shape
        hd = hp.reshape(n, g, w2, L)  # P(1,1) == NHWC at H/4
    enc3 = blk_deep(hd, "UNetBlock_2")
    enc4 = blk_deep(dpool(enc3), "UNetBlock_3")
    bott = blk_deep(dpool(enc4), "UNetBlock_4")

    # --- decoder
    d = _ct(bott, p["ConvTranspose_0"], dt)
    d = blk_deep(jnp.concatenate([d, enc4], axis=-1), "UNetBlock_5")
    d = _ct(d, p["ConvTranspose_1"], dt)
    d = blk_deep(jnp.concatenate([d, enc3], axis=-1), "UNetBlock_6")
    d = _ct(d, p["ConvTranspose_2"], dt)
    if mid == "xla":
        d7 = blk_xla(jnp.concatenate([d, enc2], axis=-1), "UNetBlock_7")
        d = _ct(d7, p["ConvTranspose_3"], dt)
    else:
        dp = pack_psrp(d, 2, 2)
        d7 = blk_packed(_cat_packed(dp, enc2, 2), "UNetBlock_7", 2, 2)
        d = _ct(unpack_psrp(d7, 2, 2), p["ConvTranspose_3"], dt)
    dp = pack_psrp(d, 4, 4)
    d8 = blk_packed(_cat_packed(dp, enc1, 4), "UNetBlock_8", 4, 4)
    h = unpack_psrp(d8, 4, 4)

    hk = p["Conv_0"]["Conv_0"]
    if logits_layout == "nchw":
        # class-major head for the fused Pallas loss (ops/pallas_loss):
        # the layout change folds into the head matmul, no transpose op
        logits = (
            jnp.einsum("nhwc,co->nohw", h.astype(dt),
                       hk["kernel"][0, 0].astype(dt))
            + hk["bias"].astype(dt)[None, :, None, None]
        )
    else:
        logits = (
            jnp.einsum("nhwc,co->nhwo", h.astype(dt),
                       hk["kernel"][0, 0].astype(dt))
            + hk["bias"].astype(dt)
        )

    # running-stat updates in the model's batch_stats tree structure
    old = variables["batch_stats"]
    new_stats = {
        blk: {
            bni: {"BatchNorm_0": dict(old[blk][bni]["BatchNorm_0"])}
            for bni in old[blk]
        }
        for blk in old
    }
    for path, (mean, var) in upd.items():
        blk, bni = path.split("/")
        if blk not in new_stats:
            blk = "Checkpoint" + blk
        leaf = new_stats[blk][bni]["BatchNorm_0"]
        leaf["mean"] = 0.9 * leaf["mean"] + 0.1 * mean
        leaf["var"] = 0.9 * leaf["var"] + 0.1 * var
    return logits, new_stats


def make_packed_train_step(loss_fn, class_weights=None, *,
                           tg: int | None = None, remat: bool = False,
                           deep: str | None = None, mid: str | None = None,
                           fused_loss: bool | None = None):
    """Drop-in replacement for ``trainer.make_train_step`` on the flagship
    U-Net: same TrainState contract, forward via ``packed_unet_apply``.

    ``fused_loss=True`` (only valid when the objective is dice_ce)
    replaces ``loss_fn`` with the one-pass Pallas kernel twin
    (``ops.pallas_loss.dice_ce_loss_pallas``) on a class-major head —
    same value/gradients to float tolerance."""
    if fused_loss is None:
        fused_loss = bool(int(os.environ.get("OCTSEG_PACKED_FUSED_LOSS",
                                             "0")))

    def train_step(state, images, labels):
        def loss_of(params):
            logits, new_stats = packed_unet_apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, tg=tg, remat=remat, deep=deep, mid=mid,
                logits_layout="nchw" if fused_loss else "nhwc",
            )
            if fused_loss:
                from ..ops.pallas_loss import dice_ce_loss_pallas

                loss = dice_ce_loss_pallas(logits, labels, class_weights,
                                           nchw=True)
            else:
                loss = loss_fn(logits, labels, class_weights)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state.replace(batch_stats=new_stats), loss

    return train_step
