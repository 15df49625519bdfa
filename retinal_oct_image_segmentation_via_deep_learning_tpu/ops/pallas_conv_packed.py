"""Row-packed Pallas int8 3x3 convs — the shallow-stage serving hot path.

Problem (round-2 traces, docs/PERF.md): the U-Net's 512^2/256^2 stages have
32/64 channels. With channels in the lane dimension a default-layout tensor
wastes 4x/2x of every HBM tile AND a cout-lane GEMM uses a quarter of the
MXU; XLA dodges this with batch-minor conv layouts, but those layouts clash
with every Pallas custom call in the graph, and layout assignment then
spreads relayout copies + unfused epilogues through the whole XLA side
(mixed graphs measured *slower* than no Pallas at all).

Solution: keep shallow activations in a ROW-PACKED layout

    P[n, g, w, (i, ci)] = x[n, by*g + i, w, ci],   lanes = by*cin >= 128

between kernels, and make every shallow-stage op a Pallas kernel (or a
layout-agnostic XLA elementwise op) so XLA never sees a conv:

* ``conv3x3_int8_packed`` — the block-banded GEMM of ops/pallas_conv_int8
  (same ``pack_weights`` matrix: K = 3*(by+2)*cin per dx group, N = by*cout)
  reading and writing packed tensors directly. The (by+2) patch row-groups
  are lane-slices/concats of the packed tile — no strided-row reshape trick,
  no 5-D output, no unpacking. Supports a second packed input (skip
  concat folded into the GEMM's K dim) and a fused requant epilogue.
* ``stem_conv3x3_int8_packed`` — the 1-channel stem as a deep-row-packed
  (by_in=32) banded GEMM, N = 32 rows * cout lanes.
* ``head_argmax_packed`` — fused 1x1 head + per-pixel argmax emitting packed
  uint8 labels (the bf16-logits HBM round-trip measured 7.9 ms/batch).
* ``maxpool2x2_packed`` — lane-slice maxes + strided group concat in XLA
  (elementwise only; no layout constraints).

All kernels: stride 1, 'same' zero padding, int8 in/out with per-channel
requant scale/bias like ops/pallas_conv_int8.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv_int8 import pack_weights  # same banded layout


# ---------------------------------------------------------------------------
# packing transforms (XLA; used only at region boundaries)
# ---------------------------------------------------------------------------


def pack_rows(x, by: int):
    """(N, H, W, C) -> (N, H//by, W, by*C) with lane order (row-in-group, c)."""
    n, h, w, c = x.shape
    assert h % by == 0, (h, by)
    return x.reshape(n, h // by, by, w, c).transpose(0, 1, 3, 2, 4).reshape(
        n, h // by, w, by * c
    )


def unpack_rows(p, by: int):
    """Inverse of pack_rows."""
    n, g, w, l = p.shape
    c = l // by
    return p.reshape(n, g, w, by, c).transpose(0, 1, 3, 2, 4).reshape(
        n, g * by, w, c
    )


def finish_pool_w(p):
    """W half of the 2x2 pool on a row-pooled packed tensor (one fused
    elementwise max of even/odd W columns)."""
    return jnp.maximum(p[:, :, 0::2], p[:, :, 1::2])


def maxpool2x2_packed(p, by: int):
    """2x2/2 max-pool on a row-packed tensor, packed in and out (same by).

    Row pairs are lane-group maxes; group pairs concat back into lanes via
    even/odd strides on the (major) group dim. All layout-agnostic XLA ops.
    """
    n, g, w, l = p.shape
    c = l // by
    assert by % 2 == 0 and g % 2 == 0, (by, g)
    # w pairs (strided max over the w dim)
    pw = jnp.max(p.reshape(n, g, w // 2, 2, l), axis=3)
    # row pairs within each group: lanes (2j, c) vs (2j+1, c)
    pr = pw.reshape(n, g, w // 2, by // 2, 2, c)
    rp = jnp.max(pr, axis=4).reshape(n, g, w // 2, (by // 2) * c)
    # group pairs: out group g' takes rows from in groups 2g' then 2g'+1
    return jnp.concatenate([rp[:, 0::2], rp[:, 1::2]], axis=-1)


# ---------------------------------------------------------------------------
# packed 3x3 conv kernel (aligned: same `by` in and out)
# ---------------------------------------------------------------------------


def _packed_kernel(tg, by, W, cins, cout, relu, out_int8, fuse_dx, pool,
                   interp=False):
    """cins: tuple of per-input channel counts (len 1 or 2, concat folded)."""

    def kernel(*refs):
        n_in = len(cins)
        # refs: [top_i, body_i, bot_i] * n_in, w, scale, bias, out[, pooled]
        w_ref, scale_ref, bias_ref = refs[3 * n_in : 3 * n_in + 3]
        o_ref = refs[3 * n_in + 3]
        s = pl.program_id(1)
        ns = pl.num_programs(1)

        groups = []  # per (j) patch row-groups, each (tg, W, sum(cins))
        per_input = []
        for k, cin in enumerate(cins):
            top_ref, body_ref, bot_ref = refs[3 * k : 3 * k + 3]
            body = body_ref[0]  # (tg, W, by*cin)
            top_last = jnp.where(
                s == 0, jnp.int8(0), top_ref[0, 0, :, (by - 1) * cin :]
            )  # (W, cin)
            bot_first = jnp.where(
                s == ns - 1, jnp.int8(0), bot_ref[0, 0, :, :cin]
            )
            prev_rows = jnp.concatenate(
                [top_last[None], body[:-1, :, (by - 1) * cin :]], axis=0
            )  # (tg, W, cin)
            next_rows = jnp.concatenate(
                [body[1:, :, :cin], bot_first[None]], axis=0
            )
            rows = [prev_rows] + [
                body[:, :, i * cin : (i + 1) * cin] for i in range(by)
            ] + [next_rows]
            per_input.append(rows)
        # interleave row-groups across inputs: for each j, channels of all
        # inputs concat (matching pack_weights' ci order over cat channels)
        for j in range(by + 2):
            groups.append(
                jnp.concatenate([per_input[k][j] for k in range(n_in)],
                                axis=-1)
                if n_in > 1 else per_input[0][j]
            )

        cin_tot = sum(cins)
        kdx = (by + 2) * cin_tot
        X = jnp.concatenate(groups, axis=-1)  # (tg, W, (by+2)*cin_tot)
        Xp = jnp.pad(X, ((0, 0), (1, 1), (0, 0)))
        if fuse_dx:
            # one K = 3*kdx dot: at cin=32/by=4 the per-dx K=192 rounds
            # up to 2 MXU passes (75% K-efficiency, matches measurement);
            # K=576 -> 5 passes (90%). STATUS: blocked on TPU — Mosaic
            # refuses both the lane-concat of offset-shifted slices
            # ("offset mismatch on non-concat dimension") and
            # tpu.dynamic_rotate on the sublane dim of a 3-D int8 vector,
            # so the offset-0 rebuild cannot be expressed. Kept for
            # interpret-mode equivalence + as the round-3 lever.
            def dx_part(dx):
                if dx == 0 or interp:
                    return Xp[:, dx : dx + W, :]
                # roll must be non-negative: -dx == (W+2-dx) mod (W+2)
                return pltpu.roll(Xp, W + 2 - dx, axis=1)[:, :W, :]

            patch = jnp.concatenate(
                [dx_part(dx) for dx in range(3)], axis=-1
            ).reshape(tg * W, 3 * kdx)
            acc = jax.lax.dot_general(
                patch, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            acc = None
            for dx in range(3):
                patch = Xp[:, dx : dx + W, :].reshape(tg * W, kdx)
                part = jax.lax.dot_general(
                    patch, w_ref[dx * kdx : (dx + 1) * kdx, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = part if acc is None else acc + part

        yf = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
        if relu:
            yf = jnp.maximum(yf, 0.0)
        y = yf
        if out_int8:
            y = jnp.clip(jnp.round(yf), -127.0, 127.0).astype(jnp.int8)
        o_ref[0] = y.reshape(tg, W, by * cout)
        if pool:
            # Row half of the 2x2 max-pool, fused: row pairs are lane-group
            # maxes IN FP32 (max commutes with the monotone round/clip;
            # Mosaic legalizes neither int8 maxsi nor int8 axis-reductions),
            # group pairs concat back into lanes via even/odd group rows.
            # The W half is one fused XLA strided max (``finish_pool_w``).
            p_ref = refs[3 * n_in + 4]
            c = cout
            yr = yf.reshape(tg, W, by * cout)
            rp = jnp.concatenate(
                [
                    jnp.maximum(yr[..., 2 * i * c : (2 * i + 1) * c],
                                yr[..., (2 * i + 1) * c : (2 * i + 2) * c])
                    for i in range(by // 2)
                ],
                axis=-1,
            )  # (tg, W, by//2 * c) fp32
            rp = jnp.clip(jnp.round(rp), -127.0, 127.0).astype(jnp.int8)
            ev = rp.reshape(tg // 2, 2, W, (by // 2) * c)
            p_ref[0] = jnp.concatenate([ev[:, 0], ev[:, 1]], axis=-1)

    return kernel


@partial(jax.jit, static_argnames=("by", "cins", "relu", "out_int8", "tg",
                                   "fuse_dx", "pool", "interpret"))
def conv3x3_int8_packed(inputs, w_packed, scale, bias, *, by, cins,
                        relu=True, out_int8=True, tg=8, fuse_dx=False,
                        pool=False, interpret=False):
    """Row-packed int8 3x3 conv (+ optional folded skip-concat).

    inputs: tuple of packed int8 tensors (N, G, W, by*cin_k) — two entries
    fold ``concat([a, b], channel)`` into the conv. w_packed:
    ``pack_weights(w, by)`` of the (3, 3, sum(cins), cout) kernel. scale/bias:
    (cout,) fp32 requant params. Returns packed (N, G, W, by*cout); with
    ``pool=True`` returns (full, half_pooled (N, G//2, W, by*cout)):
    the pool's row half fused into the epilogue; finish with
    ``finish_pool_w`` (one fused XLA elementwise max).
    """
    if not isinstance(inputs, (tuple, list)):
        inputs = (inputs,)
    N, G, W, L0 = inputs[0].shape
    assert L0 == by * cins[0], (inputs[0].shape, by, cins)
    cin_tot = sum(cins)
    cout = w_packed.shape[1] // by
    assert w_packed.shape[0] == (by + 2) * 3 * cin_tot
    tg = min(tg, G)
    assert G % tg == 0, (G, tg)
    if pool:
        assert by % 2 == 0 and tg % 2 == 0 and out_int8
    S = G // tg

    scale_p = jnp.tile(scale, by)[None]
    bias_p = jnp.tile(bias, by)[None]
    out_dtype = jnp.int8 if out_int8 else jnp.float32

    in_specs = []
    operands = []
    for k, cin in enumerate(cins):
        Lk = by * cin
        in_specs += [
            pl.BlockSpec((1, 1, W, Lk),
                         lambda n, s: (n, jnp.maximum(s * tg - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tg, W, Lk), lambda n, s: (n, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Lk),
                         lambda n, s: (n, jnp.minimum((s + 1) * tg, G - 1),
                                       0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [inputs[k]] * 3
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

    out_specs = pl.BlockSpec((1, tg, W, by * cout),
                             lambda n, s: (n, s, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((N, G, W, by * cout), out_dtype)
    if pool:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, tg // 2, W, by * cout),
                         lambda n, s: (n, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((N, G // 2, W, by * cout), jnp.int8),
        ]

    out = pl.pallas_call(
        _packed_kernel(tg, by, W, tuple(cins), cout, relu, out_int8,
                       fuse_dx, pool, interp=interpret),
        grid=(N, S),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands, w_packed, scale_p, bias_p)
    return out


# ---------------------------------------------------------------------------
# stem: 1-channel input, deep row packing (by_in = 32), by_out packing
# ---------------------------------------------------------------------------


def _stem_kernel(BY, by_out, W, cout, relu):
    def kernel(top_ref, body_ref, bot_ref, w_ref, scale_ref, bias_ref, o_ref):
        s = pl.program_id(1)
        ns = pl.num_programs(1)
        body = body_ref[0, 0]  # (W, BY)
        top = jnp.where(s == 0, jnp.int8(0), top_ref[0, 0, :, BY - 1])
        bot = jnp.where(s == ns - 1, jnp.int8(0), bot_ref[0, 0, :, 0])
        X = jnp.concatenate([top[:, None], body, bot[:, None]], axis=-1)
        Xp = jnp.pad(X, ((1, 1), (0, 0)))  # (W+2, BY+2)
        K = BY + 2
        acc = None
        for dx in range(3):
            patch = Xp[dx : dx + W, :]  # (W, BY+2)
            part = jax.lax.dot_general(
                patch, w_ref[dx * K : (dx + 1) * K, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (W, BY*cout)
            acc = part if acc is None else acc + part
        y = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
        if relu:
            y = jnp.maximum(y, 0.0)
        y = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
        # (W, BY*cout) -> out groups: rows split into BY//by_out out-groups
        g2 = BY // by_out
        for u in range(g2):
            o_ref[0, u] = y[:, u * by_out * cout : (u + 1) * by_out * cout]

    return kernel


def pack_stem_weights(w, BY: int = 32):
    """(3, 3, 1, cout) -> ((BY+2)*3, BY*cout) banded stem matrix."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw, cin) == (3, 3, 1)
    w = np.asarray(w)
    packed = np.zeros((kw, BY + 2, BY, cout), w.dtype)
    for o in range(BY):
        for ky in range(kh):
            packed[:, o + ky, o, :] = w[ky, :, 0, :]
    return packed.reshape(kw * (BY + 2), BY * cout)


@partial(jax.jit, static_argnames=("BY", "by_out", "relu", "interpret"))
def stem_conv3x3_int8_packed(xp, w_packed, scale, bias, *, BY=32, by_out=4,
                             relu=True, interpret=False):
    """xp: (N, H//BY, W, BY) int8 deep-row-packed 1-channel image.
    Returns (N, H//by_out, W, by_out*cout) packed activations."""
    N, GB, W, L = xp.shape
    assert L == BY and BY % by_out == 0
    cout = w_packed.shape[1] // BY
    g2 = BY // by_out

    scale_p = jnp.tile(scale, BY)[None]
    bias_p = jnp.tile(bias, BY)[None]
    out = pl.pallas_call(
        _stem_kernel(BY, by_out, W, cout, relu),
        grid=(N, GB),
        in_specs=[
            pl.BlockSpec((1, 1, W, BY),
                         lambda n, s: (n, jnp.maximum(s - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, BY), lambda n, s: (n, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, BY),
                         lambda n, s: (n, jnp.minimum(s + 1, GB - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g2, W, by_out * cout),
                               lambda n, s: (n, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (N, GB * g2, W, by_out * cout), jnp.int8
        ),
        interpret=interpret,
    )(xp, xp, xp, w_packed, scale_p, bias_p)
    return out


# ---------------------------------------------------------------------------
# fused 1x1 head + argmax on packed input
# ---------------------------------------------------------------------------


def _head_kernel(tg, by, W, cin, nc, ncp):
    # Layout-driven design (round-2 traces). Two Mosaic pitfalls shape it:
    # (1) sub-128 lane slices of wide arrays crash the vector-layout pass,
    # (2) a lane-dim argmax leaves per-row scalars in sublanes, and moving
    # them to the lane-major output costs a catastrophic relayout (169
    # ms/batch measured). So each row-group's logits are computed
    # TRANSPOSED — dot_general contracts both operands' dim 1, the MXU's
    # native transposed-RHS mode — giving z (ncp classes in sublanes,
    # pixels in lanes); the argmax reduces over SUBLANES and its (pixels,)
    # result is already lane-major for the (by, pixels) output block.
    def kernel(body_ref, w_ref, scale_ref, bias_ref, o_ref):
        X = body_ref[0].reshape(tg * W, by * cin)
        iota = jax.lax.broadcasted_iota(jnp.int32, (ncp, tg * W), 0)
        for o in range(by):
            z = jax.lax.dot_general(
                w_ref[o], X, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * scale_ref[...] + bias_ref[...]
            m = jnp.max(z, axis=0, keepdims=True)  # (1, tgW) over sublanes
            idx = jnp.min(jnp.where(z >= m, iota, ncp), axis=0)
            o_ref[0, o] = idx.astype(jnp.int8)

    return kernel


def pack_head_weights(w, by: int, ncp: int = 128):
    """(1, 1, cin, nc) head -> (by, ncp, by*cin) int8: per-row-group
    transposed dot matrices (classes in sublanes 0..nc-1; input lanes
    outside group o zeroed)."""
    _, _, cin, nc = w.shape
    assert ncp >= nc
    w = np.asarray(w)
    packed = np.zeros((by, ncp, by * cin), w.dtype)
    for o in range(by):
        packed[o, :nc, o * cin : (o + 1) * cin] = w[0, 0].T
    return packed


@partial(jax.jit, static_argnames=("by", "nc", "tg", "interpret"))
def head_argmax_packed(p, w_packed, scale, bias, *, by, nc, tg=8,
                       interpret=False):
    """p: packed (N, G, W, by*cin); w_packed: pack_head_weights (int8);
    scale: (nc,) fp32 = s_in*s_w per class; bias: (nc,) fp32 logit bias.
    Returns (N, H, W) int8 argmax labels (via packed (N,G,W,by))."""
    N, G, W, L = p.shape
    ncp = w_packed.shape[1]
    cin = L // by
    tg = min(tg, G)
    assert G % tg == 0
    # invalid class sublanes get -inf via the bias so the argmax skips them
    pad_s = np.zeros(ncp - scale.shape[0], np.float32)
    pad_b = np.full(ncp - bias.shape[0], -3e38, np.float32)
    scale_p = jnp.concatenate([jnp.asarray(scale), pad_s])[:, None]
    bias_p = jnp.concatenate([jnp.asarray(bias), pad_b])[:, None]
    out = pl.pallas_call(
        _head_kernel(tg, by, W, cin, nc, ncp),
        grid=(N, G // tg),
        in_specs=[
            pl.BlockSpec((1, tg, W, L), lambda n, s: (n, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, by, tg * W),
                               lambda n, s: (n, 0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, by, G * W), jnp.int8),
        interpret=interpret,
    )(p, w_packed, scale_p, bias_p)
    # (N, by, G*W) -> (N, H, W): tiny (1 byte/pixel) relabeling pass
    return out.reshape(N, by, G, W).transpose(0, 2, 1, 3).reshape(
        N, G * by, W
    )
