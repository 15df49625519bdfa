"""Pallas int8 3x3 convolution for TPU — the quantized serving hot path.

Why: XLA's ``lax.conv`` int8 path runs at bf16 rate on this stack (measured
59.0 vs 56.5 ms for the same conv), but a Pallas ``dot_general`` with int8
operands reaches ~337 TFLOPs on v5e vs ~168 bf16 — the full 2x int8 MXU
advantage. This kernel brings that rate to the quantized U-Net's 3x3 convs.

v2 design (round 2):

* **Output-row blocking (``by``)** — the round-1 kernel mapped GEMM lanes to
  ``cout``, so the 32/64-channel full-resolution stages used 32/64 of the
  MXU's 128 lanes (hard ceiling 98/197 int8 TFLOPs). Here ``by`` output rows
  are computed per GEMM row-block, packing ``(by, cout)`` into the lane
  dimension: N = by*cout = 128 at every stage. The weight matrix is
  block-banded — tap row ``dy'`` contributes to output sub-row ``o`` iff
  ``0 <= dy' - o <= 2`` — so the density is ``9 / (3*(by+2))`` (by=4: 50%,
  by=2: 75%, by=1: 100%), trading zero-FLOPs for full lanes: ceiling
  197T at 32ch (vs 98T), 295T at 64ch.
* **1x-read halo rows** — instead of three full row-shifted copies of the
  input (3x HBM traffic), the kernel takes the body strip plus two
  single-row halo arrays (previous strip's last row / next strip's first
  row, zeros at image borders = 'same' zero padding). Extra HBM read is
  2/th of the input instead of 2x.
* **Small strips (``th``)** so Pallas's automatic pipelining double-buffers
  input/output DMA against the MXU (the round-1 512-wide th=64 blocks
  overflowed VMEM and serialized).

Inside the kernel the ``(by+2)*3`` shifted taps are assembled from the
(th+2, W+2, C) tile: row-strided views via a reshape trick (slice th rows,
reshape (th/by, by, ...), take [:, 0]), lane shifts for dx. For cin < 128
the taps are concatenated into one (th/by*W, 3*(by+2)*cin) patch matrix so
the contraction depth fills the MXU; for cin >= 128 per-tap dots accumulate
in int32 vregs (measured faster than the concat at >=128ch). The
requantization epilogue (per-channel scale, +bias, optional ReLU, clamp,
int8 cast) is fused in-kernel so activations leave as int8.

Constraints: stride 1, 'same' zero padding, H % th == 0, th % by == 0.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _snap_tile(n: int, t: int) -> int:
    """Largest divisor of n that is <= t (tile sizes must divide the grid
    extent; deep stages of odd geometries, e.g. H=6 at a 96-row input,
    otherwise reject the swept defaults)."""
    t = max(1, min(t, n))
    while n % t:
        t -= 1
    return t



def pack_weights(w, by: int = 1):
    """(3, 3, Cin, Cout) -> (3*(by+2)*Cin, by*Cout) block-banded matrix.

    Row index is (dx, dy', ci) — dx-major so each of the kernel's three
    dx-grouped dots reads a contiguous row block; column index is (o, co)
    with o the output sub-row within a by-block.
    W[(dx,dy',ci), (o,co)] = w[dy'-o,dx,ci,co] when 0 <= dy'-o <= 2, else 0.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    w = np.asarray(w)
    packed = np.zeros((kw, (by + 2), cin, by, cout), w.dtype)
    for o in range(by):
        for ky in range(kh):
            packed[:, o + ky, :, o, :] = w[ky]
    return packed.reshape(kw * (by + 2) * cin, by * cout)


def _make_kernel(th, by, W, cins, cout, relu, out_int8, force_per_tap=False,
                 dot_int4=False, out_clip=127.0, pad_vals=None):
    nb = th // by
    cin = sum(cins)
    n_in = len(cins)
    dot_t = jnp.int4 if dot_int4 else jnp.int8
    # Zero-point inputs (w4a4 zp7 mode): a stored value v represents the
    # true quantized level v + 7, so 'same' zero padding must insert the
    # STORED encoding of true-zero — pad_vals[k] = -7 for zp7 inputs.
    # The +7*sum(w) constant this induces at interior pixels is folded
    # into the conv bias by the quantizer (uniform because the border is
    # padded with the same encoding).
    pad_vals = pad_vals or (0,) * n_in
    uniform_pv = len(set(pad_vals)) == 1 and pad_vals[0] == 0

    def kernel(*refs):
        w_ref, scale_ref, bias_ref = refs[3 * n_in : 3 * n_in + 3]
        o_ref = refs[3 * n_in + 3]
        # w4a4 mode: operands live in HBM/VMEM as int8 (int4 arrays cannot
        # cross the jit boundary on this backend — perf/kgran.py) with
        # values pre-clipped to [-7, 7] by the producers' requant; the cast
        # to int4 happens here, post patch-assembly, and the dot runs at
        # the MXU's 2x int4 rate (726 vs 371 TOPs measured at K=512).
        wk = w_ref[...].astype(dot_t) if dot_int4 else w_ref
        # Halo rows are single-row blocks of x itself (index-mapped to the
        # neighbouring strip's edge row, clamped at the image border); the
        # border rows are zero-masked here so the result is 'same' zero
        # padding. Round-2 e2e traces: materializing separate top/bot halo
        # arrays in XLA cost 1-2 ms per conv (unhoistable gather+pad
        # fusions); block-indexed reads cost nothing. A second input folds
        # ``concat([a, b], channel)`` into the GEMM (lane-concat, offset 0)
        # — the skip-concat copies measured in the round-3 trace die here.
        s = pl.program_id(1)
        ns = pl.num_programs(1)
        tiles = []
        for k in range(n_in):
            top_ref, body_ref, bot_ref = refs[3 * k : 3 * k + 3]
            pv = jnp.int8(pad_vals[k])
            top = jnp.where(s == 0, pv, top_ref[0, 0])
            bot = jnp.where(s == ns - 1, pv, bot_ref[0, 0])
            t = jnp.concatenate(
                [top[None], body_ref[0], bot[None]], axis=0
            )  # (th+2, W, C_k)
            if not uniform_pv:
                # per-input W-border pad (each input's own stored
                # true-zero encoding) BEFORE the channel concat
                side = jnp.full((t.shape[0], 1, t.shape[2]), pv, jnp.int8)
                t = jnp.concatenate([side, t, side], axis=1)
            tiles.append(t)
        tile = (jnp.concatenate(tiles, axis=-1) if n_in > 1 else tiles[0])
        # (by-1) trailing dummy rows let every tap slice th rows for the
        # strided reshape below; the [:, 0] stride never selects them.
        wpad = (0, 0) if not uniform_pv else (1, 1)
        padded = jnp.pad(tile, ((0, by - 1), wpad, (0, 0)))  # (th+1+by,W+2,C)

        def tap(dyp, dx):
            rows = padded[dyp : dyp + th]
            if by > 1:
                rows = rows.reshape(nb, by, W + 2, cin)[:, 0]
            return rows[:, dx : dx + W, :]  # (nb, W, cin)

        kdx = (by + 2) * cin  # packed-weight rows per dx group
        if cin < 128 and not force_per_tap:
            # Three dx-grouped dots, K = (by+2)*cin each: the dy' slices at a
            # fixed dx share identical vector layouts (dy' selection is a
            # major-dim pick), so their lane-concat is legal and free of the
            # relayout cost that made a full 9/18-tap im2col scratch 10-20x
            # slower than the MXU work it fed (measured round 2).
            acc = None
            for dx in range(3):
                p = jnp.concatenate(
                    [tap(dyp, dx) for dyp in range(by + 2)], axis=-1
                ).reshape(nb * W, kdx)
                if dot_int4:
                    p = p.astype(dot_t)
                part = jax.lax.dot_general(
                    p, wk[dx * kdx : (dx + 1) * kdx, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = part if acc is None else acc + part
        else:
            # Per-tap dots accumulated in int32 vregs (K=cin already fills
            # the MXU; measured 332 TFLOPs at 128ch).
            acc = None
            for dx in range(3):
                for dyp in range(by + 2):
                    a = tap(dyp, dx).reshape(nb * W, cin)
                    if dot_int4:
                        a = a.astype(dot_t)
                    t = dx * (by + 2) + dyp
                    part = jax.lax.dot_general(
                        a, wk[t * cin : (t + 1) * cin, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = part if acc is None else acc + part

        y = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
        if relu:
            y = jnp.maximum(y, 0.0)
        if out_int8:
            y = jnp.clip(jnp.round(y), -out_clip, out_clip).astype(jnp.int8)
        if by == 1:
            # Natural (th, W, cout) rows — store straight into the 4-D output
            # block. (Round-2 profiling: the 5-D out_shape forced XLA to
            # insert a ~0.8 ms/call layout copy after every kernel.)
            o_ref[0] = y.reshape(th, W, cout)
        else:
            # Unpack the (o, co) lane packing into the output's explicit
            # sub-row dim via per-o lane slices (a lanes->sublanes
            # reshape/transpose is unsupported by Mosaic; the block's
            # (g, o, x) row order reshapes to image rows for free outside).
            y = y.reshape(nb, W, by * cout)
            for o in range(by):
                o_ref[0, :, o] = y[:, :, o * cout : (o + 1) * cout]

    return kernel


@partial(jax.jit, static_argnames=("by", "relu", "out_int8", "th",
                                   "interpret", "force_per_tap", "dot_int4",
                                   "out_clip", "pad_vals"))
def conv3x3_int8(x, w_packed, scale, bias, *, by=1, relu=True, out_int8=True,
                 th=16, interpret=False, force_per_tap=False, dot_int4=False,
                 out_clip=127.0, pad_vals=None):
    """x: (N, H, W, Cin) int8 — or a tuple of such tensors, whose channel
    concat is folded into the GEMM (weights packed for the cat channels);
    w_packed: pack_weights(w, by) int8; scale: (Cout,) fp32
    (= s_in*s_w/s_out); bias: (Cout,) fp32 (already in output-scale units).
    Returns (N, H, W, Cout) int8 (fp32 with out_int8=False).

    ``dot_int4``: run the MXU dots at the 2x int4 rate. Inputs and weights
    stay int8 ARRAYS but their VALUES must be in [-7, 7] (producers use
    ``out_clip=7``, weights quantized with absmax/7); the in-kernel cast is
    then exact, so interpret mode (which keeps int8 dots) is bit-identical.
    ``out_clip``: requant clamp bound (7.0 when the consumer is an int4
    dot)."""
    if not isinstance(x, (tuple, list)):
        x = (x,)
    N, H, W, _ = x[0].shape
    cins = tuple(t.shape[-1] for t in x)
    cin = sum(cins)
    assert th % by == 0 and H % th == 0, (H, th, by)
    cout = w_packed.shape[1] // by
    assert w_packed.shape[0] == (by + 2) * 3 * cin, (w_packed.shape, by, cin)
    S = H // th

    # scale/bias tiled to the (o, co) lane order of the packed output.
    scale_p = jnp.tile(scale, by)[None]  # (1, by*cout)
    bias_p = jnp.tile(bias, by)[None]

    out_dtype = jnp.int8 if out_int8 else jnp.float32
    kern = _make_kernel(th, by, W, cins, cout, relu, out_int8, force_per_tap,
                        dot_int4=dot_int4 and not interpret,
                        out_clip=out_clip, pad_vals=pad_vals)
    # Single-row halo blocks read straight out of x: block size 1 on the row
    # dim makes the block index a row index, so the index map can address the
    # neighbouring strip's edge row (clamped at borders; kernel zero-masks).
    in_specs = []
    operands = []
    for t, ck in zip(x, cins):
        in_specs += [
            pl.BlockSpec(
                (1, 1, W, ck),
                lambda n, s: (n, jnp.maximum(s * th - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, W, ck), lambda n, s: (n, s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, W, ck),
                lambda n, s: (n, jnp.minimum((s + 1) * th, H - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands += [t] * 3
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    if by == 1:
        out_specs = pl.BlockSpec(
            (1, th, W, cout), lambda n, s: (n, s, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((N, H, W, cout), out_dtype)
    else:
        out_specs = pl.BlockSpec(
            (1, th // by, by, W, cout), lambda n, s: (n, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((N, H // by, by, W, cout), out_dtype)
    out = pl.pallas_call(
        kern,
        grid=(N, S),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands, w_packed, scale_p, bias_p)
    return out.reshape(N, H, W, cout)


def pack_ct2x2_weights(w):
    """(2, 2, cin, cout) -> 2 per-dy (cin, 2*cout) mats, lanes (dx, co).

    The 2x2 stride-2 transpose conv is non-overlapping: every output pixel
    (2i+dy, 2j+dx) is exactly ``x[i, j] @ w[dy, dx]`` (the lhs-dilated XLA
    form reduces to this — flip and dilation cancel), so it lowers to two
    full-width MXU dots with zero wasted FLOPs, dx packed into lanes.
    """
    kh, kw, _, _ = w.shape
    assert (kh, kw) == (2, 2)
    w = np.asarray(w)
    return [
        np.ascontiguousarray(np.concatenate([w[dy, 0], w[dy, 1]], axis=-1))
        for dy in range(2)
    ]


def _ct2x2_kernel(tr, W, cout, dot_int4=False, out_clip=127.0):
    def kernel(x_ref, w0, w1, scale_ref, bias_ref, o_ref):
        X = x_ref[0].reshape(tr * W, x_ref.shape[-1])
        if dot_int4:
            X = X.astype(jnp.int4)
        for dy, w_ref in ((0, w0), (1, w1)):
            wm = w_ref[...]
            if dot_int4:
                wm = wm.astype(jnp.int4)
            acc = jax.lax.dot_general(
                X, wm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[dy]
            y8 = jnp.clip(jnp.round(y), -out_clip, out_clip).astype(jnp.int8)
            o_ref[0, :, dy] = y8.reshape(tr, W, 2 * cout)

    return kernel


@partial(jax.jit, static_argnames=("tr", "interpret", "dot_int4",
                                   "out_clip"))
def ct2x2_int8(xq, w_mats, scale, bias, *, tr=16, interpret=False,
               dot_int4=False, out_clip=127.0):
    """2x2 stride-2 int8 transpose conv + fused requant (no relu):
    (N, H, W, cin) int8 -> (N, 2H, 2W, cout) int8.

    Replaces the deep decoder's XLA lhs-dilated s32 conv + requant fusion +
    two full-tensor relayout copies (~3.5 ms each at 512^2 b128, round-3
    trace). The kernel emits (N, H, 2, W, 2*cout) with dy as a middle dim
    and dx packed into lanes — in-kernel W interleaves (stack+reshape or
    repeat+select) measured 1.8-3x slower than letting XLA's reshape do the
    final (dx,co)->2W unpack (perf/ctbench.py). scale = s_in*s_w/s_out,
    bias = b/s_out (as in inference/quantized._qconv with s_out).
    """
    N, H, W, cin = xq.shape
    cout = w_mats[0].shape[1] // 2
    tr = _snap_tile(H, tr)
    scale_p = jnp.tile(scale, 2)[None]
    # bias: (cout,) shared, or (2, 2*cout) per-(dy, dx) — the zp7 input
    # mode needs per-tap bias corrections (each output pixel is exactly
    # one (dy, dx) tap of its single source pixel).
    bias = jnp.asarray(bias)
    bias_p = (jnp.tile(bias, 2)[None].repeat(2, 0) if bias.ndim == 1
              else bias)
    assert bias_p.shape == (2, 2 * cout), bias_p.shape
    y = pl.pallas_call(
        _ct2x2_kernel(tr, W, cout, dot_int4=dot_int4 and not interpret,
                      out_clip=out_clip),
        grid=(N, H // tr),
        in_specs=[
            pl.BlockSpec((1, tr, W, cin), lambda n, s: (n, s, 0, 0),
                         memory_space=pltpu.VMEM)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, tr, 2, W, 2 * cout),
                               lambda n, s: (n, s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, 2, W, 2 * cout), jnp.int8),
        interpret=interpret,
    )(xq, *w_mats, scale_p, bias_p)
    return y.reshape(N, 2 * H, W, 2, cout).reshape(N, 2 * H, 2 * W, cout)


def _pool2x2_kernel(th, W):
    def kernel(x_ref, o_ref):
        v = x_ref[0].astype(jnp.float32)  # (2*th, W, C) — int8 max illegal
        v = jnp.max(v.reshape(th, 2, W, v.shape[-1]), axis=1)
        # sublane pair-split reshape: legal on Mosaic as of jax 0.9
        # (probe-verified exact; the round-2 rule against it is outdated)
        v = jnp.max(v.reshape(th, W // 2, 2, v.shape[-1]), axis=2)
        o_ref[0] = v.astype(jnp.int8)

    return kernel


@partial(jax.jit, static_argnames=("th", "interpret"))
def pool2x2_int8(xq, *, th=8, interpret=False):
    """2x2 stride-2 max-pool on int8 NHWC, Pallas.

    XLA's s8 reduce-max picks batch-minor layouts, sandwiching every deep
    pool between two full-tensor relayout copies (~1 ms each at 128^2
    x128ch b128, round-3 trace); this kernel keeps the default layout.
    """
    N, H, W, C = xq.shape
    th = min(th, H // 2)
    assert (H // 2) % th == 0 and W % 2 == 0
    return pl.pallas_call(
        _pool2x2_kernel(th, W),
        grid=(N, H // 2 // th),
        in_specs=[
            pl.BlockSpec((1, 2 * th, W, C), lambda n, s: (n, s, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, th, W // 2, C), lambda n, s: (n, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H // 2, W // 2, C), jnp.int8),
        interpret=interpret,
    )(xq)


def conv3x3_int8_reference(x, w_packed, scale, bias, by=1, relu=True,
                           out_int8=True, out_clip=127.0, pad_vals=None):
    """lax.conv equivalent for correctness checks. int8 dots: exact for the
    w4a4 mode too, whose +-7-valued operands never overflow int8 math.
    ``pad_vals``: per-input-tuple border value (zp7 stored true-zero)."""
    if isinstance(x, (tuple, list)):
        if pad_vals is None:
            pad_vals = (0,) * len(x)
        x = jnp.concatenate(
            [jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=np.int8(pv))
             for t, pv in zip(x, pad_vals)], axis=-1)
        pad = [(0, 0), (0, 0)]
    elif pad_vals is not None and any(pad_vals):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=np.int8(pad_vals[0]))
        pad = [(0, 0), (0, 0)]
    else:
        pad = [(1, 1), (1, 1)]
    cin = x.shape[-1]
    cout = w_packed.shape[-1] // by
    # Recover the dense (3,3,cin,cout) kernel from the banded pack: output
    # sub-row o=0 columns hold w[dy', dx] for dy' in 0..2.
    wp = jnp.asarray(w_packed).reshape(3, by + 2, cin, by, cout)
    w = wp[:, :3, :, 0, :].transpose(1, 0, 2, 3)
    acc = jax.lax.conv_general_dilated(
        x, w, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_int8:
        y = jnp.clip(jnp.round(y), -out_clip, out_clip).astype(jnp.int8)
    return y
