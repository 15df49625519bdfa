"""General-KH PSRP int8 conv kernels (ReLayNet's 7x3 family) — round 4.

Generalizes the 3x3 PSRP serving kernels (``pallas_conv_psrp``) to odd
kernel heights KH > 3 with KW = 3, plus the two epilogues ReLayNet needs:

* PReLU (single shared slope, the torch default — reference
  ``ReLayNet_2017.py:151-159`` BasicBlock) applied in fp32 before the
  requant (monotone for alpha > 0, so int8 pooling argmax is preserved).
* 2x2/2 index max-pool fused into the producing conv (by=2, nph=2 only):
  emits the pooled tensor AND the per-window argmax (torch
  ``return_indices`` flat order dy*2+dx, first-max-wins) — the indices
  the MaxUnpool decoder (``:182-187``) replays.

Why this kernel family fits ReLayNet's geometry unusually well: at
by=2/cin=64 the per-tap band is K = (by + KH - 1) * cin = 512 — MXU
K-granule exact (perf/kgran.py) — and the 7-tap H-band has 7/8 = 87.5%
density (vs 50% for 3x3 at by=4), so the banded GEMMs waste only 1.14x
FLOPs. The W-phase algebra (taps grouped by w2-shift, lane-concat of
same-offset pieces, ONE pad+shift per group) is identical to the 3x3
kernels because KW = 3.

All kernels int8 in/out, per-channel fused requant, stride-1 'same' zero
padding, tested bit-exactly against ``lax.conv`` in interpret mode.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv_psrp import _compiler_params, _phase_taps, _snap_tile


def pack_psrp7_weights(w, by: int, nph: int, cins=None):
    """(KH, 3, cin_tot, cout) -> per (out-phase, ws-group) banded matrices.

    Rows (tap, j, ci_tot) for j in 0..by+KH-2 — lane j holds input row
    by*g + j - KH//2. Band: m[t, i+ky, :, i, :] = w[ky, dx_t].
    """
    kh, kw, cin_tot, cout = w.shape
    assert kw == 3 and kh % 2 == 1
    assert cins is None or sum(cins) == cin_tot
    w = np.asarray(w)
    jr = by + kh - 1
    mats, meta = [], []
    for groups in _phase_taps(nph):
        gm = []
        for ws, taps in groups:
            m = np.zeros((len(taps), jr, cin_tot, by, cout), w.dtype)
            for t, (dx, _phi_in) in enumerate(taps):
                for i in range(by):
                    for ky in range(kh):
                        m[t, i + ky, :, i, :] = w[ky, dx]
            mats.append(m.reshape(len(taps) * jr * cin_tot, by * cout))
            gm.append((ws, len(taps)))
        meta.append(gm)
    return mats, meta


def _psrp7_kernel(tg, by, nph, W2, kh, cins, cout, meta, pool):
    taps_by_phase = _phase_taps(nph)
    n_in = len(cins)
    hh = kh // 2
    ngh = -(-hh // by)  # shifted body groups needed each side

    def kernel(*refs):
        nrefs_per_in = 1 + 2 * ngh
        nw = sum(len(g) for g in meta)
        w_refs = refs[n_in * nrefs_per_in : n_in * nrefs_per_in + nw]
        scale_ref, bias_ref, alpha_ref = refs[
            n_in * nrefs_per_in + nw : n_in * nrefs_per_in + nw + 3
        ]
        o_ref = refs[-3] if pool else refs[-1]
        s = pl.program_id(1)
        ns = pl.num_programs(1)

        # per input, per phase: the (by + 2*hh)-row halo matrix, built from
        # ngh up/down shifted bodies (tile-boundary groups come from the
        # clamped side blocks, zero-masked at the image edge; tg >= ngh so
        # only s==0 / s==ns-1 ever reference out-of-image groups)
        halos = []
        for k, cin in enumerate(cins):
            base = k * nrefs_per_in
            body_ref = refs[base]
            top_refs = refs[base + 1 : base + 1 + ngh]          # -1..-ngh
            bot_refs = refs[base + 1 + ngh : base + 1 + 2 * ngh]  # +1..+ngh
            per_phase = []
            for phi in range(nph):
                body = body_ref[0, :, phi]  # (tg, W2, by*cin)
                tops = [
                    jnp.where(s == 0, jnp.int8(0), t[0, 0, phi])
                    for t in top_refs
                ]  # group s*tg - (j+1)
                bots = [
                    jnp.where(s == ns - 1, jnp.int8(0), b[0, 0, phi])
                    for b in bot_refs
                ]  # group (s+1)*tg + j
                ups = {}    # ups[k2] = body shifted down by k2 groups
                downs = {}
                for k2 in range(1, ngh + 1):
                    ups[k2] = jnp.concatenate(
                        [t[None] for t in tops[:k2][::-1]]
                        + ([body[:-k2]] if tg > k2 else []),
                        axis=0,
                    )
                    downs[k2] = jnp.concatenate(
                        ([body[k2:]] if tg > k2 else [])
                        + [b[None] for b in bots[:k2]],
                        axis=0,
                    )
                pieces = []
                for j in range(hh, 0, -1):  # rows -hh..-1
                    k2 = -(-j // by)
                    p = (-j) % by
                    pieces.append(ups[k2][:, :, p * cin : (p + 1) * cin])
                pieces.append(body)
                for j in range(hh):  # rows by..by+hh-1
                    k2 = 1 + j // by
                    p = j % by
                    pieces.append(downs[k2][:, :, p * cin : (p + 1) * cin])
                per_phase.append(jnp.concatenate(pieces, axis=-1))
            halos.append(per_phase)

        wi = 0
        outs = []
        for phip in range(nph):
            acc = None
            for ws, taps in taps_by_phase[phip]:
                if n_in == 1:
                    pieces = [halos[0][phi_in] for _dx, phi_in in taps]
                else:
                    # (tap, j, ci_tot) row order: slice each input's halo
                    # per j-row and interleave inputs
                    jr = by + 2 * hh
                    pieces = [
                        halos[k][phi_in][:, :, j * cin : (j + 1) * cin]
                        for _dx, phi_in in taps
                        for j in range(jr)
                        for k, cin in enumerate(cins)
                    ]
                X = jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 \
                    else pieces[0]
                if ws:
                    X = jnp.pad(X, ((0, 0), (1, 1), (0, 0)))[
                        :, ws + 1 : ws + 1 + W2
                    ]
                part = jax.lax.dot_general(
                    X.reshape(tg * W2, X.shape[-1]), w_refs[wi][...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                wi += 1
                acc = part if acc is None else acc + part
            yf = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
            yf = jnp.where(yf >= 0.0, yf, alpha_ref[0, 0] * yf)  # PReLU
            yq = jnp.clip(jnp.round(yf), -127.0, 127.0)
            o_ref[0, :, phip] = yq.astype(jnp.int8).reshape(
                tg, W2, by * cout
            )
            outs.append(yq.reshape(tg, W2, by * cout))

        if pool:
            # fused 2x2/2 index max-pool (by=2, nph=2 -> plain half-res):
            # window values v[dy][dx] = plane dx, lane-row dy; argmax in
            # torch flat order dy*2+dx, first-max-wins. Decided on the
            # requantized values (kept fp32 in-register — Mosaic dislikes
            # int8 compares) so pooling is bit-identical to the all-XLA
            # int8 path's ``max_pool_argmax`` on int8 tensors.
            p_ref, i_ref = refs[-2], refs[-1]
            v = [[outs[dx][:, :, dy * cout : (dy + 1) * cout]
                  for dx in range(2)] for dy in range(2)]
            best = v[0][0]
            # idx tracked in fp32: the compare masks have the fp32 (8,128)
            # native layout, and Mosaic cannot relayout an i1 vector to the
            # int8 (32,128) tiling an int8 select would need
            idx = jnp.zeros_like(best)
            for flat, (dy, dx) in enumerate(
                ((0, 1), (1, 0), (1, 1)), start=1
            ):
                take = v[dy][dx] > best
                best = jnp.where(take, v[dy][dx], best)
                idx = jnp.where(take, jnp.float32(flat), idx)
            p_ref[0] = best.astype(jnp.int8)
            i_ref[0] = idx.astype(jnp.int8)

    return kernel


@partial(jax.jit, static_argnames=("by", "nph", "cins", "kh", "tg", "pool",
                                   "interpret"))
def conv7x3_psrp(inputs, w_mats, scale, bias, alpha, *, by, nph, cins,
                 kh=7, tg=8, pool=False, interpret=False):
    """PSRP int8 KHx3 conv + PReLU (+ optional fused index max-pool).

    inputs: tuple of PSRP tensors (N, G, nph, W2, by*cin_k); w_mats from
    ``pack_psrp7_weights`` (cat-channel order = cins, skip requants
    pre-folded by the caller). alpha: scalar PReLU slope. Returns packed
    (N, G, nph, W2, by*cout); with pool=True (by=2, nph=2 only) also
    (pooled, idx) in the plain half-res layout (N, G, W2, cout) int8 —
    group g is output row g, W2 the output width.
    """
    if not isinstance(inputs, (tuple, list)):
        inputs = (inputs,)
    N, G, nph_, W2, L0 = inputs[0].shape
    assert nph_ == nph and L0 == by * cins[0]
    cout = w_mats[0].shape[1] // by
    hh = kh // 2
    ngh = -(-hh // by)
    tg = _snap_tile(G, tg)
    assert tg >= ngh, (tg, ngh)
    if pool:
        assert by == 2 and nph == 2
    _, meta = pack_psrp7_weights(
        np.zeros((kh, 3, sum(cins), cout), np.int8), by, nph
    )

    scale_p = jnp.tile(scale, by)[None]
    bias_p = jnp.tile(bias, by)[None]
    alpha_p = jnp.asarray(alpha, jnp.float32).reshape(1, 1)

    in_specs, operands = [], []
    for k, cin in enumerate(cins):
        Lk = by * cin
        in_specs.append(
            pl.BlockSpec((1, tg, nph, W2, Lk), lambda n, s: (n, s, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(inputs[k])
        for j in range(1, ngh + 1):
            in_specs.append(
                pl.BlockSpec((1, 1, nph, W2, Lk),
                             lambda n, s, j=j: (n, jnp.maximum(s * tg - j, 0),
                                                0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            operands.append(inputs[k])
        for j in range(1, ngh + 1):
            in_specs.append(
                pl.BlockSpec((1, 1, nph, W2, Lk),
                             lambda n, s, j=j: (
                                 n, jnp.minimum((s + 1) * tg + j - 1, G - 1),
                                 0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            operands.append(inputs[k])
    nw = len(w_mats)
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (nw + 2)
    in_specs += [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)]

    out_specs = [
        pl.BlockSpec((1, tg, nph, W2, by * cout),
                     lambda n, s: (n, s, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((N, G, nph, W2, by * cout), jnp.int8)]
    if pool:
        for _ in range(2):
            out_specs.append(
                pl.BlockSpec((1, tg, W2, cout), lambda n, s: (n, s, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(
                jax.ShapeDtypeStruct((N, G, W2, cout), jnp.int8)
            )

    out = pl.pallas_call(
        _psrp7_kernel(tg, by, nph, W2, kh, tuple(cins), cout, meta, pool),
        grid=(N, G // tg),
        in_specs=in_specs,
        out_specs=out_specs if pool else out_specs[0],
        out_shape=out_shape if pool else out_shape[0],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*operands, *w_mats, scale_p, bias_p, alpha_p)
    return out


def _stem7_kernel(BY, by_out, nph, W2, kh, cout, meta, pool):
    taps_by_phase = _phase_taps(nph)
    hh = kh // 2
    g2 = BY // by_out

    def kernel(*refs):
        top_ref, body_ref, bot_ref = refs[:3]
        nw = sum(len(g) for g in meta)
        w_refs = refs[3 : 3 + nw]
        scale_ref, bias_ref, alpha_ref = refs[3 + nw : 6 + nw]
        o_ref = refs[6 + nw]
        s = pl.program_id(1)
        ns = pl.num_programs(1)

        padded = []
        for phi in range(nph):
            body = body_ref[0, 0, phi]  # (W2, BY)
            top = jnp.where(s == 0, jnp.int8(0),
                            top_ref[0, 0, phi, :, BY - hh :])
            bot = jnp.where(s == ns - 1, jnp.int8(0),
                            bot_ref[0, 0, phi, :, :hh])
            X = jnp.concatenate([top, body, bot], axis=-1)  # (W2, BY+2hh)
            padded.append(jnp.pad(X, ((1, 1), (0, 0))))

        wi = 0
        outs = []
        for phip in range(nph):
            acc = None
            for ws, taps in taps_by_phase[phip]:
                pieces = [
                    padded[phi_in][ws + 1 : ws + 1 + W2]
                    for _dx, phi_in in taps
                ]
                X = jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 \
                    else pieces[0]
                part = jax.lax.dot_general(
                    X, w_refs[wi][...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                wi += 1
                acc = part if acc is None else acc + part
            yf = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
            yf = jnp.where(yf >= 0.0, yf, alpha_ref[0, 0] * yf)
            yq = jnp.clip(jnp.round(yf), -127.0, 127.0)
            y8 = yq.astype(jnp.int8)
            for u in range(g2):
                o_ref[0, u, phip] = y8[
                    :, u * by_out * cout : (u + 1) * by_out * cout
                ]
            outs.append(yq)

        if pool:
            # fused 2x2/2 index max-pool (by_out=2, nph=2): one pooled row
            # per output group; decided on requantized values (see
            # _psrp7_kernel) for bit-equality with the int8 XLA pooling
            p_ref, i_ref = refs[7 + nw], refs[8 + nw]
            for u in range(g2):
                v = [[outs[dx][:, (u * 2 + dy) * cout : (u * 2 + dy + 1)
                              * cout]
                      for dx in range(2)] for dy in range(2)]
                best = v[0][0]
                idx = jnp.zeros_like(best)  # fp32 (see _psrp7_kernel note)
                for flat, (dy, dx) in enumerate(
                    ((0, 1), (1, 0), (1, 1)), start=1
                ):
                    take = v[dy][dx] > best
                    best = jnp.where(take, v[dy][dx], best)
                    idx = jnp.where(take, jnp.float32(flat), idx)
                p_ref[0, u] = best.astype(jnp.int8)
                i_ref[0, u] = idx.astype(jnp.int8)

    return kernel


@partial(jax.jit, static_argnames=("BY", "by_out", "nph", "kh", "pool",
                                   "interpret"))
def stem7_psrp(xp, w_mats, scale, bias, alpha, *, BY=32, by_out=2, nph=2,
               kh=7, pool=False, interpret=False):
    """ReLayNet stem: KHx3 conv on a 1-channel image + PReLU (+ fused
    index max-pool). xp: (N, H//BY, nph, W2, BY) int8 deep-row-packed
    image (``pallas_conv_psrp.prep_stem_input``). Returns PSRP
    (N, H//by_out, nph, W2, by_out*cout); with pool=True also
    (pooled, idx) in the plain half-res layout (N, H//2, W2, cout)."""
    N, GB, nph_, W2, L = xp.shape
    assert nph_ == nph and L == BY and BY % by_out == 0
    hh = kh // 2
    cout = w_mats[0].shape[1] // BY
    g2 = BY // by_out
    _, meta = pack_psrp7_weights(np.zeros((kh, 3, 1, 1), np.int8), BY, nph)
    if pool:
        assert by_out == 2 and nph == 2
    scale_p = jnp.tile(scale, BY)[None]
    bias_p = jnp.tile(bias, BY)[None]
    alpha_p = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    in_specs = [
        pl.BlockSpec((1, 1, nph, W2, BY),
                     lambda n, s: (n, jnp.maximum(s - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nph, W2, BY), lambda n, s: (n, s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nph, W2, BY),
                     lambda n, s: (n, jnp.minimum(s + 1, GB - 1), 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(w_mats) + 2) + [
        pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
    ]
    out_specs = [
        pl.BlockSpec((1, g2, nph, W2, by_out * cout),
                     lambda n, s: (n, s, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, GB * g2, nph, W2, by_out * cout), jnp.int8)
    ]
    if pool:
        for _ in range(2):
            out_specs.append(
                pl.BlockSpec((1, g2, W2, cout), lambda n, s: (n, s, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(
                jax.ShapeDtypeStruct((N, GB * g2, W2, cout), jnp.int8)
            )
    out = pl.pallas_call(
        _stem7_kernel(BY, by_out, nph, W2, kh, cout, meta, pool),
        grid=(N, GB),
        in_specs=in_specs,
        out_specs=out_specs if pool else out_specs[0],
        out_shape=out_shape if pool else out_shape[0],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(xp, xp, xp, *w_mats, scale_p, bias_p, alpha_p)
    return out


def unpool_psrp(vals, idx):
    """MaxUnpool 2x2/2 into PSRP(2, 2): (N, Gh, W2h, c) int8 values +
    same-shape window argmax (flat dy*2+dx) -> (N, Gh, 2, W2h, 2*c) int8.

    Pure elementwise data movement (XLA): out plane dx, lane-row dy gets
    the value where idx == dy*2+dx, else 0 — exactly
    ``ops.pooling.max_unpool`` landing directly in the consuming conv's
    packed layout (no NHWC round-trip).
    """
    planes = []
    for dx in range(2):
        rows = [
            jnp.where(idx == dy * 2 + dx, vals, jnp.int8(0))
            for dy in range(2)
        ]
        planes.append(jnp.concatenate(rows, axis=-1))  # (N, Gh, W2h, 2c)
    return jnp.stack(planes, axis=2)


def pool_argmax_psrp(xp, cout):
    """2x2/2 index max-pool of a PSRP(2, 2) int8 tensor in XLA (the
    unfused twin of the kernel epilogue; used where the producer isn't a
    conv). Returns (pooled, idx) in the plain half-res layout."""
    v = [[xp[:, :, dx, :, dy * cout : (dy + 1) * cout] for dx in range(2)]
         for dy in range(2)]
    best = v[0][0]
    idx = jnp.zeros_like(best, dtype=jnp.int8)
    for flat, (dy, dx) in enumerate(((0, 1), (1, 0), (1, 1)), start=1):
        take = v[dy][dx] > best
        best = jnp.where(take, v[dy][dx], best)
        idx = jnp.where(take, jnp.int8(flat), idx)
    return best, idx
