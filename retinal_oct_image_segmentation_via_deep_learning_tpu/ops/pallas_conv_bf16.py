"""Phase-split row-packed (PSRP) bf16 TRAINING conv with custom VJP.

Why: XLA's bf16 3x3 convs at 32 output channels run at ~25.7 TFLOPs
fwd+bwd on v5e (perf/convroof_probe.py) — the GEMM N dim pads 32 -> 128
lanes — while 128-channel convs reach ~70 and dense matmuls ~200. The
serving path already solved this for int8 with banded row-packing
(``pallas_conv_psrp``): stack ``by`` output rows into the lane dim
(N = by*cout = 128) against a banded K = taps*(by+2)*cin patch matrix
(3/(by+2) band density — 2x nominal FLOPs at by=4, but on full lanes).
This module is the bf16 training twin:

* ``conv3x3_psrp_bf16(x, w, by, nph)``: differentiable packed conv on
  PSRP tensors (N, G, nph, W2, by*cin) -> (N, G, nph, W2, by*cout).
* fwd: banded matrices are built from the traced ``w`` with jnp ops
  (static scatter of (cin, cout) blocks), then one Pallas kernel runs the
  fused per-phase dots exactly like the serving kernel (fp32 accum).
* bwd dx: the SAME kernel with spatially-flipped, transposed weights
  (stride-1 SAME 3x3 conv's input grad is a 3x3 conv).
* bwd dw: a Pallas kernel accumulating dM_g = X_g^T @ dY_phi' over the
  whole grid (fp32, constant-index output refs, sequential TPU grid),
  then the band-build's adjoint folds dM back to (3, 3, cin, cout) —
  obtained for free via ``jax.vjp`` of the jnp band constructor.

Layouts match serving: 512^2 f=32 stages (by=4, nph=4), 256^2 f=64
(by=2, nph=2), deep stages by=1/nph=1 (full-lane cin, 100% band density).

Reference provenance: trains the reference U-Net
(`/root/reference/SOTAS/Lesions_Segment/YNet_2022.py:509-602`); the
kernel machinery is TPU-native with no reference counterpart.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv_psrp import _compiler_params, _phase_taps, _snap_tile


def band_mats_bf16(w, by: int, nph: int):
    """Traced (3, 3, cin, cout) -> tuple of banded (K, by*cout) matrices in
    (phi', ws-group) order — the jnp twin of ``pack_psrp_weights`` (same
    row order (tap, j, ci)), differentiable so its vjp is the wgrad band
    fold."""
    _, _, cin, cout = w.shape
    mats = []
    for groups in _phase_taps(nph):
        for _ws, taps in groups:
            m = jnp.zeros((len(taps), by + 2, cin, by, cout), w.dtype)
            for t, (dx, _phi_in) in enumerate(taps):
                for i in range(by):
                    for ky in range(3):
                        m = m.at[t, i + ky, :, i, :].set(w[ky, dx])
            mats.append(m.reshape(len(taps) * (by + 2) * cin, by * cout))
    return tuple(mats)


def _fwd_kernel(tg, by, nph, W2, cin, cout, meta):
    taps_by_phase = _phase_taps(nph)

    def kernel(*refs):
        top_ref, body_ref, bot_ref = refs[:3]
        nw = sum(len(g) for g in meta)
        w_refs = refs[3 : 3 + nw]
        o_ref = refs[-1]
        s = pl.program_id(1)
        ns = pl.num_programs(1)

        halos = []
        for phi in range(nph):
            body = body_ref[0, :, phi]  # (tg, W2, by*cin)
            top_last = jnp.where(
                s == 0, jnp.bfloat16(0),
                top_ref[0, 0, phi, :, (by - 1) * cin :],
            )
            bot_first = jnp.where(
                s == ns - 1, jnp.bfloat16(0), bot_ref[0, 0, phi, :, :cin]
            )
            prev_rows = jnp.concatenate(
                [top_last[None], body[:-1, :, (by - 1) * cin :]], axis=0
            )
            next_rows = jnp.concatenate(
                [body[1:, :, :cin], bot_first[None]], axis=0
            )
            halos.append(
                jnp.concatenate([prev_rows, body, next_rows], axis=-1)
            )

        wi = 0
        for phip in range(nph):
            acc = None
            for ws, taps in taps_by_phase[phip]:
                pieces = [halos[phi_in] for _dx, phi_in in taps]
                X = jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 \
                    else pieces[0]
                K = X.shape[-1]
                if ws:
                    X = jnp.pad(X, ((0, 0), (1, 1), (0, 0)))[
                        :, ws + 1 : ws + 1 + W2
                    ]
                part = jax.lax.dot_general(
                    X.reshape(tg * W2, K), w_refs[wi][...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                wi += 1
                acc = part if acc is None else acc + part
            o_ref[0, :, phip] = acc.astype(jnp.bfloat16).reshape(
                tg, W2, by * cout
            )

    return kernel


def _conv_fwd_pallas(x, mats, *, by, nph, tg, interpret):
    N, G, nph_, W2, L = x.shape
    assert nph_ == nph
    cin = L // by
    cout = mats[0].shape[1] // by
    tg = _snap_tile(G, tg)
    from .pallas_conv_psrp import pack_psrp_weights

    _, meta = pack_psrp_weights(np.zeros((3, 3, cin, cout), np.int8),
                                by, nph)
    in_specs = [
        pl.BlockSpec((1, 1, nph, W2, L),
                     lambda n, s: (n, jnp.maximum(s * tg - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tg, nph, W2, L), lambda n, s: (n, s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nph, W2, L),
                     lambda n, s: (n, jnp.minimum((s + 1) * tg, G - 1),
                                   0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(mats)
    return pl.pallas_call(
        _fwd_kernel(tg, by, nph, W2, cin, cout, meta),
        grid=(N, G // tg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tg, nph, W2, by * cout),
                               lambda n, s: (n, s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, G, nph, W2, by * cout),
                                       jnp.bfloat16),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(x, x, x, *mats)


def _wgrad_kernel(tg, by, nph, W2, cin, cout, meta):
    taps_by_phase = _phase_taps(nph)

    def kernel(*refs):
        top_ref, body_ref, bot_ref, dy_ref = refs[:4]
        nw = sum(len(g) for g in meta)
        o_refs = refs[4 : 4 + nw]
        n = pl.program_id(0)
        s = pl.program_id(1)
        ns = pl.num_programs(1)
        first = (n == 0) & (s == 0)

        halos = []
        for phi in range(nph):
            body = body_ref[0, :, phi]
            top_last = jnp.where(
                s == 0, jnp.bfloat16(0),
                top_ref[0, 0, phi, :, (by - 1) * cin :],
            )
            bot_first = jnp.where(
                s == ns - 1, jnp.bfloat16(0), bot_ref[0, 0, phi, :, :cin]
            )
            prev_rows = jnp.concatenate(
                [top_last[None], body[:-1, :, (by - 1) * cin :]], axis=0
            )
            next_rows = jnp.concatenate(
                [body[1:, :, :cin], bot_first[None]], axis=0
            )
            halos.append(
                jnp.concatenate([prev_rows, body, next_rows], axis=-1)
            )

        wi = 0
        for phip in range(nph):
            dY = dy_ref[0, :, phip].reshape(tg * W2, by * cout)
            dY = dY.astype(jnp.bfloat16)
            for ws, taps in taps_by_phase[phip]:
                pieces = [halos[phi_in] for _dx, phi_in in taps]
                X = jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 \
                    else pieces[0]
                K = X.shape[-1]
                if ws:
                    X = jnp.pad(X, ((0, 0), (1, 1), (0, 0)))[
                        :, ws + 1 : ws + 1 + W2
                    ]
                dM = jax.lax.dot_general(
                    X.reshape(tg * W2, K), dY,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (K, by*cout)

                @pl.when(first)
                def _init(o=o_refs[wi], v=dM):
                    o[...] = v

                @pl.when(jnp.logical_not(first))
                def _acc(o=o_refs[wi], v=dM):
                    o[...] = o[...] + v

                wi += 1

    return kernel


def _conv_wgrad_pallas(x, dy, *, by, nph, cout, tg, interpret):
    N, G, nph_, W2, L = x.shape
    cin = L // by
    tg = _snap_tile(G, tg)
    from .pallas_conv_psrp import pack_psrp_weights

    mats0, meta = pack_psrp_weights(np.zeros((3, 3, cin, cout), np.int8),
                                    by, nph)
    in_specs = [
        pl.BlockSpec((1, 1, nph, W2, L),
                     lambda n, s: (n, jnp.maximum(s * tg - 1, 0), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tg, nph, W2, L), lambda n, s: (n, s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nph, W2, L),
                     lambda n, s: (n, jnp.minimum((s + 1) * tg, G - 1),
                                   0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tg, nph, W2, by * cout),
                     lambda n, s: (n, s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec(m.shape, lambda n, s: (0, 0),
                     memory_space=pltpu.VMEM)
        for m in mats0
    ]
    out_shape = [
        jax.ShapeDtypeStruct(m.shape, jnp.float32) for m in mats0
    ]
    return pl.pallas_call(
        _wgrad_kernel(tg, by, nph, W2, cin, cout, meta),
        grid=(N, G // tg),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(x, x, x, dy)


def _flip_w(w):
    """Input-grad weights: spatial 180-rotate + in/out transpose."""
    return w[::-1, ::-1].transpose(0, 1, 3, 2)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv3x3_psrp_bf16(x, w, by: int, nph: int, tg: int = 8,
                      interpret: bool = False):
    """Differentiable 3x3 SAME stride-1 conv on a PSRP bf16 tensor.

    x: (N, G, nph, W2, by*cin) bf16; w: (3, 3, cin, cout) bf16.
    Returns (N, G, nph, W2, by*cout) bf16 (fp32 accumulation in-kernel).
    """
    return _conv_fwd_pallas(
        x, band_mats_bf16(w, by, nph), by=by, nph=nph, tg=tg,
        interpret=interpret,
    )


def _conv_fwd_rule(x, w, by, nph, tg, interpret):
    y = conv3x3_psrp_bf16(x, w, by, nph, tg, interpret)
    return y, (x, w)


def _conv_bwd_rule(by, nph, tg, interpret, res, dy):
    x, w = res
    dy = dy.astype(jnp.bfloat16)
    dx = _conv_fwd_pallas(
        dy, band_mats_bf16(_flip_w(w), by, nph), by=by, nph=nph, tg=tg,
        interpret=interpret,
    )
    cout = w.shape[-1]
    dmats = _conv_wgrad_pallas(x, dy, by=by, nph=nph, cout=cout, tg=tg,
                               interpret=interpret)
    _, band_vjp = jax.vjp(lambda w_: band_mats_bf16(w_, by, nph),
                          w.astype(jnp.float32))
    (dw,) = band_vjp(tuple(dmats))
    return dx, dw.astype(w.dtype)


conv3x3_psrp_bf16.defvjp(_conv_fwd_rule, _conv_bwd_rule)
