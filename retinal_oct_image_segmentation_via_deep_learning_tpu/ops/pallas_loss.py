"""Fused Pallas dice_ce loss: one pass forward, one pass backward.

On-chip A/B verdict (perf/lossbench.py, 512^2 b16 c10): standalone the
kernel WINS — fwd+bwd 0.74 ms (NCHW input) / 1.05 (incl. NHWC
transpose) vs 1.24 ms for the XLA ``training.losses.dice_ce_loss`` —
but wired into the packed train step it LOSES end-to-end (137.1 vs
122.5 ms, perf/packed_bisect.py ``fusedloss``): the class-major head
einsum XLA must emit for the NCHW layout costs ~9 ms in relayouts, and
the custom_vjp boundary blocks loss-into-head fusion for the rest. The
production objective therefore stays on the XLA loss; this kernel is
available opt-in (``OCTSEG_PACKED_FUSED_LOSS=1``) and for standalone
use where logits are already class-major. (The earlier "loss costs
~14 ms" estimate from the bisect's ``sumloss`` delta was autodiff
*simplification* — a constant dlogits cheapens the whole backward — not
loss time.) The kernel computes the same scalar with:

* forward: ONE Pallas pass over bf16 NCHW logits producing per-class
  lane-partial (intersection, sum-prob, count) rows and the (ll*w, w)
  CE rows in fp32 VMEM accumulators; the final (C,)/scalar folds are a
  host-side sum over 128 lanes.
* backward (``jax.custom_vjp``): per-class coefficient rows A/B/wce are
  computed from the saved forward stats in XLA (C-sized, negligible),
  then ONE Pallas pass recomputes the per-pixel softmax and emits
  dlogits directly:

      dlogit_c = wce[lab]*(p_c - t_c)                 (CE)
               + A_c t_c p_c - p_c * (A_lab p_lab)    (d inter)
               + B_c p_c    - p_c * sum_c' B_c' p_c'  (d sum-prob)

Class dim is unrolled in registers (C <= 32), spatial dims are the
(sublane, lane) tile — no transposes, no materialized one-hot, no fp32
logits round-trip. Loss value and gradients match ``dice_ce_loss`` to
float tolerance (tests/test_pallas_loss.py).

Layout contract: logits are NCHW (class-minor NHWC tiles at C~10 waste
118/128 lanes). ``dice_ce_loss_pallas`` accepts NHWC and transposes
once; packed training's head emits NCHW directly so the transpose folds
into the head matmul.

Reference provenance: the reference's only trained pipeline uses Keras
categorical CE (`/root/reference/SOTAS/Layers_Segment/FourierNet/
trainTestModels.py:85-89`); the fused kernel is TPU-native machinery
with no reference counterpart.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-7


def _pick_th(h: int) -> int:
    for th in (64, 32, 16, 8, 4, 2, 1):
        if h % th == 0:
            return th
    return 1


def _supported(shape) -> bool:
    _, c, _, w = shape
    return w % 128 == 0 and c <= 32


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(C: int, x_ref, lab_ref, cw_ref, o_ref):
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when((b == 0) & (i == 0) & (j == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    lab = lab_ref[0]
    x = [x_ref[0, c].astype(jnp.float32) for c in range(C)]
    m = x[0]
    for c in range(1, C):
        m = jnp.maximum(m, x[c])
    e = [jnp.exp(xc - m) for xc in x]
    s = e[0]
    for c in range(1, C):
        s = s + e[c]
    inv = 1.0 / s
    logs = jnp.log(s)

    x_at = jnp.zeros_like(m)
    w = jnp.zeros_like(m)
    for c in range(C):
        t = (lab == c).astype(jnp.float32)
        p = e[c] * inv
        o_ref[c, :] += jnp.sum(p * t, axis=0)
        o_ref[C + c, :] += jnp.sum(p, axis=0)
        o_ref[2 * C + c, :] += jnp.sum(t, axis=0)
        x_at += x[c] * t
        w += cw_ref[c, :] * t
    ll = x_at - m - logs
    o_ref[3 * C, :] += jnp.sum(ll * w, axis=0)
    o_ref[3 * C + 1, :] += jnp.sum(w, axis=0)


def _bwd_kernel(C: int, x_ref, lab_ref, coef_ref, o_ref):
    lab = lab_ref[0]
    x = [x_ref[0, c].astype(jnp.float32) for c in range(C)]
    m = x[0]
    for c in range(1, C):
        m = jnp.maximum(m, x[c])
    e = [jnp.exp(xc - m) for xc in x]
    s = e[0]
    for c in range(1, C):
        s = s + e[c]
    inv = 1.0 / s

    qA = jnp.zeros_like(m)
    qB = jnp.zeros_like(m)
    wce = jnp.zeros_like(m)
    ts = []
    for c in range(C):
        t = (lab == c).astype(jnp.float32)
        ts.append(t)
        p = e[c] * inv
        qA += coef_ref[c, :] * t * p
        qB += coef_ref[C + c, :] * p
        wce += coef_ref[2 * C + c, :] * t
    for c in range(C):
        p = e[c] * inv
        d = (
            wce * (p - ts[c])
            + coef_ref[c, :] * ts[c] * p
            + coef_ref[C + c, :] * p
            - p * (qA + qB)
        )
        o_ref[0, c] = d.astype(o_ref.dtype)


def _run_fwd(x, lab, cw_rows):
    n, C, h, w = x.shape
    th = _pick_th(h)
    rows = pl.pallas_call(
        partial(_fwd_kernel, C),
        grid=(n, h // th, w // 128),
        in_specs=[
            pl.BlockSpec((1, C, th, 128), lambda b, i, j: (b, 0, i, j)),
            pl.BlockSpec((1, th, 128), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((C, 128), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((3 * C + 2, 128), lambda b, i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((3 * C + 2, 128), jnp.float32),
        interpret=_interp(),
    )(x, lab, cw_rows)
    return jnp.sum(rows, axis=-1)  # (3C+2,)


def _stats_to_loss(stats, C: int, dice_weight: float, uniform_dice: bool,
                   cw):
    inter, sp, cnt = stats[:C], stats[C:2 * C], stats[2 * C:3 * C]
    sll, sw = stats[3 * C], stats[3 * C + 1]
    ce = -sll / jnp.maximum(sw, _EPS)
    dice = (2.0 * inter + _EPS) / (sp + cnt + _EPS)
    if uniform_dice:
        dice_term = 1.0 - jnp.mean(dice)
    else:
        dice_term = 1.0 - jnp.sum(dice * cw) / jnp.maximum(jnp.sum(cw),
                                                           _EPS)
    return dice_weight * dice_term + ce


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _dice_ce_nchw(x, lab, cw, dice_weight: float, uniform_dice: bool):
    loss, _ = _fwd(x, lab, cw, dice_weight, uniform_dice)
    return loss


def _fwd(x, lab, cw, dice_weight, uniform_dice):
    C = x.shape[1]
    cw_rows = jnp.broadcast_to(cw.astype(jnp.float32)[:, None], (C, 128))
    stats = _run_fwd(x, lab, cw_rows)
    loss = _stats_to_loss(stats, C, dice_weight, uniform_dice, cw)
    return loss, (x, lab, cw, stats)


def _bwd(dice_weight, uniform_dice, res, g):
    x, lab, cw, stats = res
    n, C, h, w = x.shape
    g = g.astype(jnp.float32)
    inter, sp, cnt = stats[:C], stats[C:2 * C], stats[2 * C:3 * C]
    sw = stats[3 * C + 1]
    denom = sp + cnt + _EPS
    if uniform_dice:
        what = jnp.full((C,), 1.0 / C, jnp.float32)
    else:
        what = cw.astype(jnp.float32) / jnp.maximum(jnp.sum(cw), _EPS)
    A = g * dice_weight * (-what * 2.0 / denom)
    B = g * dice_weight * (what * (2.0 * inter + _EPS) / (denom * denom))
    wce = g * cw.astype(jnp.float32) / jnp.maximum(sw, _EPS)
    coef = jnp.broadcast_to(
        jnp.concatenate([A, B, wce])[:, None], (3 * C, 128)
    )
    th = _pick_th(h)
    dx = pl.pallas_call(
        partial(_bwd_kernel, C),
        grid=(n, h // th, w // 128),
        in_specs=[
            pl.BlockSpec((1, C, th, 128), lambda b, i, j: (b, 0, i, j)),
            pl.BlockSpec((1, th, 128), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((3 * C, 128), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, th, 128), lambda b, i, j: (b, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interp(),
    )(x, lab, coef)
    return (dx, None, None)


_dice_ce_nchw.defvjp(_fwd, _bwd)


def dice_ce_loss_pallas(logits, labels, class_weights=None,
                        dice_weight=1.0, *, nchw: bool = False):
    """Drop-in twin of ``training.losses.dice_ce_loss`` on the fused
    kernels. ``logits`` NHWC (default) or NCHW (``nchw=True`` — packed
    training's head emits NCHW so no transpose is needed). Falls back to
    the XLA implementation when the geometry is unsupported
    (W % 128 != 0 or C > 32)."""
    x = logits if nchw else logits.transpose(0, 3, 1, 2)
    if not _supported(x.shape):
        from ..training.losses import dice_ce_loss

        nhwc = logits.transpose(0, 2, 3, 1) if nchw else logits
        return dice_ce_loss(nhwc, labels, class_weights, dice_weight)
    C = x.shape[1]
    uniform = class_weights is None
    cw = (jnp.ones((C,), jnp.float32) if uniform
          else jnp.asarray(class_weights, jnp.float32))
    labels = labels.astype(jnp.int32)
    return _dice_ce_nchw(x, labels, cw, float(dice_weight), uniform)
