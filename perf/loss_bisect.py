"""Bisect the dice_ce train-step anomaly (round-1: sum loss 3.5 ms/img,
dice_ce 9.7 ms/img — ~6 ms/img unexplained).

Measures the full U-Net train step (fwd+bwd+Adam) under loss variants:
  sum          — trivial sum of logits (baseline)
  ce           — one-hot CE only
  dice         — soft dice only
  dice_ce      — the production fused loss (jax.checkpoint-wrapped)
  dice_ce_nock — same without jax.checkpoint
  ce_bf16      — CE with bf16 internals (no fp32 cast)
  dice_nosum   — dice with per-class sums replaced by a single mean (probe
                 whether the (B,H,W)->(C,) reductions are the cost)

Usage: python perf/loss_bisect.py [variant ...]
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 512
BATCH = 32


def _losses():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.losses import (
        _dice_ce_core,
        dice_ce_loss,
        dice_loss,
        softmax_cross_entropy,
    )

    def sum_loss(logits, labels, cw=None):
        return jnp.sum(logits.astype(jnp.float32)) * 1e-9

    def dice_ce_nock(logits, labels, cw=None):
        return _dice_ce_core(logits, labels, cw, 1.0)

    def ce_bf16(logits, labels, cw=None):
        nc = logits.shape[-1]
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(labels, nc, dtype=logits.dtype)
        return -jnp.mean(jnp.sum(logp * onehot, axis=-1).astype(jnp.float32))

    def dice_nosum(logits, labels, cw=None):
        logits = logits.astype(jnp.float32)
        nc = logits.shape[-1]
        probs = jax.nn.softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(labels, nc, dtype=jnp.float32)
        return 1.0 - jnp.mean(probs * onehot) * nc

    def dice_ce_nchw(logits, labels, cw=None):
        # class dim moved off the minor axis: all loss elementwise/reduce
        # work runs on (B, C, H, W) whose minor dims tile fully.
        t = logits.transpose(0, 3, 1, 2).astype(jnp.float32)
        nc = t.shape[1]
        logp = jax.nn.log_softmax(t, axis=1)
        probs = jnp.exp(logp)
        onehot = (labels[:, None] ==
                  jnp.arange(nc, dtype=labels.dtype)[None, :, None, None]
                  ).astype(jnp.float32)
        ll = jnp.sum(logp * onehot, axis=1)
        ce = -jnp.mean(ll)
        axes = (0, 2, 3)
        inter = jnp.sum(probs * onehot, axis=axes)
        denom = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
        dice = (2.0 * inter + 1e-7) / (denom + 1e-7)
        return (1.0 - jnp.mean(dice)) + ce

    def dice_ce_nchw_ck(logits, labels, cw=None):
        import functools
        return jax.checkpoint(functools.partial(dice_ce_nchw, cw=cw))(
            logits, labels)

    return {
        "sum": sum_loss,
        "ce": softmax_cross_entropy,
        "dice": dice_loss,
        "dice_ce": dice_ce_loss,
        "dice_ce_nock": dice_ce_nock,
        "ce_bf16": ce_bf16,
        "dice_nosum": dice_nosum,
        "dice_ce_nchw": dice_ce_nchw,
        "dice_ce_nchw_ck": dice_ce_nchw_ck,
    }


def measure(loss_fn, name):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        ModelConfig,
        TrainConfig,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
        Trainer,
        make_train_step,
    )

    cfg = TrainConfig(
        model=ModelConfig(name="unet", num_classes=10,
                          kwargs={"init_features": 32}),
        compute_dtype="bfloat16",
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jnp.zeros((1, SIZE, SIZE, 1), jnp.bfloat16))
    step = make_train_step(trainer.model, loss_fn)

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def run(state, iters: int):
        def body(carry, k):
            st, acc = carry
            x = jax.random.bits(k, (BATCH, SIZE, SIZE, 1), jnp.uint16)
            x = (x.astype(jnp.bfloat16) / 65536.0) - 0.5
            y = jax.random.randint(k, (BATCH, SIZE, SIZE), 0, 10)
            st, loss = step(st, x, y)
            return (st, acc + loss.astype(jnp.float32)), None

        (state, total), _ = jax.lax.scan(
            body, (state, jnp.float32(0)),
            jax.random.split(jax.random.PRNGKey(0), iters),
        )
        return total

    from common import scan_diff

    def go(iters):
        # donate-safe: keep a copy of state per call
        float(run(jax.tree.map(lambda a: a + 0, state), iters))

    per_step = scan_diff(go, 2, 10, reps=2)
    print(
        f"{name:13s}: {per_step*1e3:7.1f} ms/step  "
        f"{per_step/BATCH*1e3:5.2f} ms/img  {BATCH/per_step:6.0f} scans/s",
        flush=True,
    )
    if os.environ.get("OCTSEG_TRACE"):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from trace_tools import capture, report

        s = jax.tree.map(lambda a: a + 0, state)
        float(run(s, 4))  # compile outside the trace window
        s = jax.tree.map(lambda a: a + 0, state)
        report(capture(lambda: float(run(s, 4)), f"/tmp/octseg_trace_{name}"))


if __name__ == "__main__":
    table = _losses()
    for name in (sys.argv[1:] or list(table)):
        measure(table[name], name)
