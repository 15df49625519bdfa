"""Bisect the packed bf16 training step (137 ms @512^2 b16, f=32).

Variants (each = full train step unless noted):
  full       — dice_ce loss, Pallas convs everywhere (the shipped config)
  sumloss    — trivial sum loss (isolates the dice_ce fwd+bwd cost)
  fwdonly    — forward pass only, sum-consumed (isolates bwd+opt)
  xla_deep   — deep P(1,1) stages (blk2..blk6) on XLA lax.conv (A/B:
               big-K convs have no lane-padding handicap in XLA)
  psrp_deep  — deep stages on the by=1 Pallas kernel (the pre-A/B default)
  xla_mid    — deep AND H/2 stages (blk1/blk7) on XLA (NHWC end-to-end
               at H/2, no pack/unpack at those boundaries)
  fusedloss  — dice_ce via the one-pass Pallas kernel on a class-major
               head (ops/pallas_loss; same math)
  nostats    — BN uses an affine transform only (no batch statistics;
               wrong math, measures the stats+bwd traffic cost)
  noct       — transpose convs replaced by nearest-neighbor upsample +
               1x1 conv to the right channel count (wrong math; measures
               the XLA ct + pack/unpack boundary cost vs a cheap analog)

Usage: python perf/packed_bisect.py [variant ...]
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 512
BATCH = int(os.environ.get("OCTSEG_BENCH_BATCH", "16"))


def measure(name):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.config import (
        ModelConfig,
        TrainConfig,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training import (
        packed_unet,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.packed_unet import (
        make_packed_train_step,
        packed_unet_apply,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.trainer import (
        Trainer,
    )

    cfg = TrainConfig(
        model=ModelConfig(name="unet", num_classes=10,
                          kwargs={"init_features": 32}),
        compute_dtype="bfloat16",
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jnp.zeros((1, SIZE, SIZE, 1), jnp.bfloat16))

    orig_bn = packed_unet._bn_packed
    orig_ct = packed_unet._ct

    def bn_affine(xp, by, bnp, updates, path):
        # eval-style affine with dummy stat updates (wrong math; perf probe)
        *lead, L = xp.shape
        cin = L // by
        scale = jnp.tile(bnp["scale"].astype(xp.dtype), by)
        bias = jnp.tile(bnp["bias"].astype(xp.dtype), by)
        updates[path] = (bnp["scale"] * 0.0, bnp["scale"] * 0.0 + 1.0)
        return xp * scale + bias

    def ct_cheap(x, ctp, dt):
        w = ctp["kernel"]  # (2, 2, in, out) HWIO per packed_unet._ct
        y = jnp.einsum("nhwc,co->nhwo", x.astype(dt), w[0, 0].astype(dt))
        y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
        return y

    loss_fn = trainer.loss_fn
    deep = mid = None
    fused = None
    if name == "fusedloss":
        fused = True
    if name == "sumloss":
        def loss_fn(logits, labels, cw=None):
            return jnp.sum(logits.astype(jnp.float32)) * 1e-9
    elif name == "xla_deep":
        deep = "xla"
    elif name == "psrp_deep":
        deep = "psrp"
    elif name == "xla_mid":
        deep, mid = "xla", "xla"
    elif name == "nostats":
        packed_unet._bn_packed = bn_affine
    elif name == "noct":
        packed_unet._ct = ct_cheap

    try:
        if name == "nchwhead":
            # NCHW head + XLA loss on transposed-back logits: isolates the
            # class-major head einsum cost from the Pallas loss kernel
            def step(st, x, y):
                def loss_of(params):
                    logits, new_stats = packed_unet_apply(
                        {"params": params, "batch_stats": st.batch_stats},
                        x, logits_layout="nchw",
                    )
                    return (trainer.loss_fn(logits.transpose(0, 2, 3, 1), y),
                            new_stats)

                (loss, new_stats), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(st.params)
                st = st.apply_gradients(grads=grads)
                return st.replace(batch_stats=new_stats), loss
        elif name == "fwdonly":
            def step(st, x, y):
                logits, _ = packed_unet_apply(
                    {"params": st.params, "batch_stats": st.batch_stats}, x)
                return st, jnp.sum(logits.astype(jnp.float32)) * 1e-9
        else:
            step = make_packed_train_step(loss_fn, deep=deep, mid=mid,
                                          fused_loss=fused)

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
            return state, total

        from common import scan_diff

        def go(iters):
            out, total = run(jax.tree.map(lambda a: a + 0, state), iters)
            del out
            float(total)

        per_step = scan_diff(go, 2, 10, reps=2)
        print(
            f"{name:9s}: {per_step*1e3:7.1f} ms/step  "
            f"{per_step/BATCH*1e3:5.2f} ms/img  {BATCH/per_step:6.0f} scans/s",
            flush=True,
        )
    finally:
        packed_unet._bn_packed = orig_bn
        packed_unet._ct = orig_ct


if __name__ == "__main__":
    names = sys.argv[1:] or ["full", "sumloss", "fwdonly", "psrp_deep",
                             "xla_mid", "nostats", "noct"]
    for n in names:
        measure(n)
