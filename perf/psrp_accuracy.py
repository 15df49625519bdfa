"""On-chip accuracy contract for the PSRP serving graph (VERDICT r2 item 4).

Runs on the REAL TPU (not interpret mode): trains the f=32 U-Net briefly on
on-device synthetic OCT, post-training-quantizes it, and measures argmax
agreement of the full-Pallas PSRP serving graph against (a) the all-XLA
int8 graph and (b) the fp32 folded forward, at 512^2 on a held-out batch.

Usage: python perf/psrp_accuracy.py [steps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 512
NC = 10


def main(steps=30):
    import optax

    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.psrp import (
        quantize_unet_psrp,
        unet_psrp_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        calibrate_unet,
        fold_unet_bn,
        folded_forward,
        quantize_unet,
        unet_int8_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
        UNet,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
        SyntheticOCTConfig,
        synth_batch,
    )

    cfg = SyntheticOCTConfig(height=SIZE, width=SIZE, seed=5)
    assert cfg.num_classes == NC
    model = UNet(out_channels=NC, init_features=32, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1), jnp.bfloat16)
    )
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, key):
        x, y = synth_batch(key, 8, cfg)

        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            onehot = jax.nn.one_hot(y, NC)
            return -jnp.mean(jnp.sum(logp * onehot, -1)), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    # cache the trained checkpoint across invocations (accuracy-contract
    # iterations re-run quantizer variants, not training): OCTSEG_ACC_CKPT
    # names an .npz; delete it to retrain.
    ckpt = os.environ.get("OCTSEG_ACC_CKPT", "/tmp/psrp_acc_ckpt.npz")
    loaded = False
    if ckpt and os.path.exists(ckpt):
        import pickle

        with open(ckpt, "rb") as fh:
            blob = pickle.load(fh)
        if blob.get("steps") == steps:
            params = jax.tree.map(jnp.asarray, blob["params"])
            stats = jax.tree.map(jnp.asarray, blob["stats"])
            loaded = True
            print(f"loaded cached {steps}-step checkpoint {ckpt}",
                  flush=True)
    if not loaded:
        key = jax.random.PRNGKey(1)
        for i in range(steps):
            params, stats, opt_state, loss = step(
                params, stats, opt_state, jax.random.fold_in(key, i)
            )
            if i % 10 == 0:
                print(f"step {i} loss {float(loss):.4f}", flush=True)
        if ckpt:
            import pickle

            with open(ckpt, "wb") as fh:
                pickle.dump(
                    {"steps": steps,
                     "params": jax.device_get(params),
                     "stats": jax.device_get(stats)}, fh)

    layers = fold_unet_bn({"params": params, "batch_stats": stats})
    xc, _ = synth_batch(jax.random.PRNGKey(99), 4, cfg)
    taps = calibrate_unet(layers, [np.asarray(xc, np.float32)])
    qp_psrp = jax.tree.map(jnp.asarray, quantize_unet_psrp(layers, taps))
    qp_int4 = jax.tree.map(
        jnp.asarray, quantize_unet_psrp(layers, taps, deep_int4=True)
    )
    qp_w4 = jax.tree.map(
        jnp.asarray, quantize_unet_psrp(layers, taps, deep_int4="w4")
    )
    qp_a4 = jax.tree.map(
        jnp.asarray, quantize_unet_psrp(layers, taps, deep_int4="a4")
    )
    qp_int8 = jax.tree.map(jnp.asarray, quantize_unet(layers, taps, False))

    xt, yt = synth_batch(jax.random.PRNGKey(123), 8, cfg)
    lab_psrp = np.asarray(unet_psrp_forward(qp_psrp, xt, NC))
    lab_int4 = np.asarray(unet_psrp_forward(qp_int4, xt, NC))
    lab_int8 = np.asarray(jnp.argmax(unet_int8_forward(qp_int8, xt), -1))
    lab_f32 = np.asarray(jnp.argmax(folded_forward(layers, xt), -1))
    yt = np.asarray(yt)

    agree_int8 = float((lab_psrp == lab_int8).mean())
    agree_f32 = float((lab_psrp == lab_f32).mean())
    acc_f32 = float((lab_f32 == yt).mean())
    acc_psrp = float((lab_psrp == yt).mean())
    print(
        f"ON-CHIP psrp-vs-int8 argmax agreement: {agree_int8:.4%}\n"
        f"ON-CHIP psrp-vs-fp32 argmax agreement: {agree_f32:.4%}\n"
        f"pixel acc vs labels: fp32 {acc_f32:.4%}  psrp {acc_psrp:.4%}",
        flush=True,
    )
    lab_w4 = np.asarray(unet_psrp_forward(qp_w4, xt, NC))
    lab_a4 = np.asarray(unet_psrp_forward(qp_a4, xt, NC))
    print(
        f"ATTRIB w4-only-vs-int8 agreement: "
        f"{float((lab_w4 == lab_int8).mean()):.4%}  "
        f"pixel acc {float((lab_w4 == yt).mean()):.4%}\n"
        f"ATTRIB a4-only-vs-int8 agreement: "
        f"{float((lab_a4 == lab_int8).mean()):.4%}  "
        f"pixel acc {float((lab_a4 == yt).mean()):.4%}",
        flush=True,
    )
    print(
        f"ON-CHIP int4deep-vs-int8 argmax agreement: "
        f"{float((lab_int4 == lab_int8).mean()):.4%}\n"
        f"ON-CHIP int4deep-vs-psrp argmax agreement: "
        f"{float((lab_int4 == lab_psrp).mean()):.4%}\n"
        f"ON-CHIP int4deep-vs-fp32 argmax agreement: "
        f"{float((lab_int4 == lab_f32).mean()):.4%}\n"
        f"pixel acc vs labels: int4deep "
        f"{float((lab_int4 == yt).mean()):.4%}",
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
