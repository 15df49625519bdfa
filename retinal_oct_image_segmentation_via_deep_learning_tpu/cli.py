"""Unified CLI: train / eval / bench any registry model from one config.

Replaces the reference's per-file ``__main__`` smoke tests and hardcoded
``main`` constants (``trainTestModels.py:137-164``) with a single driver:

    python -m retinal_oct_image_segmentation_via_deep_learning_tpu.cli \
        train --model unet --num-classes 10 --image-size 256 --epochs 5
    python -m ... eval  --model relaynet ...
    python -m ... smoke --model all      # shape-check every zoo model
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _build_cfg(args):
    from .config import DataConfig, ModelConfig, OptimConfig, TrainConfig

    kwargs = json.loads(args.model_kwargs) if args.model_kwargs else {}
    get = lambda name, default: getattr(args, name, default)
    return TrainConfig(
        model=ModelConfig(
            name=args.model,
            in_channels=args.in_channels,
            num_classes=args.num_classes,
            kwargs=kwargs,
        ),
        optim=OptimConfig(
            optimizer=get("optimizer", "adam"),
            learning_rate=get("lr", 1e-3),
        ),
        data=DataConfig(
            image_size=(args.image_size, args.image_size),
            batch_size=args.batch_size,
            num_train=get("num_train", 128),
            num_val=get("num_val", 16),
        ),
        loss=get("loss", "dice_ce"),
        num_epochs=get("epochs", 10),
        checkpoint_dir=get("checkpoint_dir", None),
        compute_dtype=args.dtype,
        early_stop_patience=get("patience", 50),
        packed_train=get("packed", False),
    )


def cmd_train(args):
    from .training.data import (
        SyntheticOCTConfig,
        SyntheticOCTDataset,
        make_datasets,
    )
    from .training.trainer import Trainer
    from .utils.logging import MetricLogger

    cfg = _build_cfg(args)
    real = make_datasets(
        getattr(args, "data", None),
        (args.image_size, args.image_size), cfg.data.batch_size,
    )
    if real is not None:
        train_ds, val_ds, num_classes = real
        if num_classes > cfg.model.num_classes:
            print(f"note: dataset has {num_classes} classes; overriding "
                  f"--num-classes {cfg.model.num_classes}")
            from .config import flat_update

            cfg = flat_update(cfg, {"model.num_classes": num_classes})
    else:
        dcfg = SyntheticOCTConfig(
            height=args.image_size, width=args.image_size,
            num_layers=max(args.num_classes - 2, 1),
        )
        train_ds = SyntheticOCTDataset(
            dcfg, cfg.data.num_train, cfg.data.batch_size
        )
        val_ds = SyntheticOCTDataset(
            SyntheticOCTConfig(
                height=args.image_size, width=args.image_size,
                num_layers=max(args.num_classes - 2, 1), seed=99,
            ),
            cfg.data.num_val, cfg.data.batch_size,
        )
    trainer = Trainer(cfg)
    logger = MetricLogger(args.log_file)
    state = trainer.fit(train_ds, val_ds)
    for rec in trainer.history:
        logger.log(rec)
    return state


def _relaynet_quantized_fwd(variables, calib, quantize, num_classes):
    """Quantize a ReLayNet checkpoint and return `x -> int32 labels`.

    quantize: 'int8' (all-XLA graph, inference/relaynet_int8.py) or 'psrp'
    (full-Pallas serving graph, inference/relaynet_psrp.py — 2.1x int8
    on-chip, docs/PERF.md). calib: preprocessed fp32 calibration batch.
    """
    import jax
    import jax.numpy as jnp

    from .inference.relaynet_int8 import (
        calibrate_relaynet,
        fold_relaynet_bn,
        quantize_relaynet,
        relaynet_int8_forward,
    )

    layers = fold_relaynet_bn(variables)
    taps = calibrate_relaynet(layers, [calib[: min(4, calib.shape[0])]])
    if quantize == "psrp":
        from .inference.relaynet_psrp import (
            quantize_relaynet_psrp,
            relaynet_psrp_forward,
        )

        qp = jax.tree.map(jnp.asarray, quantize_relaynet_psrp(layers, taps))
        return lambda x: relaynet_psrp_forward(
            qp, x, num_classes=num_classes
        ).astype(jnp.int32)
    qp = jax.tree.map(jnp.asarray, quantize_relaynet(layers, taps))
    return lambda x: jnp.argmax(relaynet_int8_forward(qp, x), axis=-1)


def cmd_infer(args):
    """Batch inference: folder (or synthetic) -> preprocess -> predict ->
    masks (+ class-1 probability maps, the reference's export convention)."""
    import os

    import jax
    import jax.numpy as jnp

    from .training.data import SyntheticOCTConfig, synth_batch
    from .training.trainer import Trainer
    from .utils.logging import export_prob_maps

    cfg = _build_cfg(args)
    trainer = Trainer(cfg)

    names = None
    if args.image_dir:
        from .training.fouriernet_pipeline import read_folder_dataset

        images, _, names = read_folder_dataset(args.image_dir)
        images = jnp.asarray(images)[..., None]
    else:
        dcfg = SyntheticOCTConfig(
            height=args.image_size, width=args.image_size,
            num_layers=max(args.num_classes - 2, 1),
        )
        images, _ = synth_batch(
            jax.random.PRNGKey(0), args.batch_size, dcfg
        )

    if args.checkpoint:
        from .training.checkpoint import load_model

        state = trainer.init_state(images[:1])
        state = load_model(args.checkpoint, jax.device_get(state))
    else:
        state = trainer.init_state(images[:1])
        print("note: no --checkpoint given; using random init")

    if getattr(args, "spatial", 1) > 1 and getattr(
        args, "quantize", "off"
    ) not in ("off", "int8"):
        raise SystemExit(
            "--spatial supports --quantize off|int8 (the packed/psrp "
            "layouts shard over data, not space — see parallel/serving)"
        )
    if getattr(args, "quantize", "off") != "off":
        if cfg.model.name == "relaynet":
            # second zoo model on the PTQ pipeline: all-XLA int8 graph, or
            # the full-Pallas PSRP graph (inference/relaynet_psrp.py)
            if args.quantize not in ("int8", "psrp") or \
                    getattr(args, "spatial", 1) > 1:
                raise SystemExit(
                    "--model relaynet supports --quantize int8|psrp "
                    "(single-device)"
                )
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            xs = trainer._preprocess(images).astype(jnp.float32)
            fwd = _relaynet_quantized_fwd(
                variables, xs, args.quantize, cfg.model.num_classes
            )
            preds = fwd(xs)
            os.makedirs(args.out_dir, exist_ok=True)
            import numpy as np_

            np_.save(os.path.join(args.out_dir, "masks.npy"),
                     np_.asarray(preds))
            if args.export_probs:
                logits = trainer.model.apply(
                    variables, trainer._preprocess(images), train=False
                )
                probs = jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1)[..., 1]
                export_prob_maps(probs, args.out_dir, names)
            print(f"wrote {preds.shape[0]} masks to {args.out_dir}")
            return
        if cfg.model.name != "unet":
            raise SystemExit(
                "--quantize supports --model unet (int8/packed/psrp) or "
                "relaynet (int8)"
            )
        from .inference import (
            calibrate_unet,
            fold_unet_bn,
            quantize_unet,
            quantize_unet_packed,
            unet_int8_forward,
            unet_packed_forward,
        )
        from .inference.psrp import quantize_unet_psrp, unet_psrp_forward

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        xs = trainer._preprocess(images).astype(jnp.float32)
        if getattr(args, "load_quantized", None):
            from .inference.artifacts import load_qparams

            qp_loaded = load_qparams(args.load_quantized)
        else:
            qp_loaded = None
            layers = fold_unet_bn(variables)
            taps = calibrate_unet(layers, [xs[: min(4, xs.shape[0])]])
        if args.quantize in ("psrp", "int4"):
            qp = jax.tree.map(jnp.asarray, qp_loaded or quantize_unet_psrp(
                layers, taps,
                init_features=int(layers["blk0_conv0"]["w"].shape[-1]),
                deep_int4=args.quantize == "int4",
            ))
            preds = unet_psrp_forward(
                qp, xs, cfg.model.num_classes
            ).astype(jnp.int32)
        elif args.quantize == "packed":
            qp = jax.tree.map(
                jnp.asarray, qp_loaded or quantize_unet_packed(layers, taps)
            )
            preds = unet_packed_forward(
                qp, xs, cfg.model.num_classes
            ).astype(jnp.int32)
        else:
            qp = jax.tree.map(
                jnp.asarray, qp_loaded or quantize_unet(layers, taps)
            )
            if getattr(args, "spatial", 1) > 1:
                from .parallel.halo import spatial_shard_infer
                from .parallel.mesh import create_mesh

                mesh = create_mesh(data=1, space=args.spatial)
                logits = spatial_shard_infer(
                    lambda q, t: unet_int8_forward(q, t), qp, xs, mesh
                )
            else:
                logits = unet_int8_forward(qp, xs)
            preds = jnp.argmax(logits, axis=-1)
        if getattr(args, "save_quantized", None):
            from .inference.artifacts import save_qparams

            save_qparams(args.save_quantized, jax.device_get(qp))
            print(f"wrote quantized artifact to {args.save_quantized}")
    else:
        if getattr(args, "spatial", 1) > 1:
            from .parallel.halo import spatial_shard_infer
            from .parallel.mesh import create_mesh

            mesh = create_mesh(data=1, space=args.spatial)
            variables = {"params": state.params}
            if state.batch_stats is not None and state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits = spatial_shard_infer(
                lambda v, t: trainer.model.apply(v, t, train=False),
                variables, trainer._preprocess(images), mesh,
            )
            preds = jnp.argmax(logits, axis=-1)
        else:
            preds = trainer.predict(state, images)
    os.makedirs(args.out_dir, exist_ok=True)
    import numpy as np_

    np_.save(os.path.join(args.out_dir, "masks.npy"), np_.asarray(preds))
    if args.export_probs:
        variables = {"params": state.params}
        if state.batch_stats is not None and state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = trainer.model.apply(
            variables, trainer._preprocess(images), train=False
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]
        export_prob_maps(probs, args.out_dir, names)
    print(f"wrote {preds.shape[0]} masks to {args.out_dir}")


def cmd_eval(args):
    """Dataset evaluation: the full on-device metric suite (per-class Dice/
    IoU/sensitivity/specificity/precision + confusion matrix)."""
    import jax

    from .training.data import (
        SyntheticOCTConfig,
        SyntheticOCTDataset,
        make_datasets,
    )
    from .training.trainer import Trainer

    cfg = _build_cfg(args)
    real = make_datasets(
        getattr(args, "data", None),
        (args.image_size, args.image_size), args.batch_size,
    )
    if real is not None:
        _, ds, num_classes = real  # evaluate on the validation split
        if num_classes > cfg.model.num_classes:
            from .config import flat_update

            cfg = flat_update(cfg, {"model.num_classes": num_classes})
    trainer = Trainer(cfg)
    if real is None:
        dcfg = SyntheticOCTConfig(
            height=args.image_size, width=args.image_size,
            num_layers=max(args.num_classes - 2, 1), seed=99,
        )
        ds = SyntheticOCTDataset(dcfg, args.num_val, args.batch_size)

    import jax.numpy as jnp

    state = trainer.init_state(
        jnp.zeros((1, args.image_size, args.image_size, 1))
    )
    if args.checkpoint:
        from .training.checkpoint import load_model

        state = load_model(args.checkpoint, jax.device_get(state))
    else:
        print("note: no --checkpoint given; evaluating random init")

    predict_fn = None
    if getattr(args, "quantize", "off") != "off" and \
            cfg.model.name == "relaynet":
        # second PTQ model on the metric suite: int8 OR psrp serving graph
        if args.quantize not in ("int8", "psrp"):
            raise SystemExit("--model relaynet supports --quantize int8|psrp")
        calib_imgs, _ = next(iter(ds.epoch(0)))
        calib = trainer._preprocess(calib_imgs).astype(jnp.float32)
        fwd = _relaynet_quantized_fwd(
            {"params": state.params, "batch_stats": state.batch_stats},
            calib, args.quantize, trainer.cfg.model.num_classes,
        )
        predict_fn = lambda st, imgs: fwd(
            trainer._preprocess(imgs).astype(jnp.float32)
        )
    elif getattr(args, "quantize", "off") != "off":
        # PTQ accuracy cost measured with the SAME metric suite: quantize
        # the (loaded) checkpoint, evaluate the int8/psrp serving graph.
        from .inference import (
            calibrate_unet,
            fold_unet_bn,
            quantize_unet,
            unet_int8_forward,
        )
        from .inference.psrp import quantize_unet_psrp, unet_psrp_forward

        layers = fold_unet_bn(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        calib_imgs, _ = next(iter(ds.epoch(0)))
        calib = trainer._preprocess(calib_imgs).astype(jnp.float32)
        taps = calibrate_unet(layers, [calib[: min(4, calib.shape[0])]])
        if args.quantize in ("psrp", "int4"):
            qp = jax.tree.map(jnp.asarray, quantize_unet_psrp(
                layers, taps,
                init_features=int(layers["blk0_conv0"]["w"].shape[-1]),
                deep_int4=args.quantize == "int4",
            ))
            nc_q = trainer.cfg.model.num_classes
            predict_fn = lambda st, imgs: unet_psrp_forward(
                qp, trainer._preprocess(imgs).astype(jnp.float32), nc_q
            ).astype(jnp.int32)
        else:
            qp = jax.tree.map(jnp.asarray, quantize_unet(layers, taps))
            predict_fn = lambda st, imgs: jnp.argmax(unet_int8_forward(
                qp, trainer._preprocess(imgs).astype(jnp.float32)), -1)

    m = trainer.evaluate(state, ds, predict_fn=predict_fn)
    print(f"pixel_accuracy: {m['pixel_accuracy']:.4f}")
    for name in ("dice", "iou", "sensitivity", "specificity", "precision",
                 "hd95", "assd", "thickness_diff", "vi_diff"):
        if name in m:
            vals = " ".join(f"{v:.4f}" for v in m[name])
            print(f"{name:14s} per-class: {vals}")
    return m


def cmd_smoke(args):
    """Instantiate + forward every model at a small shape (the role of the
    reference's per-file __main__ tests, SURVEY.md §3.4)."""
    import jax
    import jax.numpy as jnp

    from . import get_model, list_models
    from .utils.profiling import count_params

    names = list_models() if args.model == "all" else [args.model]
    rng = np.random.default_rng(0)
    for name in names:
        t0 = time.time()
        size = 64
        kwargs = {}
        num_classes = args.num_classes
        if name == "mgunet" or name == "mgunet_2":
            size = 160
        if name == "sdnet":
            kwargs = {"img_size": size, "channels": (8, 16, 32, 64, 128)}
        if name == "anogan":
            # reconstruction GAN: D consumes G's output, so out == in channels
            # (reference default num_classes=1, AnoGAN_2019.py:93)
            num_classes = 1
        try:
            model = get_model(name, num_classes=num_classes, **kwargs)
            x = jnp.asarray(
                rng.standard_normal((1, size, size, 1)).astype(np.float32)
            )
            init_rngs = {"params": jax.random.PRNGKey(0)}
            if name == "sdnet":
                init_rngs["latent"] = jax.random.PRNGKey(1)
            variables = model.init(init_rngs, x)
            out = model.apply(
                variables, x,
                rngs={"latent": jax.random.PRNGKey(2)} if name == "sdnet" else None,
            )
            shape = jax.tree.map(
                lambda t: tuple(t.shape) if hasattr(t, "shape") else t, out
            )
            n_params = count_params(variables.get("params", variables))
            print(
                f"{name:16s} ok  params={n_params:>12,}  "
                f"out={str(shape)[:80]}  ({time.time()-t0:.1f}s)"
            )
        except Exception as e:  # noqa: BLE001 - smoke reporting
            print(f"{name:16s} FAIL: {type(e).__name__}: {e}")
            if args.strict:
                raise


def cmd_serve(args):
    """Persistent HTTP serving: ServingLoop micro-batching + stdlib HTTP
    frontend (inference/http_server.py). Serves any quantization tier from
    a checkpoint or a saved quantized artifact."""
    import jax
    import jax.numpy as jnp

    from .inference.http_server import serve_forever
    from .inference.server import ServingLoop
    from .training.trainer import Trainer

    cfg = _build_cfg(args)
    trainer = Trainer(cfg)
    H = W = args.image_size
    nc = cfg.model.num_classes

    if args.quantize != "off" and cfg.model.name == "relaynet":
        # ReLayNet ServingLoop path: int8 or psrp quantized graph
        state = _serve_state(trainer, args, H, W)
        calib = trainer._preprocess(
            jnp.zeros((2, H, W, 1), jnp.float32)
        ).astype(jnp.float32)
        qfwd = _relaynet_quantized_fwd(
            {"params": state.params, "batch_stats": state.batch_stats},
            calib, args.quantize, nc,
        )
        fwd = lambda x: qfwd(trainer._preprocess(x).astype(jnp.float32))
    elif args.quantize != "off":
        if cfg.model.name != "unet":
            raise SystemExit(
                "--quantize supports --model unet or relaynet"
            )
        from .inference import (
            calibrate_unet,
            fold_unet_bn,
            quantize_unet,
            unet_int8_forward,
        )
        from .inference.psrp import quantize_unet_psrp, unet_psrp_forward

        if args.load_quantized:
            from .inference.artifacts import load_qparams

            qp = jax.tree.map(jnp.asarray, load_qparams(args.load_quantized))
        else:
            state = _serve_state(trainer, args, H, W)
            layers = fold_unet_bn(
                {"params": state.params, "batch_stats": state.batch_stats}
            )
            calib = trainer._preprocess(
                jnp.zeros((2, H, W, 1), jnp.float32)
            ).astype(jnp.float32)
            taps = calibrate_unet(layers, [calib])
            if args.quantize in ("psrp", "int4"):
                qp = jax.tree.map(jnp.asarray, quantize_unet_psrp(
                    layers, taps,
                    init_features=int(layers["blk0_conv0"]["w"].shape[-1]),
                    deep_int4=args.quantize == "int4",
                ))
            else:
                qp = jax.tree.map(jnp.asarray, quantize_unet(layers, taps))
        if args.quantize in ("psrp", "int4"):
            fwd = lambda x: unet_psrp_forward(
                qp, trainer._preprocess(x).astype(jnp.float32), nc
            ).astype(jnp.int32)
        else:
            fwd = lambda x: jnp.argmax(unet_int8_forward(
                qp, trainer._preprocess(x).astype(jnp.float32)), -1)
    else:
        state = _serve_state(trainer, args, H, W)
        variables = {"params": state.params}
        if state.batch_stats is not None and state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        fwd = lambda x: jnp.argmax(trainer.model.apply(
            variables, trainer._preprocess(x), train=False), -1)

    loop = ServingLoop(fwd, (H, W, args.in_channels),
                       batch_size=args.batch_size,
                       max_wait_ms=args.max_wait_ms)
    serve_forever(loop, host=args.host, port=args.port)


def _serve_state(trainer, args, H, W):
    import jax.numpy as jnp

    state = trainer.init_state(jnp.zeros((1, H, W, 1), jnp.float32))
    if args.checkpoint:
        import jax

        from .training.checkpoint import load_model

        state = load_model(args.checkpoint, jax.device_get(state))
    else:
        print("note: no --checkpoint given; using random init")
    return state


def main(argv=None):
    import os as _os

    if _os.environ.get("OCTSEG_PLATFORM"):
        # Escape hatch for hosts whose site config pins JAX_PLATFORMS to a
        # remote backend (jax.config wins over the env var when set before
        # first backend use) — e.g. OCTSEG_PLATFORM=cpu for offline tests.
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["OCTSEG_PLATFORM"])
    p = argparse.ArgumentParser(prog="octseg")
    sub = p.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--model", default="unet")
    common.add_argument("--num-classes", type=int, default=10)
    common.add_argument("--in-channels", type=int, default=1)
    common.add_argument("--model-kwargs", default="")
    common.add_argument("--image-size", type=int, default=256)
    common.add_argument("--batch-size", type=int, default=8)
    common.add_argument("--dtype", default="bfloat16")

    t = sub.add_parser("train", parents=[common])
    t.add_argument(
        "--data", default=None,
        help="real dataset spec: duke:<dir> | retouch:<dir> | png:<dir> "
             "(default: on-device synthetic)",
    )
    t.add_argument("--epochs", type=int, default=10)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--optimizer", default="adam")
    t.add_argument("--loss", default="dice_ce")
    t.add_argument("--num-train", type=int, default=128)
    t.add_argument("--num-val", type=int, default=16)
    t.add_argument("--patience", type=int, default=50)
    t.add_argument("--checkpoint-dir", default=None)
    t.add_argument("--log-file", default=None)
    t.add_argument(
        "--packed", nargs="?", const=True, default=False,
        choices=[True, "remat"],
        help="packed PSRP bf16 training forward (flagship unet only); "
        "'remat' additionally checkpoints each block",
    )
    t.set_defaults(fn=cmd_train)

    s = sub.add_parser("smoke", parents=[common])
    s.add_argument("--strict", action="store_true")
    s.set_defaults(fn=cmd_smoke)

    e = sub.add_parser("eval", parents=[common])
    e.add_argument("--checkpoint", default=None)
    e.add_argument("--num-val", type=int, default=16)
    e.add_argument(
        "--quantize", choices=("off", "int8", "psrp", "int4"), default="off",
        help="evaluate the PTQ serving graph instead of the fp32 model "
             "(unet; measures quantization accuracy cost)",
    )
    e.add_argument(
        "--data", default=None,
        help="real dataset spec: duke:<dir> | retouch:<dir> | png:<dir> "
             "(evaluates the validation split)",
    )
    e.set_defaults(fn=cmd_eval)

    i = sub.add_parser("infer", parents=[common])
    i.add_argument("--image-dir", default=None)
    i.add_argument("--checkpoint", default=None)
    i.add_argument("--out-dir", default="./inference_out")
    i.add_argument("--export-probs", action="store_true")
    i.add_argument(
        "--spatial", type=int, default=1,
        help="shard B-scan height over an N-way space mesh (exact "
             "halo-exchange inference; fp32 and int8 graphs)",
    )
    i.add_argument(
        "--save-quantized", default=None,
        help="write the quantized serving artifact (.npz) after calibration",
    )
    i.add_argument(
        "--load-quantized", default=None,
        help="serve from a saved quantized artifact (skips checkpoint "
             "folding and calibration)",
    )
    i.add_argument(
        "--quantize", choices=("off", "int8", "packed", "psrp", "int4"),
        default="off",
        help="int8 PTQ serving paths (unet): XLA int8 or the row-packed "
             "Pallas graph (TPU; interpret-mode elsewhere)",
    )
    i.set_defaults(fn=cmd_infer)

    v = sub.add_parser("serve", parents=[common])
    v.add_argument("--checkpoint", default=None)
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8765)
    v.add_argument("--max-wait-ms", type=float, default=2.0)
    v.add_argument(
        "--quantize", choices=("off", "int8", "psrp", "int4"), default="off"
    )
    v.add_argument("--load-quantized", default=None)
    v.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
