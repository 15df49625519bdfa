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
    return TrainConfig(
        model=ModelConfig(
            name=args.model,
            in_channels=args.in_channels,
            num_classes=args.num_classes,
            kwargs=kwargs,
        ),
        optim=OptimConfig(optimizer=args.optimizer, learning_rate=args.lr),
        data=DataConfig(
            image_size=(args.image_size, args.image_size),
            batch_size=args.batch_size,
            num_train=args.num_train,
            num_val=args.num_val,
        ),
        loss=args.loss,
        num_epochs=args.epochs,
        checkpoint_dir=args.checkpoint_dir,
        compute_dtype=args.dtype,
        early_stop_patience=args.patience,
    )


def cmd_train(args):
    from .training.data import SyntheticOCTConfig, SyntheticOCTDataset
    from .training.trainer import Trainer
    from .utils.logging import MetricLogger

    cfg = _build_cfg(args)
    dcfg = SyntheticOCTConfig(
        height=args.image_size, width=args.image_size,
        num_layers=max(args.num_classes - 2, 1),
    )
    train_ds = SyntheticOCTDataset(dcfg, cfg.data.num_train, cfg.data.batch_size)
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


def main(argv=None):
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
    t.add_argument("--epochs", type=int, default=10)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--optimizer", default="adam")
    t.add_argument("--loss", default="dice_ce")
    t.add_argument("--num-train", type=int, default=128)
    t.add_argument("--num-val", type=int, default=16)
    t.add_argument("--patience", type=int, default=50)
    t.add_argument("--checkpoint-dir", default=None)
    t.add_argument("--log-file", default=None)
    t.set_defaults(fn=cmd_train)

    s = sub.add_parser("smoke", parents=[common])
    s.add_argument("--strict", action="store_true")
    s.set_defaults(fn=cmd_smoke)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
