"""Dataset-spec dispatcher: real loaders -> Trainer-contract batches, and
the cli train --data path end-to-end on a synthetic RETOUCH tree."""

import numpy as np
import pytest

from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
    load_real_dataset,
    make_datasets,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.retouch import (
    write_mhd_volume,
)


def _retouch_tree(tmp_path, n_cases=3, shape=(4, 40, 32)):
    rng = np.random.default_rng(0)
    for i in range(n_cases):
        d = tmp_path / f"TRAIN{i:03d}"
        d.mkdir()
        vol = rng.integers(0, 255, shape).astype(np.uint8)
        ref = rng.integers(0, 4, shape).astype(np.uint8)
        write_mhd_volume(str(d / "oct.mhd"), vol)
        write_mhd_volume(str(d / "reference.mhd"), ref)
    return str(tmp_path)


def test_load_real_retouch(tmp_path):
    root = _retouch_tree(tmp_path)
    images, labels, nc = load_real_dataset(f"retouch:{root}", (32, 32))
    assert images.shape == (12, 32, 32, 1) and images.dtype == np.float32
    assert labels.shape == (12, 32, 32) and nc == 4


def test_make_datasets_split_and_batches(tmp_path):
    root = _retouch_tree(tmp_path)
    train, val, nc = make_datasets(f"retouch:{root}", (32, 32), batch_size=2)
    xb, yb = next(iter(train.epoch(0)))
    assert xb.shape == (2, 32, 32, 1) and yb.shape == (2, 32, 32)
    assert train.steps_per_epoch >= 1 and val.steps_per_epoch >= 1
    assert make_datasets("synthetic", (32, 32), 2) is None


def test_make_datasets_splits_whole_volumes(tmp_path):
    # Validation must hold out WHOLE volumes: with 3 cases of 4 B-scans and
    # val_fraction covering ~one case, the split is 8 train / 4 val (never
    # a case straddling both sides).
    root = _retouch_tree(tmp_path)
    train, val, _ = make_datasets(
        f"retouch:{root}", (32, 32), batch_size=2, val_fraction=0.3
    )
    n_train = train.steps_per_epoch * 2
    n_val = val.steps_per_epoch * 2
    assert n_train % 4 == 0 and n_val % 4 == 0

    # volume identity: val images must all come from the held-out case(s)
    from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
        load_real_dataset,
    )

    images, _, _, vols = load_real_dataset(
        f"retouch:{root}", (32, 32), return_volumes=True
    )
    val_imgs = np.concatenate([np.asarray(x) for x, _ in val.epoch(0)])
    train_imgs = np.concatenate([np.asarray(x) for x, _ in train.epoch(0)])

    def vols_of(batch_imgs):
        out = set()
        for img in batch_imgs:
            idx = np.argmin(
                np.sum((images - img[None]) ** 2, axis=(1, 2, 3))
            )
            out.add(int(vols[idx]))
        return out

    assert vols_of(val_imgs).isdisjoint(vols_of(train_imgs))


def test_cli_train_on_real_data(tmp_path):
    from retinal_oct_image_segmentation_via_deep_learning_tpu import cli

    # batch 8: the Trainer shards batches across the 8-device test mesh
    root = _retouch_tree(tmp_path, n_cases=6, shape=(4, 32, 32))
    cli.main([
        "train", "--model", "unet", "--num-classes", "2",
        "--image-size", "32", "--epochs", "1", "--dtype", "float32",
        "--batch-size", "8", "--model-kwargs", '{"init_features": 4}',
        "--data", f"retouch:{root}",
    ])
