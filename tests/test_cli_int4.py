"""CLI wiring for the w4a4 deep-region serving config: --quantize int4.

``int4`` routes through the PSRP graph with ``deep_int4=True``
(inference/psrp.py): deep blk2..blk6 + ct0/ct1 run int4 MXU dots on chip;
off-TPU the graph runs interpret-mode int8 math, which is bit-identical
for the +-7-valued operands.
"""

import numpy as np
import pytest

from retinal_oct_image_segmentation_via_deep_learning_tpu import cli

UNET_ARGS = [
    "--model", "unet", "--num-classes", "6", "--image-size", "64",
    "--batch-size", "2", "--dtype", "float32",
    "--model-kwargs", '{"init_features": 16}',
]


def test_cli_infer_unet_int4(tmp_path):
    out = tmp_path / "masks_int4"
    cli.main(["infer", *UNET_ARGS, "--quantize", "int4",
              "--out-dir", str(out)])
    masks = np.load(out / "masks.npy")
    assert masks.shape == (2, 64, 64)
    assert masks.min() >= 0 and masks.max() < 6


def test_cli_eval_unet_int4():
    m = cli.main(["eval", *UNET_ARGS, "--quantize", "int4",
                  "--num-val", "2"])
    assert 0.0 <= m["pixel_accuracy"] <= 1.0


def test_cli_relaynet_int4_rejected():
    with pytest.raises(SystemExit):
        cli.main(["eval", "--model", "relaynet", "--num-classes", "5",
                  "--image-size", "64", "--batch-size", "2",
                  "--model-kwargs", '{"num_filters": 8}',
                  "--quantize", "int4", "--num-val", "2"])
