"""CLI wiring for the second PTQ model: relaynet --quantize int8|psrp.

infer writes masks, eval runs the metric suite over the quantized
predict_fn. PSRP runs in interpret mode off-TPU (relaynet_psrp_forward
auto-detects), so small shapes keep this fast. Reference role:
the FourierNet driver's predict/export loop
(/root/reference/SOTAS/Layers_Segment/FourierNet/trainTestModels.py).
"""

import numpy as np
import pytest

from retinal_oct_image_segmentation_via_deep_learning_tpu import cli

RELAY_ARGS = [
    "--model", "relaynet", "--num-classes", "5", "--image-size", "64",
    "--batch-size", "2", "--dtype", "float32",
    "--model-kwargs", '{"num_filters": 8}',
]


@pytest.mark.parametrize("quantize", ["int8", "psrp"])
def test_cli_infer_relaynet_quantized(tmp_path, quantize):
    out = tmp_path / f"masks_{quantize}"
    cli.main(["infer", *RELAY_ARGS, "--quantize", quantize,
              "--out-dir", str(out)])
    masks = np.load(out / "masks.npy")
    assert masks.shape == (2, 64, 64)
    assert masks.min() >= 0 and masks.max() < 5


def test_cli_eval_relaynet_psrp():
    m = cli.main(["eval", *RELAY_ARGS, "--quantize", "psrp",
                  "--num-val", "2"])
    assert 0.0 <= m["pixel_accuracy"] <= 1.0
    assert len(m["dice"]) == 5
