"""Per-pixel parity: flax U-Net / Y-Net vs the reference torch implementation.

Ground truth is produced by running the reference module
(``SOTAS/Lesions_Segment/YNet_2022.py``) under torch-cpu and importing its
weights via ``utils.torch_compat`` (fidelity contract: 1e-4, BASELINE.md).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
    UNet,
    YNet,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
    import_torch_state,
)
from reference_loader import load_reference, randomize_torch

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_ynet():
    return load_reference("SOTAS/Lesions_Segment/YNet_2022.py", "ref_ynet")


def _parity(torch_model, flax_model, x_nchw, atol=1e-4, transposed=None):
    randomize_torch(torch_model)
    torch_model.eval()
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x_nchw)).numpy()

    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    variables = flax_model.init(jax.random.PRNGKey(0), x_nhwc)
    variables = import_torch_state(
        variables,
        torch_model.state_dict(),
        transposed=transposed or (lambda n: "upconv" in n),
    )
    got = np.asarray(flax_model.apply(variables, x_nhwc))
    want = ref.transpose(0, 2, 3, 1)
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=atol)


def test_unet_parity(ref_ynet, rng):
    tm = ref_ynet.UNet(in_channels=1, out_channels=4, init_features=8)
    fm = UNet(out_channels=4, init_features=8, apply_softmax=True)
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    _parity(tm, fm, x)


def test_ynet_plain_parity(ref_ynet, rng):
    tm = ref_ynet.YNet_general(
        in_channels=1, num_classes=3, init_features=8, ffc=False
    )
    fm = YNet(num_classes=3, init_features=8, ffc=False, apply_softmax=True)
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    _parity(tm, fm, x)


def test_ynet_ffc_parity(ref_ynet, rng):
    tm = ref_ynet.YNet_general(
        in_channels=1, num_classes=3, init_features=8, ffc=True, ratio_in=0.5
    )
    fm = YNet(
        num_classes=3, init_features=8, ffc=True, ratio_in=0.5,
        apply_softmax=True,
    )
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    _parity(tm, fm, x)


def test_ynet_skip_ffc_parity(ref_ynet, rng):
    """The dual-skip decoder path (reference :791-839)."""
    tm = ref_ynet.YNet_general(
        in_channels=1, num_classes=3, init_features=8, ffc=True,
        ratio_in=0.5, skip_ffc=True,
    )
    fm = YNet(
        num_classes=3, init_features=8, ffc=True, ratio_in=0.5,
        skip_ffc=True, apply_softmax=True,
    )
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    _parity(tm, fm, x)


def test_ynet_no_cat_merge_parity(ref_ynet, rng):
    """Plain channel-concat bottleneck (cat_merge=False, reference :786)."""
    tm = ref_ynet.YNet_general(
        in_channels=1, num_classes=3, init_features=8, ffc=False,
        cat_merge=False,
    )
    fm = YNet(
        num_classes=3, init_features=8, ffc=False, cat_merge=False,
        apply_softmax=True,
    )
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    _parity(tm, fm, x)
