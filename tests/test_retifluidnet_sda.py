"""SDA (self-dual attention) parity vs the reference RetiFluidNet.

The reference's encoder/decoder conv stacks are built inside ``forward``
(random weights every call — untestable), but its alpha/beta SDA convs ARE
registered in ``__init__`` (``RetiFluidNet_pytorch_2022.py:39-50``), so the
SDA block itself is deterministic and parity-testable in isolation.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from reference_loader import load_reference

import pytest

pytestmark = pytest.mark.slow


def test_sda_parity(rng):
    ref = load_reference(
        "SOTAS/Lesions_Segment/RetiFluidNet_pytorch_2022.py", "ref_rfn"
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.retifluidnet import (
        SDA,
    )

    tm = ref.RetiFluidNet(in_channels=1, num_classes=4)
    # randomize the stage-0 alpha/beta convs (constant-1.0 init otherwise)
    with torch.no_grad():
        tm.alpha_convs[0].weight.normal_(0, 0.2)
        tm.beta_convs[0].weight.normal_(0, 0.2)
    tm.eval()

    x = rng.standard_normal((2, 64, 16, 16)).astype(np.float32)  # (B,C,H,W)
    with torch.no_grad():
        want = tm.SDA(torch.from_numpy(x), p_scale=4, SDAblock_nb=0).numpy()

    fm = SDA(p_scale=4)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nhwc)
    a = np.asarray(tm.alpha_convs[0].weight.detach()).transpose(2, 3, 1, 0)
    b = np.asarray(tm.beta_convs[0].weight.detach()).transpose(2, 3, 1, 0)
    variables = {
        "params": {
            "Conv_0": {"Conv_0": {"kernel": jnp.asarray(a)}},
            "Conv_1": {"Conv_0": {"kernel": jnp.asarray(b)}},
        }
    }
    got = np.asarray(fm.apply(variables, x_nhwc))
    np.testing.assert_allclose(
        got, want.transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )
