"""Per-pixel parity: EdgeAL FFC generator vs the reference torch module."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu import get_model
from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
    import_torch_state,
)
from reference_loader import load_reference, randomize_torch

import pytest

pytestmark = pytest.mark.slow


def test_edgeal_parity(rng):
    ref = load_reference("SOTAS/Lesions_Segment/EdgeAL_2021.py", "ref_edgeal")
    tm = ref.EdgeAL(
        in_channels=1, num_classes=3, ngf=16, n_blocks=2,
        ratio_gin=0.75, ratio_gout=0.75,
    )
    randomize_torch(tm)
    tm.eval()
    x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    fm = get_model("edgeal", num_classes=3, ngf=16, n_blocks=2)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nhwc)
    # torch ConvTranspose2d modules sit at sequential indices in model.*;
    # identify them by weight layout ambiguity -> use the module class names
    # captured from named_modules instead.
    transposed_names = {
        name for name, m in tm.named_modules()
        if type(m).__name__ == "ConvTranspose2d"
    }
    variables = import_torch_state(
        variables, tm.state_dict(), transposed=lambda n: n in transposed_names
    )
    got = np.asarray(fm.apply(variables, x_nhwc))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-4)


def test_reference_rotate_matches_torch(rng):
    """The FFC stack's rotate (tested standalone by the reference's own
    __main__, YNet_2022.py:884-890)."""
    ref = load_reference("SOTAS/Lesions_Segment/YNet_2022.py", "ref_ynet_rot")
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.sampling import (
        reference_rotate,
    )

    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref.rotate(
            torch.from_numpy(x), torch.tensor(23.0)
        ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        reference_rotate(jnp.asarray(x.transpose(0, 2, 3, 1)), 23.0)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)
