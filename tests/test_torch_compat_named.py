"""Name-based torch import (VERDICT r1 item 9): robust to registration order.

The order-zipped importer requires torch registration order == call order;
here a torch module deliberately registers its layers in reverse, the
order-based path mis-assigns (shape mismatch), and the name-mapped path
loads correctly — verified by forward parity.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp
from flax import linen as nn

from retinal_oct_image_segmentation_via_deep_learning_tpu.models.blocks import (
    Conv,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
    import_torch_state,
    import_torch_state_named,
)

pytestmark = pytest.mark.slow


class TScrambled(tnn.Module):
    def __init__(self):
        super().__init__()
        # registration order is the REVERSE of call order
        self.head = tnn.Conv2d(8, 2, 1)
        self.mid = tnn.Conv2d(4, 8, 3, padding=1)
        self.stem = tnn.Conv2d(3, 4, 3, padding=1)

    def forward(self, x):
        return self.head(torch.relu(self.mid(torch.relu(self.stem(x)))))


class FScrambled(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(4, 3, 1, 1, dtype=jnp.float32)(x))
        x = nn.relu(Conv(8, 3, 1, 1, dtype=jnp.float32)(x))
        return Conv(2, 1, 1, 0, dtype=jnp.float32)(x)


NAME_MAP = {
    "Conv_0/Conv_0": "stem",
    "Conv_1/Conv_0": "mid",
    "Conv_2/Conv_0": "head",
}


def test_named_import_beats_order(rng):
    tm = TScrambled()
    tm.eval()
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    fm = FScrambled()
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nhwc)

    with pytest.raises(ValueError):  # order-zipping mis-pairs the convs
        import_torch_state(variables, tm.state_dict())

    loaded = import_torch_state_named(variables, tm.state_dict(), NAME_MAP)
    got = np.asarray(fm.apply(loaded, x_nhwc))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_named_import_unknown_torch_name(rng):
    fm = FScrambled()
    variables = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3), jnp.float32)
    )
    tm = TScrambled()
    with pytest.raises(ValueError, match="not in state_dict"):
        import_torch_state_named(
            variables, tm.state_dict(), {"Conv_0/Conv_0": "nope"}
        )
