"""Per-pixel parity: LightReSeg vs the reference (timm stubbed).

The reference's module *registration* order differs from call order (the ViT
bottleneck params are registered after the decoder, LightReSeg_2024.py:288),
so the order-based converter gets a reorder hook mapping registration ->
execution order.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu import get_model
from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
    import_torch_state,
)
from reference_loader import load_reference, randomize_torch, stub_timm

import pytest

pytestmark = pytest.mark.slow


def _reorder(units):
    """torch registration order -> flax call order."""

    def take(pred):
        sel = [u for u in units if pred(u["name"])]
        for u in sel:
            units.remove(u)
        return sel

    encoders = take(lambda n: n.startswith(("conv_encode", "conv_pool")))
    patch = take(lambda n: n.startswith("to_patch_embedding"))
    cls_tok = take(lambda n: n == ".cls_token")
    pos = take(lambda n: n == ".pos_embedding")
    transformer = take(lambda n: n.startswith("transformer"))
    bottleneck = take(lambda n: n.startswith("bottleneck"))

    decoders = []
    for i in (4, 3, 2, 1):
        blk = take(lambda n, i=i: n.startswith(f"conv_decode{i}"))
        # within AttentionModule: flax creates the CAM gammas before the
        # 1x1 gate conv ("conv3"); torch registers conv3 first.
        conv3 = [u for u in blk if ".conv3" in u["name"]]
        gammas = [u for u in blk if ".channel" in u["name"]]
        rest = [u for u in blk if u not in conv3 and u not in gammas]
        decoders.extend(rest + gammas + conv3)
    final = take(lambda n: n.startswith("final_layer"))
    assert not units, [u["name"] for u in units]
    return (
        encoders + patch + cls_tok + pos + transformer + bottleneck
        + decoders + final
    )


def test_lightreseg_parity(rng):
    stub_timm()
    ref = load_reference(
        "SOTAS/Layers_Segment/LightReSeg_2024.py", "ref_lightreseg"
    )
    tm = ref.LightReSeg(in_channels=1, num_classes=5)
    randomize_torch(tm)
    tm.eval()
    # reference hardcodes the token-grid height h=32 (=512/16); use a 512-wide
    # input scaled down in height? No: h is rows. Use 512x512 is heavy; patch
    # the Rearrange to the test grid instead.
    from einops.layers.torch import Rearrange

    tm.recover = torch.nn.Sequential(
        Rearrange("b (h w) (p1 p2 c) -> b c (h p1) (w p2)", p1=1, p2=1, h=4)
    )
    x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    fm = get_model("lightreseg", num_classes=5)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nhwc)
    variables = import_torch_state(
        variables,
        tm.state_dict(),
        transposed=lambda n: ".up" in n,
        reorder=_reorder,
    )
    got = np.asarray(fm.apply(variables, x_nhwc))
    want = want.transpose(0, 2, 3, 1)
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-4)
