"""Per-pixel parity + shape smoke tests for the model zoo.

Parity ground truth comes from running the reference torch implementations
(SURVEY.md §6). Models whose reference cannot run as-is are shape-tested:
- RetiFluidNet: reference builds conv weights inside ``forward`` (random
  every call, ``RetiFluidNet_pytorch_2022.py:99-107``) -> no defined output.
- WATNet: reference import is broken (missing DWT package, ``:15``).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu import get_model
from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
    import_torch_state,
)
from reference_loader import load_reference, randomize_torch

pytestmark = pytest.mark.slow


def _run_parity(torch_model, flax_model, x_nchw, atol=1e-4,
                transposed=lambda n: "upconv" in n or "uppool" in n,
                torch_out_index=None):
    randomize_torch(torch_model)
    torch_model.eval()
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x_nchw))
    if torch_out_index is not None:
        ref = ref[torch_out_index]
    ref = ref.numpy()

    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    variables = flax_model.init(jax.random.PRNGKey(0), x_nhwc)
    variables = import_torch_state(
        variables, torch_model.state_dict(), transposed=transposed
    )
    got = flax_model.apply(variables, x_nhwc)
    if torch_out_index is not None:
        got = got[torch_out_index]
    got = np.asarray(got)
    want = ref.transpose(0, 2, 3, 1)
    # Scale-relative 1e-4 contract: residual-heavy nets grow activations to
    # O(1e6) under variance-preserving init; per-element rtol would then
    # measure fp accumulation order, not implementation fidelity.
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=atol)


def test_relaynet_parity(rng):
    ref = load_reference("SOTAS/Lesions_Segment/ReLayNet_2017.py", "ref_relay")
    tm = ref.ReLayNet(in_channels=1, num_classes=4, num_filters=16)
    fm = get_model("relaynet", num_classes=4, num_filters=16)
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    _run_parity(tm, fm, x)


def test_anogan_parity(rng):
    ref = load_reference("SOTAS/Lesions_Segment/AnoGAN_2019.py", "ref_anogan")
    tm = ref.AnoGAN(in_channels=1, num_classes=1)
    fm = get_model("anogan", num_classes=1)
    x = rng.random((2, 1, 32, 32)).astype(np.float32)

    randomize_torch(tm)
    tm.eval()
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), mode="train")

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nhwc)
    variables = import_torch_state(
        variables, tm.state_dict(),
        transposed=lambda n: "decoder" in n and "model" in n,
    )
    got = fm.apply(variables, x_nhwc)
    for key in ref_out:
        want = ref_out[key].numpy().transpose(0, 2, 3, 1)
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(got[key]) / scale, want / scale, atol=1e-4,
            err_msg=key,
        )


def test_mgunet_parity(rng):
    ref = load_reference("SOTAS/Layers_Segment/MGUNet_2021.py", "ref_mgunet")
    tm = ref.MGUNet(in_channels=1, num_classes=5, feature_scale=8)
    fm = get_model("mgunet", num_classes=5, feature_scale=8)
    x = rng.standard_normal((1, 1, 160, 160)).astype(np.float32)
    _run_parity(tm, fm, x, transposed=lambda n: ".up." in n or n.endswith(".up"))


def test_mgunet2_parity(rng):
    ref = load_reference("SOTAS/Layers_Segment/MGUNet_2021.py", "ref_mgunet")
    tm = ref.MGUNet_2(in_channels=1, num_classes=5, feature_scale=8)
    fm = get_model("mgunet_2", num_classes=5, feature_scale=8)
    x = rng.standard_normal((1, 1, 160, 160)).astype(np.float32)
    _run_parity(tm, fm, x, transposed=lambda n: ".up." in n or n.endswith(".up"))


@pytest.mark.parametrize("multi_head", [False, True])
def test_islam_parity(rng, multi_head):
    ref = load_reference("SOTAS/Layers_Segment/ISLAM_2024.py", "ref_islam")
    tm = ref.ISLAM(in_channels=1, num_classes=3, use_multi_head=multi_head)
    fm = get_model("islam", num_classes=3, use_multi_head=multi_head)
    x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
    _run_parity(tm, fm, x)


def test_islam_gaussian_shapes(rng):
    fm = get_model("islam", num_classes=3, use_multi_head=True,
                   gaussian_output=True)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)).astype(np.float32))
    variables = fm.init(jax.random.PRNGKey(0), x)
    mean, log_var = fm.apply(variables, x)
    assert mean.shape == (1, 64, 64, 3)
    assert log_var.shape == (1, 64, 64, 3)
    assert (np.asarray(log_var) >= 0).all()  # relu'd log-variance heads


def test_retifluidnet_shapes(rng):
    fm = get_model("retifluidnet", num_classes=4, base_channels=8)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)).astype(np.float32))
    variables = fm.init(jax.random.PRNGKey(0), x)
    out = fm.apply(variables, x)
    # 5 bicon maps (8ch each) + main softmax (C) + 4 aux softmax heads (C)
    assert out.shape == (1, 64, 64, 5 * 8 + 5 * 4)
    probs = np.asarray(out[..., 40:44])
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_watnet_shapes(rng):
    fm = get_model("watnet", num_classes=4)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)).astype(np.float32))
    variables = fm.init(jax.random.PRNGKey(0), x)
    out = fm.apply(variables, x)
    assert out.shape == (1, 64, 64, 4)


def test_haar_dwt_roundtrip(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.dwt import (
        haar_dwt2d,
        haar_idwt2d,
    )

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    ll, lh, hl, hh = haar_dwt2d(x)
    rec = haar_idwt2d(ll, lh, hl, hh)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)
    # orthonormal: energy preserved
    e_in = float(jnp.sum(x**2))
    e_out = float(sum(jnp.sum(b**2) for b in (ll, lh, hl, hh)))
    assert abs(e_in - e_out) / e_in < 1e-5
