"""Parity for the remaining FFC-stack components: FFCSE block, spatial
transform wrapper; plus MGUNet is_deconv=False and SDNet backbone variants."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from reference_loader import load_reference, randomize_torch


def test_ffcse_block_parity(rng):
    ref = load_reference("SOTAS/Lesions_Segment/YNet_2022.py", "ref_ynet_se")
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.ffc import (
        FFCSEBlock,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
        import_torch_state,
    )

    channels, ratio_g = 64, 0.5
    tm = ref.FFCSE_block(channels, ratio_g)
    randomize_torch(tm)
    tm.eval()
    xl = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    xg = rng.standard_normal((2, 32, 8, 8)).astype(np.float32)
    with torch.no_grad():
        wl, wg = tm((torch.from_numpy(xl), torch.from_numpy(xg)))

    fm = FFCSEBlock(channels, ratio_g)
    args = (jnp.asarray(xl.transpose(0, 2, 3, 1)),
            jnp.asarray(xg.transpose(0, 2, 3, 1)))
    variables = fm.init(jax.random.PRNGKey(0), args)
    variables = import_torch_state(variables, tm.state_dict())
    gl, gg = fm.apply(variables, args)
    np.testing.assert_allclose(
        np.asarray(gl), wl.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gg), wg.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_spatial_transform_wrapper_parity(rng):
    """Identity-impl wrapper vs the reference torch wrapper at a fixed angle
    (reference YNet_2022.py:89-106). Note the reference 'rotate' is not a
    true rotation (transposed grid construction), so only exact parity — not
    round-trip identity — is a meaningful check."""
    import torch.nn as tnn

    ref = load_reference("SOTAS/Lesions_Segment/YNet_2022.py", "ref_ynet_w")
    from flax import linen as nn

    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.ffc import (
        LearnableSpatialTransformWrapper,
    )

    tm = ref.LearnableSpatialTransformWrapper(
        tnn.Identity(), angle_init_range=80, train_angle=False
    )
    angle = float(tm.angle)
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    class Identity(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x

    fm = LearnableSpatialTransformWrapper(Identity())
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), xj)
    variables = {"params": {"angle": jnp.asarray([angle])}}
    got = np.asarray(fm.apply(variables, xj))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mgunet_no_deconv_parity(rng):
    ref = load_reference("SOTAS/Layers_Segment/MGUNet_2021.py", "ref_mgunet2")
    from retinal_oct_image_segmentation_via_deep_learning_tpu import get_model
    from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
        import_torch_state,
    )

    tm = ref.MGUNet(in_channels=1, num_classes=5, feature_scale=8,
                    is_deconv=False)
    randomize_torch(tm)
    tm.eval()
    x = rng.standard_normal((1, 1, 160, 160)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    fm = get_model("mgunet", num_classes=5, feature_scale=8, is_deconv=False)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), xj)
    variables = import_torch_state(variables, tm.state_dict())
    got = np.asarray(fm.apply(variables, xj))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-4)


def test_sdnet_unet_variants(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.sdnet.unet import (
        AttU_Net4,
        U_Net,
    )

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
    for model in (U_Net(output_ch=3, channels=(4, 8, 16, 32, 64)),
                  AttU_Net4(output_ch=3, channels=(4, 8, 16, 32))):
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 32, 32, 3)


def test_sdnet_plain_unet_parity(rng):
    """Reference SD_Layer_Net U_Net (unet.py:8-75) — constructible, unlike
    its AttU_Net whose gate constructor is broken — vs our backbone."""
    import importlib
    import sys
    import types

    from reference_loader import REF

    pkg = types.ModuleType("sdref2")
    pkg.__path__ = [str(REF / "SOTAS/Layers_Segment/SD_Layer_Net")]
    sys.modules["sdref2"] = pkg
    ref_unet = importlib.import_module("sdref2.unet")

    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.sdnet.unet import (
        U_Net,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
        import_torch_state,
    )

    # reference constraints: Conv_1x1 hardcodes 64 input channels (unet.py:36)
    # and the decoder concat widths assume strict doubling -> only the default
    # [64,128,256,512,1024] ladder is actually runnable.
    chans = [64, 128, 256, 512, 1024]
    tm = ref_unet.U_Net(img_ch=1, output_ch=3, channels=chans)
    randomize_torch(tm)
    tm.eval()
    x = rng.standard_normal((1, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    fm = U_Net(output_ch=3, channels=tuple(chans))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), xj)
    variables = import_torch_state(variables, tm.state_dict())
    got = np.asarray(fm.apply(variables, xj))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-4)
