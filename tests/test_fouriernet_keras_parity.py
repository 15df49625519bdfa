"""FourierNet numeric parity vs the reference Keras model.

Ground truth: the reference's ``cascaded`` builder
(``SOTAS/Layers_Segment/FourierNet/deepModels.py:59-89``) run directly on
CPU TensorFlow. Weights are copied Keras -> Flax by structural order (both
kernels are HWIO, so no transposition is needed) and the forward outputs
(per-FD linear maps + final softmax) must agree to 1e-4.

VERDICT.md round-1 missing item #5.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_loader import load_reference

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")

FEATURES = (4, 8, 16, 32, 64)
SIZE = 32
FD = 2


def _flax_conv_paths(fd_channel):
    """Flax param paths in the reference's Keras layer-creation order."""

    def block_paths(*prefix):
        return [prefix + (f"Conv_{j}", "Conv_0") for j in (0, 1)]

    paths = []
    for b in range(4):  # stage-1 encoder
        paths += block_paths("_Encoder_0", f"UNetBlock2_{b}")
    paths += block_paths("UNetBlock2_0")  # stage-1 bottleneck
    for d in range(fd_channel):  # one decoder per FD channel
        for b in range(4):
            paths += block_paths(f"_Decoder_{d}", f"UNetBlock2_{b}")
    for d in range(fd_channel):  # interO heads (named, created after)
        paths.append((f"Conv_{d}", "Conv_0"))
    for b in range(4):  # CasUNet encoder
        paths += block_paths("CasUNet_0", "_Encoder_0", f"UNetBlock2_{b}")
    paths += block_paths("CasUNet_0", "UNetBlock2_0")
    for b in range(4):
        paths += block_paths("CasUNet_0", "_Decoder_0", f"UNetBlock2_{b}")
    paths.append(("CasUNet_0", "Conv_0", "Conv_0"))  # finalO
    return paths


def test_fouriernet_matches_reference_keras():
    dm = load_reference(
        "SOTAS/Layers_Segment/FourierNet/deepModels.py", "ref_deepmodels"
    )
    tf.random.set_seed(0)
    kmodel = dm.cascaded(
        SIZE, SIZE, 1, 1, 2, list(FEATURES), dropoutRate=0.0,
        fd_channel=FD, lr=0.01,
    )
    # Keras anonymous Conv2D names carry global creation order (conv2d,
    # conv2d_1, ...); interO{i}/finalO are created after all decoders.
    anon = sorted(
        (l for l in kmodel.layers
         if l.__class__.__name__ == "Conv2D" and l.name.startswith("conv2d")),
        key=lambda l: int(l.name.split("_")[-1]) if l.name[6:] else -1,
    )
    named = [kmodel.get_layer(f"interO{i+1}") for i in range(FD)]
    named.append(kmodel.get_layer("finalO"))
    # creation order: 10 stage-1 convs, FD*8 decoder convs, then heads,
    # then CasUNet's 18 convs, finalO last.
    n_stage1 = 10 + FD * 8
    klayers = anon[:n_stage1] + named[:FD] + anon[n_stage1:] + [named[FD]]

    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.fouriernet import (
        build_fouriernet,
    )

    model = build_fouriernet(num_classes=2, fd_channel=FD, features=FEATURES,
                             dropout=0.0)
    x = np.random.default_rng(0).standard_normal(
        (2, SIZE, SIZE, 1)
    ).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    paths = _flax_conv_paths(FD)
    assert len(paths) == len(klayers)
    for path, kl in zip(paths, klayers):
        kernel, bias = kl.get_weights()
        node = params
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]]["kernel"].shape == kernel.shape, (
            path, node[path[-1]]["kernel"].shape, kernel.shape)
        node[path[-1]]["kernel"] = kernel
        node[path[-1]]["bias"] = bias

    fd_maps, final = model.apply(
        {"params": params}, jnp.asarray(x), train=False
    )
    kouts = kmodel.predict(x, verbose=0)
    kfd, kfinal = kouts[:FD], kouts[FD]
    for ours, ref in zip(fd_maps, kfd):
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(final), kfinal, atol=1e-4, rtol=1e-3)
