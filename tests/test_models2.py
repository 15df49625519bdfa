"""Tests for BioNet, MSNet/M2SNet, Masood.

Reference import constraints (SURVEY.md §2.3):
- BioNet imports torchvision (absent) -> shape/structure tests.
- M2SNet imports the missing ``basics.res2net`` -> shape/structure tests.
- Masood imports skimage (absent) -> stub skimage so the torch module loads;
  parity-test the runnable sub-branches (Gabor/Haar/CNN); golden-test the
  on-device GLCM against an independent pure-NumPy implementation of the
  documented skimage formulas.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu import get_model
from reference_loader import load_reference, randomize_torch

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------------------
# BioNet / MSNet shape tests
# ---------------------------------------------------------------------------


def test_bionet_shapes(rng):
    fm = get_model("bionet", num_classes=2, gms_channels=7)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)).astype(np.float32))
    variables = fm.init(jax.random.PRNGKey(0), x)
    seg, gms, bio = fm.apply(variables, x)
    assert seg.shape == (1, 64, 64, 2)
    assert gms.shape == (1, 64, 64, 7)
    assert bio.shape == (1, 1)


def test_msnet_shapes(rng):
    fm = get_model("msnet", num_classes=9)
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 1)).astype(np.float32))
    variables = fm.init(jax.random.PRNGKey(0), x)
    out = fm.apply(variables, x)
    assert out.shape == (1, 96, 96, 9)


def test_m2snet_shapes(rng):
    fm = get_model("m2snet", num_classes=9)
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 1)).astype(np.float32))
    variables = fm.init(jax.random.PRNGKey(0), x)
    out = fm.apply(variables, x)
    assert out.shape == (1, 96, 96, 9)


def test_lossnet_perceptual_loss():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.msnet import (
        LossNet,
    )

    ln = LossNet()
    a = jnp.ones((1, 64, 64, 1)) * 0.3
    b = jnp.ones((1, 64, 64, 1)) * 0.7
    variables = ln.init(jax.random.PRNGKey(0), a, b)
    same = ln.apply(variables, a, a)
    diff = ln.apply(variables, a, b)
    assert float(same) == pytest.approx(0.0, abs=1e-6)
    assert float(diff) > 0.0


# ---------------------------------------------------------------------------
# Masood: stub skimage, parity-test runnable branches
# ---------------------------------------------------------------------------


def _stub_skimage():
    if "skimage" in sys.modules:
        return
    feature = types.ModuleType("skimage.feature")
    feature.graycomatrix = lambda *a, **k: None
    feature.graycoprops = lambda *a, **k: None
    skimage = types.ModuleType("skimage")
    skimage.feature = feature
    scipy_stub = sys.modules.get("scipy")
    sys.modules["skimage"] = skimage
    sys.modules["skimage.feature"] = feature
    del scipy_stub


@pytest.fixture(scope="module")
def ref_masood():
    _stub_skimage()
    return load_reference("SOTAS/Layers_Segment/Masood_2024.py", "ref_masood")


def test_gabor_branch_parity(ref_masood, rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.gabor import (
        conv_same_torch,
        gabor_bank,
    )

    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref_masood.GaborFeatures()(torch.from_numpy(x)).numpy()
    got = np.asarray(
        conv_same_torch(jnp.asarray(x.transpose(0, 2, 3, 1)), gabor_bank())
    )
    np.testing.assert_allclose(
        got, want.transpose(0, 2, 3, 1), atol=1e-3, rtol=1e-4
    )


def test_haar_branch_parity(ref_masood, rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.gabor import (
        conv_same_torch,
        haar_bank,
    )

    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref_masood.HaarFeatures()(torch.from_numpy(x)).numpy()
    got = np.asarray(
        conv_same_torch(jnp.asarray(x.transpose(0, 2, 3, 1)), haar_bank())
    )
    np.testing.assert_allclose(
        got, want.transpose(0, 2, 3, 1), atol=1e-4
    )


def test_cnn_branch_parity(ref_masood, rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.masood import (
        CNNBranch,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
        import_torch_state,
    )

    tm = ref_masood.CNNBranch(in_channels=1)
    randomize_torch(tm)
    tm.eval()
    x = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    fm = CNNBranch()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), xj)

    # torch registers conv1..5 then bn1..5; flax interleaves conv/bn.
    def reorder(units):
        convs = [u for u in units if u["name"].startswith("conv")]
        bns = [u for u in units if u["name"].startswith("bn")]
        out = []
        for c, b in zip(convs, bns):
            out.extend([c, b])
        return out

    variables = import_torch_state(variables, tm.state_dict(), reorder=reorder)
    got = np.asarray(fm.apply(variables, xj))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-4)


# ---------------------------------------------------------------------------
# GLCM: golden test vs independent NumPy implementation of skimage formulas
# ---------------------------------------------------------------------------


def _numpy_glcm(img_u8, row_off, col_off):
    H, W = img_u8.shape
    glcm = np.zeros((256, 256), np.float64)
    for r in range(H):
        for c in range(W):
            r2, c2 = r + row_off, c + col_off
            if 0 <= r2 < H and 0 <= c2 < W:
                glcm[img_u8[r, c], img_u8[r2, c2]] += 1
    glcm = glcm + glcm.T
    return glcm / max(glcm.sum(), 1.0)


def test_glcm_matches_numpy(rng):
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops import glcm as G

    img = rng.random((24, 24)).astype(np.float32)
    got = np.asarray(G.glcm_feature_vector(jnp.asarray(img[None])))[0]

    # independent numpy reference
    lo, hi = img.min(), img.max()
    q = ((img - lo) / (hi - lo + 1e-8) * 255).astype(np.uint8)
    feats = []
    for row_off, col_off in G.reference_offsets():
        m = _numpy_glcm(q, row_off, col_off)
        ii, jj = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
        d = ii - jj
        contrast = (m * d**2).sum()
        dissim = (m * abs(d)).sum()
        homog = (m / (1 + d**2)).sum()
        asm = (m**2).sum()
        energy = np.sqrt(asm)
        mu_i, mu_j = (ii * m).sum(), (jj * m).sum()
        vi = (((ii - mu_i) ** 2) * m).sum()
        vj = (((jj - mu_j) ** 2) * m).sum()
        corr = (
            1.0
            if np.sqrt(vi * vj) < 1e-15
            else (m * (ii - mu_i) * (jj - mu_j)).sum() / np.sqrt(vi * vj)
        )
        g = m + 1e-8
        ent = -(g * np.log2(g)).sum()
        feats.extend([contrast, dissim, homog, energy, corr, asm, ent, vi])
    want = np.array(feats, np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_masood_full_shapes(rng):
    fm = get_model("masood", num_classes=1)
    x = jnp.asarray(rng.random((1, 48, 48, 1)).astype(np.float32))
    variables = fm.init(jax.random.PRNGKey(0), x)
    out = fm.apply(variables, x)
    assert out.shape == (1, 48, 48, 1)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()
