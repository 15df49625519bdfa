"""Backbone numeric parity: ResNet-18 / Res2Net-50-v1b vs vendored torch.

VERDICT r1 item 5: the reference consumes *pretrained* torchvision ResNet-18
(``BioNet_2020.py:82``) and an external ``basics.res2net`` Res2Net-50
(``M2SNet_2021.py:18``, missing from the repo). torchvision is absent in this
environment, so minimal torch definitions of both architectures are vendored
here (same pattern as the FD golden re-implementation in
``test_sdnet_fouriernet.py``) and parity is checked on random weights via
``import_torch_state``. Pretrained weights remain env-blocked (documented in
docs/ROADMAP.md); these tests pin the architecture + layout-conversion
correctness so checkpoints drop in when available.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.models.res2net import (
    Res2Net50Features,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.models.resnet import (
    ResNetFeatures,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
    import_torch_state,
)
from reference_loader import randomize_torch

import pytest

pytestmark = pytest.mark.slow


# --------------------------------------------------------------------------
# Vendored torch ResNet-18 feature extractor (the torchvision children()[:-2]
# slice BioNet uses). Attribute order == call order, so the order-based
# importer zips directly.
# --------------------------------------------------------------------------


class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        idt = x if self.downsample is None else self.downsample(x)
        return torch.relu(h + idt)


class TResNet18Features(tnn.Module):
    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, n in enumerate((2, 2, 2, 2)):
            cout = 64 * 2**i
            blocks = []
            for j in range(n):
                blocks.append(TBasicBlock(cin, cout, 2 if (i > 0 and j == 0) else 1))
                cin = cout
            setattr(self, f"layer{i+1}", tnn.Sequential(*blocks))

    def forward(self, x):
        h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            h = getattr(self, f"layer{i+1}")(h)
        return h


def test_resnet18_features_parity(rng):
    tm = TResNet18Features()
    randomize_torch(tm)
    tm.eval()
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    fm = ResNetFeatures(stage_sizes=(2, 2, 2, 2), block="basic")
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nhwc)
    variables = import_torch_state(variables, tm.state_dict())
    got = np.asarray(fm.apply(variables, x_nhwc))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-4)


# --------------------------------------------------------------------------
# Vendored torch Res2Net-50 v1b (26w x 4s) feature pyramid — the reference's
# missing ``basics.res2net.res2net50_v1b_26w_4s``. Faithful registration
# (convs/bns as ModuleLists) so real checkpoints' state_dict layout matches;
# call order interleaves them, handled by the ``reorder`` hook below.
# --------------------------------------------------------------------------


class TBottle2neck(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False,
                 base_width=26, scale=4):
        super().__init__()
        width = int(planes * base_width / 64.0)
        self.scale = scale
        self.stype = "stage" if downsample else "normal"
        self.stride = stride
        self.conv1 = tnn.Conv2d(cin, width * scale, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width * scale)
        self.convs = tnn.ModuleList(
            [tnn.Conv2d(width, width, 3, stride, 1, bias=False)
             for _ in range(scale - 1)]
        )
        self.bns = tnn.ModuleList(
            [tnn.BatchNorm2d(width) for _ in range(scale - 1)]
        )
        self.conv3 = tnn.Conv2d(width * scale, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.pool = tnn.AvgPool2d(3, stride, 1)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.AvgPool2d(stride, stride, ceil_mode=True,
                              count_include_pad=False),
                tnn.Conv2d(cin, planes * 4, 1, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        spx = torch.split(out, out.shape[1] // self.scale, 1)
        outs = []
        sp = None
        for i in range(self.scale - 1):
            sp = spx[i] if (i == 0 or self.stype == "stage") else sp + spx[i]
            sp = torch.relu(self.bns[i](self.convs[i](sp)))
            outs.append(sp)
        if self.stype == "stage" and self.stride > 1:
            outs.append(self.pool(spx[-1]))
        else:
            outs.append(spx[-1])
        out = self.bn3(self.conv3(torch.cat(outs, 1)))
        idt = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + idt)


class TRes2Net50Features(tnn.Module):
    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv2d(in_ch, 32, 3, 2, 1, bias=False),
            tnn.BatchNorm2d(32), tnn.ReLU(inplace=True),
            tnn.Conv2d(32, 32, 3, 1, 1, bias=False),
            tnn.BatchNorm2d(32), tnn.ReLU(inplace=True),
            tnn.Conv2d(32, 64, 3, 1, 1, bias=False),
        )
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, n in enumerate((3, 4, 6, 3)):
            planes = 64 * 2**i
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                ds = j == 0 and (stride != 1 or cin != planes * 4)
                blocks.append(TBottle2neck(cin, planes, stride, ds))
                cin = planes * 4
            setattr(self, f"layer{i+1}", tnn.Sequential(*blocks))

    def forward(self, x):
        h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        feats = [h]
        for i in range(4):
            h = getattr(self, f"layer{i+1}")(h)
            feats.append(h)
        return feats


def interleave_convs_bns(units):
    """Reorder torch units: each run of ``.convs.*`` followed by ``.bns.*``
    (ModuleList registration order) is interleaved into call order."""
    out, i = [], 0
    while i < len(units):
        if ".convs." in units[i]["name"]:
            convs = []
            while i < len(units) and ".convs." in units[i]["name"]:
                convs.append(units[i])
                i += 1
            bns = []
            while i < len(units) and ".bns." in units[i]["name"]:
                bns.append(units[i])
                i += 1
            assert len(convs) == len(bns)
            for c, b in zip(convs, bns):
                out += [c, b]
        else:
            out.append(units[i])
            i += 1
    return out


def test_res2net50_features_parity(rng):
    tm = TRes2Net50Features()
    randomize_torch(tm)
    tm.eval()
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy().transpose(0, 2, 3, 1)
                for t in tm(torch.from_numpy(x))]

    fm = Res2Net50Features()
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fm.init(jax.random.PRNGKey(0), x_nhwc)
    variables = import_torch_state(
        variables, tm.state_dict(), reorder=interleave_convs_bns
    )
    got = fm.apply(variables, x_nhwc)
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(np.asarray(g) / scale, w / scale,
                                   atol=1e-4)
