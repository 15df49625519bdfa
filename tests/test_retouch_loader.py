"""RETOUCH MetaImage loader: synthetic .mhd/.raw round trips (plain,
compressed, and LOCAL-embedded payloads)."""

import os

import numpy as np
import pytest

from retinal_oct_image_segmentation_via_deep_learning_tpu.training.retouch import (
    RETOUCH_NUM_CLASSES,
    iter_cases,
    load_case,
    load_mhd_volume,
    parse_mhd,
    write_mhd_volume,
)


def _case(tmp_path, name="TRAIN001", compressed=False, with_ref=True):
    rng = np.random.default_rng(0)
    d = tmp_path / name
    d.mkdir()
    vol = rng.integers(0, 65535, (4, 32, 24)).astype(np.uint16)
    write_mhd_volume(str(d / "oct.mhd"), vol, spacing=(0.01, 0.004, 0.1),
                     compressed=compressed)
    ref = None
    if with_ref:
        ref = rng.integers(0, RETOUCH_NUM_CLASSES, (4, 32, 24)).astype(
            np.uint8
        )
        write_mhd_volume(str(d / "reference.mhd"), ref,
                         compressed=compressed)
    return d, vol, ref


@pytest.mark.parametrize("compressed", [False, True])
def test_roundtrip(tmp_path, compressed):
    d, vol, ref = _case(tmp_path, compressed=compressed)
    got, spacing = load_mhd_volume(str(d / "oct.mhd"))
    assert np.array_equal(got, vol)
    assert np.allclose(spacing, (0.01, 0.004, 0.1))
    case = load_case(str(d))
    assert case["images"].shape == vol.shape
    assert case["images"].dtype == np.float32
    assert case["images"].max() <= 1.0
    assert np.array_equal(case["labels"], ref)


def test_local_embedded_payload(tmp_path):
    vol = np.arange(2 * 8 * 6, dtype=np.uint8).reshape(2, 8, 6)
    path = tmp_path / "oct.mhd"
    with open(path, "wb") as f:
        f.write(b"ObjectType = Image\nNDims = 3\n")
        f.write(b"DimSize = 6 8 2\nElementType = MET_UCHAR\n")
        f.write(b"ElementDataFile = LOCAL\n")
        f.write(vol.tobytes())
    header = parse_mhd(str(path))
    assert header["_payload_offset"] is not None
    got, _ = load_mhd_volume(str(path))
    assert np.array_equal(got, vol)


def test_iter_cases_and_test_split(tmp_path):
    _case(tmp_path, "TRAIN002", with_ref=True)
    _case(tmp_path, "TEST001", with_ref=False)
    (tmp_path / "not_a_case").mkdir()
    cases = list(iter_cases(str(tmp_path)))
    assert [c["case"] for c in cases] == ["TEST001", "TRAIN002"]
    assert cases[0]["labels"] is None
    assert cases[1]["labels"] is not None
