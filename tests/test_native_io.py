"""Native C++ IO runtime vs the pure-Python loaders (bit-exact)."""

import numpy as np
import pytest

from retinal_oct_image_segmentation_via_deep_learning_tpu.training import (
    native_io,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.retouch import (
    load_mhd_volume,
    write_mhd_volume,
)

lib = native_io.get_lib()
pytestmark = pytest.mark.skipif(lib is None, reason="no C++ toolchain")


def _vol(tmp_path, name, shape=(3, 24, 16), dtype=np.uint16,
         compressed=False):
    rng = np.random.default_rng(hash(name) % 2**32)
    if np.issubdtype(dtype, np.integer):
        vol = rng.integers(0, np.iinfo(dtype).max, shape).astype(dtype)
    else:
        vol = rng.normal(0, 1, shape).astype(dtype)
    path = str(tmp_path / f"{name}.mhd")
    write_mhd_volume(path, vol, compressed=compressed)
    return path, vol


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
@pytest.mark.parametrize("compressed", [False, True])
def test_native_read_matches_python(tmp_path, dtype, compressed):
    path, vol = _vol(tmp_path, f"v_{np.dtype(dtype).name}_{compressed}",
                     dtype=dtype, compressed=compressed)
    dims, got_dtype, got_comp = native_io.mhd_info(path)
    assert dims == (16, 24, 3) and got_dtype == np.dtype(dtype)
    assert got_comp == compressed
    native = native_io.load_mhd_volume_native(path)
    ref, _ = load_mhd_volume(path)
    assert np.array_equal(native, ref)


def test_prefetch_reader_order_and_content(tmp_path):
    n = 7
    vols = []
    paths = []
    for i in range(n):
        path, vol = _vol(tmp_path, f"case{i}", shape=(2, 12, 8),
                         compressed=(i % 2 == 0))
        paths.append(path)
        vols.append(vol)
    got = list(native_io.PrefetchReader(paths, n_threads=3, queue_cap=2))
    assert len(got) == n
    for want, have in zip(vols, got):
        assert np.array_equal(want, have)


def test_zscore_native_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.normal(3.0, 2.0, (64, 48)).astype(np.float32)
    want = (img - img.mean()) / np.sqrt(img.var() + 1e-7)
    got = native_io.zscore_native(img.copy())
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
