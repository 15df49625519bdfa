"""ctypes bindings for the native C++ IO runtime (native/octseg_io.cc).

Provides the host data plane that the reference's per-image Python reads
(``FourierNet/trainTestModels.py:13-59``) cannot: a zero-dependency
MetaImage volume reader and a threaded prefetch pool that overlaps disk IO
+ zlib decompress with training. Builds the shared library on first use
(g++ is in the image); everything degrades gracefully to the pure-Python
loaders (``training.retouch``) when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DTYPES = (np.uint8, np.int8, np.uint16, np.int16, np.int32, np.uint32,
           np.float32, np.float64)

_lib = None
_lib_lock = threading.Lock()
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "octseg_io.cc",
)


def _build_lib() -> str | None:
    out = os.path.join(os.path.dirname(_SRC), "liboctseg_io.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-o", out, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        path = _build_lib()
        if path is None:
            _lib = False
            return None
        lib = ctypes.CDLL(path)
        lib.octseg_mhd_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.octseg_mhd_read.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long,
        ]
        lib.octseg_prefetch_create.restype = ctypes.c_void_p
        lib.octseg_prefetch_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.octseg_prefetch_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.octseg_prefetch_destroy.argtypes = [ctypes.c_void_p]
        lib.octseg_zscore.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        _lib = lib
        return lib


def mhd_info(path: str):
    """-> (dims (X, Y, Z), numpy dtype, compressed flag)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    dims = (ctypes.c_long * 3)()
    code = ctypes.c_int()
    comp = ctypes.c_int()
    if lib.octseg_mhd_info(path.encode(), dims, ctypes.byref(code),
                           ctypes.byref(comp)) != 0:
        raise IOError(f"cannot parse MetaImage header: {path}")
    return tuple(dims), np.dtype(_DTYPES[code.value]), bool(comp.value)


def load_mhd_volume_native(path: str) -> np.ndarray:
    """MetaImage volume -> (Z, Y, X) array, matching training.retouch."""
    lib = get_lib()
    dims, dtype, _ = mhd_info(path)
    z = dims[2] if dims[2] else 1
    out = np.empty((z, dims[1], dims[0]), dtype)
    if lib.octseg_mhd_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                           out.nbytes) != 0:
        raise IOError(f"cannot read MetaImage payload: {path}")
    return out


class PrefetchReader:
    """Iterate volumes from ``paths`` in order, read + decompressed by a
    native thread pool ahead of the consumer."""

    def __init__(self, paths, n_threads: int = 4, queue_cap: int = 4):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native IO library unavailable")
        self._paths = list(paths)
        arr = (ctypes.c_char_p * len(self._paths))(
            *[p.encode() for p in self._paths]
        )
        self._keepalive = arr
        self._handle = self._lib.octseg_prefetch_create(
            arr, len(self._paths), n_threads, queue_cap
        )
        self._cap = 0
        for p in self._paths:
            dims, dtype, _ = mhd_info(p)
            z = dims[2] if dims[2] else 1
            self._cap = max(self._cap, z * dims[1] * dims[0] * dtype.itemsize)
        self._buf = np.empty(max(self._cap, 1), np.uint8)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._handle is None:
            raise StopIteration
        nbytes = ctypes.c_long()
        dims = (ctypes.c_long * 3)()
        code = ctypes.c_int()
        index = ctypes.c_int()
        rc = self._lib.octseg_prefetch_next(
            self._handle, self._buf.ctypes.data_as(ctypes.c_void_p),
            self._buf.nbytes, ctypes.byref(nbytes), dims,
            ctypes.byref(code), ctypes.byref(index),
        )
        if rc == 0:
            self.close()
            raise StopIteration
        if rc != 1:
            self.close()
            raise IOError("native prefetch read failed")
        dtype = np.dtype(_DTYPES[code.value])
        z = dims[2] if dims[2] else 1
        vol = np.frombuffer(
            self._buf[: nbytes.value].tobytes(), dtype
        ).reshape(z, dims[1], dims[0])
        return vol

    def close(self):
        if self._handle is not None:
            self._lib.octseg_prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


def zscore_native(img: np.ndarray) -> np.ndarray:
    """In-place per-image z-score (float32), reference semantics
    (trainTestModels.py:17)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    assert img.dtype == np.float32 and img.flags["C_CONTIGUOUS"]
    lib.octseg_zscore(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), img.size
    )
    return img
