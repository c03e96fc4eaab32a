"""ctypes binding for the C++ host-ingest accelerator (csrc/ingest.cpp).

Provides fused multithreaded implementations of the data layer's host hot
paths: the NaN + min/max scan and the normalise + NCHW->NHWC pack.  The
shared library is built by ``make -C csrc`` and lazily (best-effort) at
first import when a compiler is available; all callers fall back to numpy
when the library is absent or ``CAE_TPU_NATIVE=0``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libcaeingest.so")
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "ingest.cpp")

_lib = None


def _try_build():
    if not os.path.exists(_SRC):
        return False
    try:
        subprocess.check_call(
            [
                "g++",
                "-O3",
                "-march=native",
                "-std=c++17",
                "-fPIC",
                "-pthread",
                "-shared",
                "-o",
                _LIB_PATH,
                _SRC,
            ],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if os.environ.get("CAE_TPU_NATIVE", "1") == "0":
        return None
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.cae_scan_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.cae_normalize_pack_nchw_to_nhwc.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def scan_f32(arr: np.ndarray):
    """(min, max, nan_count) over a float32 array; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    mn = ctypes.c_float()
    mx = ctypes.c_float()
    nans = ctypes.c_int64()
    lib.cae_scan_f32(
        _fptr(arr),
        ctypes.c_int64(arr.size),
        ctypes.byref(mn),
        ctypes.byref(mx),
        ctypes.byref(nans),
    )
    return float(mn.value), float(mx.value), int(nans.value)


def normalize_pack(src: np.ndarray, dst: np.ndarray, lo: float, hi: float, c_off: int):
    """Normalise an NCHW var into the NHWC dst at channel offset c_off.

    Returns False when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return False
    src = np.ascontiguousarray(src, dtype=np.float32)
    n, c, h, w = src.shape
    c_total = dst.shape[3]
    rng = hi - lo
    inv = 0.0 if rng == 0 else 1.0 / rng
    lib.cae_normalize_pack_nchw_to_nhwc(
        _fptr(src),
        _fptr(dst),
        ctypes.c_int64(n),
        ctypes.c_int64(c),
        ctypes.c_int64(h),
        ctypes.c_int64(w),
        ctypes.c_float(lo if inv != 0 else 0.0),
        ctypes.c_float(inv),
        ctypes.c_int64(c_off),
        ctypes.c_int64(c_total),
    )
    return True
