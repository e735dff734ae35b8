"""ctypes binding to the native host library (cpp/libxgnnhost.so).

The C++/OMP host gather is the native analog of the reference's
``CPUExtract`` (cpu_extraction.cc).  Falls back to numpy when the library
isn't built.  Build with ``make -C cpp``; auto-built on first use when a
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cpp")
_SO_PATH = os.path.join(_CPP_DIR, "libxgnnhost.so")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.isfile(_SO_PATH) and os.path.isdir(_CPP_DIR):
            try:
                subprocess.run(
                    ["make", "-C", _CPP_DIR, "libxgnnhost.so"],
                    capture_output=True, timeout=120, check=True,
                )
            except Exception:
                _LIB = False
                return _LIB
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.xgnn_gather_rows_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.xgnn_gather_rows_u16.argtypes = lib.xgnn_gather_rows_f32.argtypes
            lib.xgnn_accumulate_freq.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.xgnn_num_threads.restype = ctypes.c_int
            _LIB = lib
        except OSError:
            _LIB = False
        return _LIB


def available() -> bool:
    return bool(_load())


_CONVERT_PATH = os.path.join(_CPP_DIR, "xgnn-convert")


def convert_path() -> str | None:
    """Path to the ``xgnn-convert`` CLI (the reference ``utility/data-process``
    toolkit analog), auto-built on first use like ``libxgnnhost.so``.
    Returns None when no compiler is available."""
    with _LOCK:
        if not os.path.isfile(_CONVERT_PATH) and os.path.isdir(_CPP_DIR):
            try:
                subprocess.run(
                    ["make", "-C", _CPP_DIR, "xgnn-convert"],
                    capture_output=True, timeout=120, check=True,
                )
            except Exception:
                return None
        return _CONVERT_PATH if os.path.isfile(_CONVERT_PATH) else None


def gather_rows(src: np.ndarray, ids: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """out[i] = src[ids[i]]; ids<0 → zero row.  OMP-parallel when built."""
    lib = _load()
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    if out is None:
        out = np.empty((len(ids), src.shape[1]), src.dtype)
    if lib and src.dtype == np.float32:
        lib.xgnn_gather_rows_f32(
            src.ctypes.data, src.shape[1], ids.ctypes.data, len(ids),
            out.ctypes.data,
        )
    elif lib and src.dtype.itemsize == 2:
        lib.xgnn_gather_rows_u16(
            src.ctypes.data, src.shape[1], ids.ctypes.data, len(ids),
            out.ctypes.data,
        )
    else:  # numpy fallback
        safe = np.maximum(ids, 0)
        np.take(src, safe, axis=0, out=out)
        out[ids < 0] = 0
    return out
