"""ctypes loader for the native DTW backtrace (native/dtw.cpp).

Same build-on-first-use scheme as flac_native.py / vad_native.py:
compiled with the system g++ into a shared library next to the package,
silent fallback to the numpy anti-diagonal implementation
(models/engine.py::dtw_path) when no toolchain is available.  Output is
bit-identical to the numpy oracle (f64 accumulation, identical
tie-breaks) — pinned by tests/test_alignment.py.
"""

import ctypes
import os
import shutil
import subprocess
import threading

from typing import Optional, Tuple

import numpy as np

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _so_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "libfwt_dtw.so"
    )


def _source_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "native", "dtw.cpp"
    )


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so = _so_path()
        src = _source_path()
        if not os.path.exists(so) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(so)
        ):
            gxx = shutil.which("g++")
            if not os.path.exists(src) or gxx is None:
                _lib_failed = True
                return None
            try:
                subprocess.run(
                    [gxx, "-O3", "-shared", "-fPIC", "-o", so + ".tmp", src],
                    check=True,
                    capture_output=True,
                )
                os.replace(so + ".tmp", so)
            except (subprocess.CalledProcessError, OSError):
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _lib_failed = True
            return None

        lib.fwt_dtw.restype = ctypes.c_long
        lib.fwt_dtw.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
        _lib = lib
        return _lib


def dtw_native(
    cost: np.ndarray,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native DTW path over a (N, M) f64 cost matrix.  Returns None when
    the native library is unavailable (caller falls back to numpy)."""
    if ctypes.sizeof(ctypes.c_long) != 8:  # exotic ABI: keep it simple
        return None
    lib = _load()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    out_text = np.empty(n + m, dtype=np.int64)
    out_time = np.empty(n + m, dtype=np.int64)
    k = lib.fwt_dtw(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        m,
        out_text.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        out_time.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return out_text[:k].copy(), out_time[:k].copy()
