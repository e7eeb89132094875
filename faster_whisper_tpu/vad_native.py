"""ctypes loader for the native VAD hysteresis loop (native/vad_sm.cpp).

Same build-on-first-use scheme as flac_native.py: compiled with the
system g++ into a shared library next to the package, silent fallback to
the pure-Python loop when no toolchain is available.
"""

import ctypes
import os
import shutil
import subprocess
import threading

from typing import List, Optional

import numpy as np

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _so_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "libfwt_vad_sm.so"
    )


def _source_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "native", "vad_sm.cpp"
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

        lib.fwt_vad_hysteresis.restype = ctypes.c_long
        lib.fwt_vad_hysteresis.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_long,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_long,
        ]
        _lib = lib
        return _lib


def hysteresis_native(
    probs: np.ndarray,
    window: int,
    threshold: float,
    neg_threshold: float,
    min_speech_samples: float,
    max_speech_samples: float,
    min_silence_samples: float,
    min_silence_at_max_speech: float,
    n_samples: int,
) -> Optional[List[dict]]:
    """Run the hysteresis loop natively.  Returns None when the native
    library is unavailable (caller falls back to the Python loop)."""
    lib = _load()
    if lib is None:
        return None
    probs = np.ascontiguousarray(probs, dtype=np.float32)
    n = len(probs)
    max_out = n + 1
    out = np.empty(2 * max_out, dtype=np.int64)
    if ctypes.sizeof(ctypes.c_long) != 8:  # exotic ABI: keep it simple
        return None
    count = lib.fwt_vad_hysteresis(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        float(threshold),
        float(neg_threshold),
        int(window),
        float(min_speech_samples),
        float(max_speech_samples),
        float(min_silence_samples),
        float(min_silence_at_max_speech),
        int(n_samples),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        max_out,
    )
    return [
        {"start": int(out[2 * i]), "end": int(out[2 * i + 1])}
        for i in range(count)
    ]
