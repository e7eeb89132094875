"""ctypes loader for the native C++ FLAC decoder (faster_whisper_tpu/native/flac_decoder.cpp).

The shared library is built on first use with the system g++ (no
pybind11/cffi dependency — plain C ABI) and cached next to the package.
Falls back silently to the pure-Python decoder when no toolchain is
available.
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
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "libfwt_flac.so")


def _source_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "native", "flac_decoder.cpp"
    )


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so = _so_path()
        if not os.path.exists(so):
            src = _source_path()
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

        lib.fwt_flac_decode.restype = ctypes.c_int
        lib.fwt_flac_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.fwt_flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def decode_flac_native(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """Decode with the C++ library.  Returns (float32 (n, channels), rate)
    or None when the native path is unavailable/failed (callers fall back
    to the pure-Python decoder)."""
    lib = _load()
    if lib is None:
        return None

    samples = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    bps = ctypes.c_int32()

    rc = lib.fwt_flac_decode(
        data,
        len(data),
        ctypes.byref(samples),
        ctypes.byref(n),
        ctypes.byref(channels),
        ctypes.byref(rate),
        ctypes.byref(bps),
    )
    if rc != 0:
        return None
    try:
        count = n.value * channels.value
        arr = np.ctypeslib.as_array(samples, shape=(count,)).astype(np.float32)
    finally:
        lib.fwt_flac_free(samples)

    arr = arr.reshape(n.value, channels.value)
    scale = float(1 << (bps.value - 1))
    return arr / scale, int(rate.value)
