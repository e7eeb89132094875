"""ctypes loader for the native libav media decoder (faster_whisper_tpu/native/media_decoder.cpp).

Links against the system FFmpeg C libraries (libavformat/libavcodec/
libswresample) — the same decode stack the reference reaches through the
PyAV wheel (reference: faster_whisper/audio.py:1-7) — so MP3/M4A/OGG/Opus
and every other FFmpeg-supported container decode without any Python
dependency.  Built on first use with the system g++ and cached next to the
package; returns None when the toolchain or the FFmpeg libraries are
missing so callers can fall back.
"""

import ctypes
import os
import shutil
import subprocess
import threading

from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _so_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "libfwt_media.so")


def _source_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "native", "media_decoder.cpp"
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
                    [
                        gxx,
                        "-O3",
                        "-shared",
                        "-fPIC",
                        "-o",
                        so + ".tmp",
                        src,
                        "-lavformat",
                        "-lavcodec",
                        "-lavutil",
                        "-lswresample",
                    ],
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

        lib.fwt_media_decode.restype = ctypes.c_int
        lib.fwt_media_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fwt_media_free.argtypes = [ctypes.POINTER(ctypes.c_int16)]
        _lib = lib
        return _lib


def media_native_available() -> bool:
    return _load() is not None


def decode_media_native(
    data: bytes, sampling_rate: int, stereo: bool
) -> Optional[np.ndarray]:
    """Decode any FFmpeg-supported media buffer to float32 PCM.

    Returns interleaved float32 in [-1, 1) of shape (frames,) for mono or
    (frames*2,) interleaved L/R for stereo, or None when the native backend
    is unavailable or the buffer cannot be decoded.
    """
    lib = _load()
    if lib is None:
        return None

    channels = 2 if stereo else 1
    samples = ctypes.POINTER(ctypes.c_int16)()
    n = ctypes.c_int64()

    rc = lib.fwt_media_decode(
        data,
        len(data),
        int(sampling_rate),
        channels,
        ctypes.byref(samples),
        ctypes.byref(n),
    )
    if rc != 0:
        return None
    try:
        count = n.value * channels
        arr = np.ctypeslib.as_array(samples, shape=(count,)).astype(np.float32)
    finally:
        lib.fwt_media_free(samples)

    return arr / 32768.0
