"""faster-whisper-tpu: TPU-native Whisper transcription.

Same import surface as the reference (reference: faster_whisper/__init__.py:1-14).
Submodules are loaded lazily so that importing the package does not pull in
JAX until model code is actually used.
"""

from faster_whisper_tpu.version import __version__

__all__ = [
    "available_models",
    "decode_audio",
    "WhisperModel",
    "BatchedInferencePipeline",
    "download_model",
    "format_timestamp",
    "__version__",
]

_LAZY = {
    "decode_audio": ("faster_whisper_tpu.audio", "decode_audio"),
    "WhisperModel": ("faster_whisper_tpu.transcribe", "WhisperModel"),
    "BatchedInferencePipeline": (
        "faster_whisper_tpu.transcribe",
        "BatchedInferencePipeline",
    ),
    "available_models": ("faster_whisper_tpu.utils", "available_models"),
    "download_model": ("faster_whisper_tpu.utils", "download_model"),
    "format_timestamp": ("faster_whisper_tpu.utils", "format_timestamp"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
