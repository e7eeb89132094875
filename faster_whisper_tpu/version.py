"""Version information for faster-whisper-tpu.

Mirrors the reference's version module (reference: faster_whisper/version.py:3).
"""

__version__ = "0.1.0"
