"""Shared helpers for the benchmark scripts.

Mirrors the reference's benchmark tooling layer (reference:
benchmark/utils.py, speed_benchmark.py, memory_benchmark.py,
wer_benchmark.py) adapted to TPU and to hermetic environments: when the
HF Hub is unreachable, a random-weight model with the production
architecture is used so machine-performance numbers remain meaningful.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_audio(duration_minutes: float = 13.0):
    """The benchmark audio: benchmark.m4a when decodable, else real speech
    (jfk.flac) tiled to the requested duration (reference pins a 13-minute
    file, benchmark/utils.py:12-15)."""
    import numpy as np

    import faster_whisper_tpu as fw

    candidates = [
        os.path.join(os.path.dirname(__file__), "benchmark.m4a"),
        "/root/reference/benchmark/benchmark.m4a",
        "/root/reference/tests/data/jfk.flac",
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                audio = fw.decode_audio(path, sampling_rate=16000)
                break
            except (RuntimeError, ValueError):
                continue
    else:
        raise FileNotFoundError("no benchmark audio available")

    target = int(duration_minutes * 60 * 16000)
    if len(audio) < target:
        reps = -(-target // len(audio))
        audio = np.tile(audio, reps)
    return audio[:target]


def build_benchmark_model(model_name: str, compute_type: str = "default"):
    """A WhisperModel for benchmarking: real checkpoint when available,
    random weights with the exact architecture otherwise."""
    from faster_whisper_tpu.transcribe import WhisperModel

    try:
        return WhisperModel(model_name, compute_type=compute_type)
    except Exception:
        from bench import build_model

        return build_model(model_name, compute_type)


def base_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="large-v3")
    parser.add_argument("--compute-type", default="default")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--minutes", type=float, default=13.0)
    return parser
