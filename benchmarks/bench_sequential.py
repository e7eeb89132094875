"""Sequential-path wall-clock: 95 s of speech through WhisperModel.transcribe.

The reference's sequential mode decodes window-by-window with the full
temperature fallback ladder and condition_on_previous_text (reference:
faster_whisper/transcribe.py:1103-1389); this measures our equivalent on
the real chip with large-v3 int8 random weights (PARITY.md tracks the
number: 9.1 s warm at round 1).

Usage: python benchmarks/bench_sequential.py  [BENCH_MODEL=large-v3]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()  # may re-exec before jax boots

import numpy as np


def main():
    import faster_whisper_tpu as fw
    from faster_whisper_tpu.models.config import CONFIGS
    from faster_whisper_tpu.models.load import random_params_device
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.transcribe import WhisperModel

    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    compute_type = os.environ.get("BENCH_COMPUTE", "int8")
    config = CONFIGS[model_name]
    tok = build_synthetic_tokenizer(base_vocab=50257)
    params = random_params_device(config, seed=0, dtype="bfloat16")
    model = WhisperModel.from_parts(
        params, config, tok, {"feature_size": config.n_mels},
        compute_type=compute_type,
    )

    jfk = fw.decode_audio(
        "/root/reference/tests/data/jfk.flac", sampling_rate=16000
    )
    audio = np.tile(jfk, 9)[: 95 * 16000]  # 95 s

    def run():
        t0 = time.perf_counter()
        segs, _ = model.transcribe(audio, language="en", beam_size=5)
        n = sum(1 for _ in segs)
        return time.perf_counter() - t0, n

    warm, n = run()
    print(f"# warmup: {warm:.2f}s, {n} segments", file=sys.stderr)
    times = [run()[0] for _ in range(3)]
    print(
        f"sequential 95s audio ({model_name} {compute_type}, beam=5): "
        f"{min(times):.2f}s"
    )


if __name__ == "__main__":
    main()
