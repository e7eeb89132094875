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
        # max_new_tokens pinned (as in bench.py): free-running decodes on
        # random weights otherwise run to the 448 cap and the number is
        # hostage to noise; single temperature kills spurious
        # fallback-ladder rungs that random-logit compression ratios
        # trigger.  The per-window figure is the comparable metric — the
        # window count itself depends on random timestamp tokens.
        t0 = time.perf_counter()
        segs, _ = model.transcribe(
            audio,
            language="en",
            beam_size=5,
            max_new_tokens=128,
            temperature=[0.0],
        )
        segs = list(segs)
        windows = len({s.seek for s in segs})
        return time.perf_counter() - t0, len(segs), windows

    warm, n, w = run()
    print(f"# warmup: {warm:.2f}s, {n} segments, {w} windows", file=sys.stderr)
    results = [run() for _ in range(3)]
    best, _, w = min(results)
    print(
        f"sequential 95s audio ({model_name} {compute_type}, beam=5, "
        f"128 tok/window): {best:.2f}s over {w} windows "
        f"({best / max(w, 1):.2f} s/window)"
    )


if __name__ == "__main__":
    main()
