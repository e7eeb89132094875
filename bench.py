#!/usr/bin/env python
"""Headline benchmark: 13-minute batched transcription wall-clock on TPU.

Mirrors the reference's speed benchmark (reference: benchmark/
speed_benchmark.py:21-27 — timeit of a full transcribe of the 13-minute
benchmark.m4a, min of repeats; our baseline row is large-v2 beam=5
batch_size=8 at 16-17 s on an RTX 3070 Ti, BASELINE.md).

This environment has no network egress, so production weights cannot be
downloaded: the model is a random-initialized **large-v3** (exact
architecture: 1280x20x32 encoder/decoder, 128 mels, 51866 vocab via a
synthetic tokenizer with the production vocabulary size) and the audio is
real speech (jfk.flac tiled to 13 minutes) so the real Silero VAD produces
realistic chunking.  Decoded token count per chunk is pinned with
max_new_tokens so the per-chunk work matches a realistic transcription
(~128 tokens / 30 s chunk) instead of free-running to the 448 cap on random
logits.  Everything else — mel frontend, VAD, beam search (beam 5), the
batched pipeline — is the production code path.

Prints exactly one JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
where vs_baseline = 16.0 / seconds (>1.0 means faster than the reference's
best published batched GPU number).
"""

import json
import os
import sys
import time

# Mosaic (Pallas) kernel compilation through the axon remote-compile relay
# reads TPU_ACCELERATOR_TYPE from the env captured at process start, so it
# must be set before the interpreter boots jax: re-exec once if missing.
from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()  # may re-exec before jax boots

import numpy as np


def load_audio_13min() -> np.ndarray:
    import faster_whisper_tpu as fw

    jfk = "/root/reference/tests/data/jfk.flac"
    if os.path.exists(jfk):
        base = fw.decode_audio(jfk, sampling_rate=16000)
    else:
        # fallback: synthetic speech-band noise bursts
        rng = np.random.default_rng(0)
        t = np.arange(16000 * 11) / 16000
        base = (
            0.3 * np.sin(2 * np.pi * 150 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
            + 0.05 * rng.standard_normal(len(t))
        ).astype(np.float32)
    target = 13 * 60 * 16000
    reps = int(np.ceil(target / len(base)))
    return np.tile(base, reps)[:target]


def build_model(model_name: str = "large-v3", compute_type: str = "default"):
    from faster_whisper_tpu.models.config import CONFIGS
    from faster_whisper_tpu.models.load import random_params_device
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.transcribe import WhisperModel

    config = CONFIGS[model_name]
    tok = build_synthetic_tokenizer(base_vocab=50257)
    vocab = tok.get_vocab_size()
    assert vocab == config.n_vocab, (vocab, config.n_vocab)
    params = random_params_device(config, seed=0, dtype="bfloat16")
    return WhisperModel.from_parts(
        params, config, tok, {"feature_size": config.n_mels},
        compute_type=compute_type,
    )


def run_once(
    model, audio, batch_size=8, beam_size=5, max_new_tokens=128,
) -> float:
    from faster_whisper_tpu.transcribe import BatchedInferencePipeline

    pipeline = BatchedInferencePipeline(model)
    start = time.perf_counter()
    segments, info = pipeline.transcribe(
        audio,
        language="en",
        beam_size=beam_size,
        batch_size=batch_size,
        max_new_tokens=max_new_tokens,
        temperature=[0.0],
    )
    n_segments = sum(1 for _ in segments)
    elapsed = time.perf_counter() - start
    print(
        f"# run: {elapsed:.2f}s, {n_segments} segments, "
        f"duration_after_vad={info.duration_after_vad:.0f}s",
        file=sys.stderr,
    )
    return elapsed


def extra_rows(model, batch_size, beam_size):
    """Honesty rows beyond the headline (recorded in the bench tail):

    1. speech-shaped synthetic audio — harmonic bursts with pauses, so
       the Silero VAD's segmentation is non-trivial instead of one
       wall-to-wall chunk per 30 s (the jfk tiling is continuous speech);
    2. the sequential path with the FULL temperature fallback ladder
       enabled, so the ladder's compile/step cost is measured when the
       compression-ratio/logprob checks fire on random-weight text;
    3. fresh-process cold start with a warm persistent cache: time from
       process exec to the first transcribed segment (the deployment
       number precompile exists to bound).
    """
    import subprocess

    from faster_whisper_tpu.precompile import synthetic_speech

    rows = {}

    speech = synthetic_speech(13 * 60.0, seed=7)
    t = min(
        run_once(model, speech, batch_size, beam_size, max_new_tokens=160)
        for _ in range(2)
    )
    rows["13min speech-shaped batched, 160 tok/chunk"] = round(t, 2)

    ladder = None
    try:
        audio = load_audio_13min()[: 95 * 16000]
        t0 = time.perf_counter()
        segs, _ = model.transcribe(
            audio,
            language="en",
            beam_size=beam_size,
            max_new_tokens=128,
            # the reference's default ladder: rungs fire whenever the
            # CR/logprob checks reject the T=0 decode
            temperature=[0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
        )
        n = sum(1 for _ in segs)
        ladder = round(time.perf_counter() - t0, 2)
        rows[f"sequential 95s, full fallback ladder ({n} segs)"] = ladder
    except Exception as exc:  # noqa: BLE001 — tail rows must not kill bench
        rows["sequential ladder row failed"] = repr(exc)

    if os.environ.get("BENCH_COLDSTART", "1") != "0":
        code = (
            "import time; t0=time.time();"
            "from faster_whisper_tpu.utils import ensure_tpu_accelerator_type;"
            "ensure_tpu_accelerator_type();"
            "import bench, os;"
            "m = bench.build_model(os.environ.get('BENCH_MODEL', 'large-v3'),"
            " os.environ.get('BENCH_COMPUTE', 'int8'));"
            "a = bench.load_audio_13min()[:16000*30];"
            "from faster_whisper_tpu.transcribe import BatchedInferencePipeline;"
            "segs,_ = BatchedInferencePipeline(m).transcribe("
            "a, language='en', beam_size=5, batch_size=8,"
            " max_new_tokens=128, temperature=[0.0]);"
            "next(iter(segs), None);"
            "print('FIRST_SEGMENT_S=%.1f' % (time.time()-t0))"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True, timeout=1800,
            )
            for line in proc.stdout.splitlines():
                if line.startswith("FIRST_SEGMENT_S="):
                    rows["cold start to first segment (warm cache)"] = float(
                        line.split("=")[1]
                    )
        except Exception as exc:  # noqa: BLE001
            rows["cold start row failed"] = repr(exc)

    print("# extra_rows: " + json.dumps(rows), file=sys.stderr)


def main():
    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    batch_size = int(os.environ.get("BENCH_BATCH", "8"))
    beam_size = int(os.environ.get("BENCH_BEAM", "5"))
    # min-of-3: the tunneled chip shows +-1.5s run-to-run variance
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    # int8 weights by default: the reference's best published batched
    # number (the 16 s baseline below) is its int8 batch=8 row, so this is
    # the best-vs-best comparison; BENCH_COMPUTE=default for bf16.
    compute_type = os.environ.get("BENCH_COMPUTE", "int8")

    import jax

    print(f"# devices: {jax.devices()}", file=sys.stderr)

    t0 = time.perf_counter()
    model = build_model(model_name, compute_type)
    audio = load_audio_13min()
    print(f"# setup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # warmup (compiles the mel/VAD/encode/beam programs).  The 65 s pass
    # compiles the small-bucket programs; the full pass compiles/loads the
    # 13-min set (24576-window VAD, 32-chunk mel, full-batch pipeline) —
    # without it, run 1 of the timed set pays program load instead of
    # measuring the pipeline.
    warm = run_once(model, audio[: 16000 * 65], batch_size, beam_size)
    print(f"# warmup(65s audio): {warm:.2f}s", file=sys.stderr)
    warm = run_once(model, audio, batch_size, beam_size)
    print(f"# warmup(full audio): {warm:.2f}s", file=sys.stderr)

    times = [run_once(model, audio, batch_size, beam_size) for _ in range(repeats)]
    best = min(times)

    if os.environ.get("BENCH_EXTRA_ROWS", "1") != "0":
        try:
            extra_rows(model, batch_size, beam_size)
        except Exception as exc:  # noqa: BLE001 — tail rows must not kill bench
            print(f"# extra_rows failed: {exc!r}", file=sys.stderr)

    baseline = 16.0  # reference large-v2 int8 batch=8 on RTX 3070 Ti
    print(
        json.dumps(
            {
                "metric": f"13min-audio batched transcribe wall-clock "
                f"({model_name} random-weights, {compute_type}, "
                f"beam={beam_size}, batch={batch_size}, 128 tok/chunk)",
                "value": round(best, 3),
                "unit": "s",
                "vs_baseline": round(baseline / best, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
