"""Ahead-of-time program warm-up for TPU serving.

XLA compiles one program per distinct (shape-bucket, static-flag)
combination, and on TPU a cold compile of the large-v3 decode loop takes
minutes.  The persistent compilation cache (utils.enable_compile_cache)
makes every compile a one-time cost *per cache*, but a fresh deployment
still pays it at first-request time unless someone fills the cache first.
This tool does exactly that: it builds the configured pipeline and pushes
synthetic audio through every program the configuration can hit — mel
frontend, VAD, encoder, prefill, the beam/sampling decode loops at their
prompt/context buckets, language detection, and (optionally) the
word-timestamp alignment pass — then reports what was compiled.

The reference has no equivalent (CTranslate2 ships precompiled kernels);
this is a TPU-deployment concern, the "model loading" phase a CT2 user
never sees (reference model load: faster_whisper/transcribe.py:689-698).

Usage:
    python -m faster_whisper_tpu.precompile --model large-v3 \
        --compute-type int8 --batch-size 8 --beam-size 5 \
        --max-new-tokens 128 [--word-timestamps] [--sequential] \
        [--language en] [--random-weights]

With ``--random-weights`` the tool compiles against a random-initialized
model of the same architecture (the compiled programs depend only on
shapes/dtypes, not weight content), so a cache can be baked without
checkpoint access — e.g. in an image build.
"""

import argparse
import functools
import json
import os
import sys
import time


def _count_cache_entries(cache_dir) -> int:
    if not cache_dir or not os.path.isdir(cache_dir):
        return 0
    return sum(len(files) for _, _, files in os.walk(cache_dir))


_SPEECH_FIXTURE = "/root/reference/tests/data/jfk.flac"
_fixture_cache = {}


def synthetic_speech(seconds: float, sr: int = 16000, seed: int = 0):
    """Speech-shaped audio the REAL Silero VAD accepts: random fragments
    of the jfk fixture spliced with silence gaps, so VAD chunking is
    non-trivial and the batched pipeline compiles its production batch
    shapes.  Purely synthetic audio does not work here — Silero v6 is a
    trained classifier and scores harmonic/formant constructions <0.01
    speech probability (measured), which silently reduced the round-3
    warm-up and bench rows to ~1 s of post-VAD audio.  Falls back to the
    harmonic generator when the fixture is absent."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    base = None
    if os.path.exists(_SPEECH_FIXTURE):
        base = _fixture_cache.get(sr)
        if base is None:
            from faster_whisper_tpu.audio import decode_audio

            base = np.asarray(
                decode_audio(_SPEECH_FIXTURE, sampling_rate=sr), np.float32
            )
            _fixture_cache[sr] = base
    if base is None or len(base) < sr:
        return _harmonic_bursts(seconds, sr, seed)

    out = np.zeros(n, np.float32)
    t = 0
    while t < n:
        frag = int(rng.uniform(1.0, 4.0) * sr)
        start = int(rng.uniform(0, max(1, len(base) - frag)))
        gap = int(rng.uniform(0.3, 1.2) * sr)
        end = min(t + frag, n)
        out[t:end] = base[start : start + (end - t)]
        t = end + gap
    return out


def _harmonic_bursts(seconds: float, sr: int = 16000, seed: int = 0):
    """Harmonic bursts with pauses (fixture-free fallback; does NOT trip
    a production VAD — see synthetic_speech)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    out = np.zeros(n, np.float32)
    t = 0
    while t < n:
        burst = int(rng.uniform(1.0, 6.0) * sr)  # 1-6 s of "speech"
        gap = int(rng.uniform(0.3, 1.2) * sr)  # short silence
        end = min(t + burst, n)
        seg_t = np.arange(end - t) / sr
        f0 = rng.uniform(90, 220)
        sig = np.zeros(end - t, np.float32)
        for h in (1, 2, 3):
            sig += (0.3 / h) * np.sin(
                2 * np.pi * f0 * h * seg_t + rng.uniform(0, 6.28)
            ).astype(np.float32)
        # syllable-rate amplitude modulation + noise floor
        sig *= 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(2, 5) * seg_t).astype(
            np.float32
        )
        sig += 0.02 * rng.standard_normal(end - t).astype(np.float32)
        out[t:end] = sig
        t = end + gap
    return out


def warm_parallel(
    model,
    *,
    durations_s=(65.0, 780.0),
    batch_size: int = 8,
    beam_size: int = 5,
    max_new_tokens=128,  # int, None (= the model's full context), or a
    # sequence of those: each distinct decode budget selects its own
    # ctx-bucketed beam program, so servers that accept requests WITHOUT
    # max_new_tokens must warm None too (the default request's program)
    language: str = "en",
    word_timestamps: bool = False,
    without_timestamps: bool = True,  # the batched pipeline's default
    log=None,
):
    """Compile the batched pipeline's program set IN PARALLEL and pay the
    backend's one-time first-dispatch cost concurrently with it.

    Two measured facts shape this (see benchmarks/README.md cold-start
    rows): (1) compiles issued from separate threads overlap near-
    perfectly through the remote-compile relay (4x6 s compiles finish in
    ~8.5 s), and (2) the first *blocking* execution on a fresh backend
    session pays a large one-time establishment cost (60-700 s on a
    congested pool) after which further first-executions are ~free.  A
    serial warmup therefore costs sum(compiles) + establishment; this
    function costs ~max(slowest compile, establishment).

    Uses REAL calls on zero-filled inputs at the exact production shape
    buckets, so both the in-process jit caches and the persistent
    compilation cache end up populated.  Every sub-warm is stamped via
    ``log`` so a partial (killed) run still shows what finished.
    """
    import threading
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from faster_whisper_tpu.tokenizer import Tokenizer
    from faster_whisper_tpu.transcribe import get_suppressed_tokens

    eng = model.model
    fe = model.feature_extractor
    say = log or (lambda msg: None)
    t0 = _time.perf_counter()
    failures = []

    def run(name, fn):
        def wrapped():
            t1 = _time.perf_counter()
            try:
                fn()
            except Exception as exc:  # noqa: BLE001 — warm must not kill serving
                failures.append((name, repr(exc)))
                say(f"# warm {name} FAILED: {exc!r}")
                return
            t2 = _time.perf_counter()
            say(
                f"# warm {name}: {t2 - t1:.1f}s (at +{t2 - t0:.1f}s)"
            )

        t = threading.Thread(target=wrapped, name=f"warm-{name}", daemon=True)
        t.start()
        return t

    def establish():
        # One tiny blocking pull: forces backend session / executable
        # stream establishment so the pipeline's first real pull is warm.
        float(jnp.sum(jnp.ones(8, jnp.float32)))

    def vad_warm():
        from faster_whisper_tpu.models.silero import vad_window_bucket
        from faster_whisper_tpu.vad import get_vad_model, upload_with_vad

        vad = get_vad_model()
        # production bucket math (incl. the +1-window pad at exact
        # multiples) comes from the model module itself
        buckets = sorted(
            {vad_window_bucket(int(d * 16000)) for d in durations_s}
        )
        for nb in buckets:
            vad(np.zeros(nb * 512, np.float32))
        # the pipelined sliced path is opt-in (measured slower over the
        # tunnel — see vad.upload_with_vad); warm its slice-step + concat
        # programs only when the deployment opted in
        if os.environ.get("FWT_PIPELINED_VAD", "0") == "1":
            for n in sorted({int(d * 16000) for d in durations_s}):
                upload_with_vad(np.zeros(n, np.float32))

    def mel_warm():
        # The bucket math is the production helpers' own (ops/mel.py) so
        # the warm can never silently desynchronize from what
        # chunked_log_mel compiles.
        from faster_whisper_tpu.ops.mel import (
            MEL_CHUNK_BUCKET,
            MEL_MAX_CHUNKS,
            assemble_out_bucket,
            mel_length_bucket,
        )

        win_samples = fe.nb_max_frames * fe.hop_length
        tail = win_samples + fe.n_fft
        # Reproduce the production chain EXACTLY: VAD speech total ->
        # assemble_out_bucket -> mel_length_bucket.  Speech <= raw
        # duration, so EVERY assemble bucket from the quantum up to the
        # raw duration's top is reachable (sparse speech can compress a
        # long file onto any of them) — walk them all so the
        # zero-new-compiles contract is complete, not just the top three.
        # The set dedups across durations and the mel compiles overlap
        # near-perfectly through the relay, so completeness costs little.
        ab = assemble_out_bucket(1)  # the bucket quantum
        l_buckets = set()
        for d in durations_s:
            top = assemble_out_bucket(int(d * 16000))
            for speech_bucket in range(ab, top + 1, ab):
                l_buckets.add(
                    mel_length_bucket(
                        speech_bucket, fe.n_fft, fe.hop_length,
                        fe.nb_max_frames,
                    )
                )
        # The chunk axis keys exactly {8, 16, 24, 32}: chunked_log_mel
        # slabs larger calls, so this is the COMPLETE set regardless of
        # how fragmented the VAD chunking turns out.
        n_buckets = range(MEL_CHUNK_BUCKET, MEL_MAX_CHUNKS + 1, MEL_CHUNK_BUCKET)
        for l_bucket in sorted(l_buckets):
            for n_bucket in n_buckets:
                starts = np.zeros(n_bucket, np.int64)
                lengths = np.full(n_bucket, win_samples, np.int64)
                fe.chunk_features(
                    np.zeros(l_bucket - tail, np.float32), starts, lengths
                )

    # The pipeline buckets the batch axis to powers of two (transcribe.py
    # _dispatch_segment_batch), so {1, 2, 4, ..., batch_size} is the
    # COMPLETE decode-program set for this configuration — the VAD's
    # data-dependent chunk count can never produce a batch outside it.
    # log2(batch_size)+1 programs, compiled concurrently.
    b_set = {batch_size}
    b = 1
    while b < batch_size:
        b_set.add(b)
        b *= 2

    budgets = (
        tuple(max_new_tokens)
        if isinstance(max_new_tokens, (tuple, list, set))
        else (max_new_tokens,)
    )

    def decode_warm(b):
        # encode + the production beam program (and the align pass when
        # word_timestamps), with the EXACT static args production uses:
        # the resolved suppress set, prompt bucket, and timestamp flag
        # select the program (a mismatched warm compiles a dead program).
        tokenizer = Tokenizer(
            model.hf_tokenizer,
            eng.is_multilingual,
            task="transcribe",
            language=language,
        )
        suppress = get_suppressed_tokens(tokenizer, [-1])
        prompt = model.get_prompt(
            tokenizer, previous_tokens=[],
            without_timestamps=without_timestamps,
        )
        mel = np.zeros((b, eng.config.n_mels, fe.nb_max_frames), np.float32)
        xa = eng.encode(mel)
        for budget in budgets:
            max_len = min(
                len(prompt) + (budget or model.max_length), model.max_length
            )
            eng.generate(
                xa,
                [list(prompt)] * b,
                beam_size=beam_size,
                patience=1,
                length_penalty=1,
                repetition_penalty=1,
                no_repeat_ngram_size=0,
                max_length=max_len,
                return_scores=True,
                return_no_speech_prob=True,
                suppress_blank=True,
                suppress_tokens=suppress,
                max_initial_timestamp_index=50,
                sampling_temperature=0.0,
            )
        if word_timestamps:
            eng.align(
                xa,
                list(tokenizer.sot_sequence),
                [[tokenizer.timestamp_begin]] * b,
                [fe.nb_max_frames] * b,
                median_filter_width=7,
            )

    threads = [
        run("establish (first blocking dispatch)", establish),
        run("vad buckets", vad_warm),
        run("mel buckets", mel_warm),
    ] + [
        run(f"encode+beam B={b}", functools.partial(decode_warm, b))
        for b in sorted(b_set)
    ]
    for t in threads:
        t.join()
    say(f"# warm_parallel total: {_time.perf_counter() - t0:.1f}s")
    return failures


def build_model(args):
    from faster_whisper_tpu.transcribe import WhisperModel

    if args.random_weights:
        from faster_whisper_tpu.models.config import CONFIGS, tiny_test_config
        from faster_whisper_tpu.models.load import random_params_device
        from faster_whisper_tpu.testing import build_synthetic_tokenizer

        if args.model == "test-micro":  # hermetic CPU tests
            config = tiny_test_config()
            tok = build_synthetic_tokenizer()
        else:
            config = CONFIGS[args.model]
            tok = build_synthetic_tokenizer(base_vocab=config.n_vocab - 1609)
        params = random_params_device(config, seed=0, dtype="bfloat16")
        return WhisperModel.from_parts(
            params, config, tok, {"feature_size": config.n_mels},
            compute_type=args.compute_type,
        )
    return WhisperModel(
        args.model, device="auto", compute_type=args.compute_type
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="faster_whisper_tpu.precompile", description=__doc__.split("\n")[0]
    )
    p.add_argument("--model", default="large-v3")
    p.add_argument("--compute-type", default="int8")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--best-of", type=int, default=5)
    p.add_argument(
        "--max-new-tokens", type=int, default=None,
        help="decode-budget bucket to compile (None = the model's full "
        "448 context)",
    )
    p.add_argument(
        "--language", default=None,
        help="pin the language (skips compiling language detection)",
    )
    p.add_argument(
        "--word-timestamps", action="store_true",
        help="also compile the alignment (DTW) forward pass",
    )
    p.add_argument(
        "--sequential", action="store_true",
        help="also compile the sequential seek-loop path: the long-prompt "
        "(conditioned) prefill bucket and the temperature-fallback "
        "sampling rungs",
    )
    p.add_argument(
        "--temperatures", default="0.0,0.2,0.4,0.6,0.8,1.0",
        help="fallback ladder to compile for --sequential",
    )
    p.add_argument("--random-weights", action="store_true")
    args = p.parse_args(argv)

    from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

    ensure_tpu_accelerator_type()

    import jax

    from faster_whisper_tpu.transcribe import BatchedInferencePipeline

    cache_dir = jax.config.jax_compilation_cache_dir
    n0 = _count_cache_entries(cache_dir)
    phases = []

    def phase(name, fn):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        phases.append((name, dt))
        print(f"# {name}: {dt:.1f}s", file=sys.stderr)

    t_start = time.perf_counter()
    model = build_model(args)
    phases.append(("load", time.perf_counter() - t_start))

    # Enough audio for two full batches plus a trailing partial batch so
    # the padded-trailing-batch program compiles too.
    audio = synthetic_speech((2 * args.batch_size + 3) * 18.0)
    pipeline = BatchedInferencePipeline(model)

    def run_batched(word_ts=False):
        segments, _ = pipeline.transcribe(
            audio,
            language=args.language,
            beam_size=args.beam_size,
            batch_size=args.batch_size,
            max_new_tokens=args.max_new_tokens,
            temperature=[0.0],
            word_timestamps=word_ts,
        )
        for _ in segments:
            pass

    phase("batched pipeline (beam)", run_batched)
    if args.word_timestamps:
        phase("alignment pass", lambda: run_batched(word_ts=True))

    if args.sequential:
        temps = [float(t) for t in args.temperatures.split(",") if t]

        def run_sequential():
            segments, _ = model.transcribe(
                audio[: 16000 * 95],
                language=args.language,
                beam_size=args.beam_size,
                best_of=args.best_of,
                max_new_tokens=args.max_new_tokens,
                temperature=temps,
                condition_on_previous_text=True,
            )
            for _ in segments:
                pass

        phase("sequential path (beam + conditioned prompts)", run_sequential)

        # The fallback rungs compile lazily in production (only when a
        # rung actually fires); compile every rung eagerly here with
        # PRODUCTION-SHAPED arguments — the args must match what
        # generate_with_fallback passes (transcribe.py:1034-1059) or the
        # cached programs never hit: the resolved suppress-token set is an
        # HLO constant, and prompt length buckets (32 / 128 / 256 — the
        # unconditioned, short-conditioned, and full-223-previous-token
        # forms of get_prompt) select distinct programs.  NOTE: because
        # the suppress set is baked in, a --random-weights cache serves a
        # real deployment only when built with the production tokenizer
        # (ids differ under the synthetic one).
        def run_rungs():
            import numpy as np

            from faster_whisper_tpu.tokenizer import Tokenizer
            from faster_whisper_tpu.transcribe import get_suppressed_tokens

            eng = model.model
            tokenizer = Tokenizer(
                model.hf_tokenizer,
                eng.is_multilingual,
                task="transcribe",
                language=args.language or "en",
            )
            suppress = get_suppressed_tokens(tokenizer, [-1])
            feat = np.asarray(model.feature_extractor(audio[: 16000 * 30]))
            xa = eng.encode(np.ascontiguousarray(feat[:, :3000])[None])
            filler = tokenizer.encode("the ") or [0]
            prompts = [
                model.get_prompt(tokenizer, previous_tokens=prev)
                for prev in (
                    [],  # first window: bucket 32
                    (filler * 90)[:90],  # short conditioning: bucket 128
                    (filler * 223)[:223],  # full tail: bucket 256
                )
            ]
            # The temperature is a traced per-row array (one sampling
            # program serves EVERY rung value), and production batches
            # the remaining sampling rungs into one call whose batch
            # size is the rung count (transcribe.py rung_results) — so
            # per bucket we compile the beam program, the batched-tail
            # sampling program, and the B=1 sampling program (serial
            # rungs under FWT_BATCHED_LADDER=0 or single-temp ladders).
            import jax.numpy as jnp

            sample_tail = [t for t in temps if t > 0]
            for prompt in prompts:
                max_len = min(
                    len(prompt) + (args.max_new_tokens or model.max_length),
                    model.max_length,
                )
                common = dict(
                    length_penalty=1.0,
                    repetition_penalty=1.0,
                    no_repeat_ngram_size=0,
                    max_length=max_len,
                    return_scores=True,
                    return_no_speech_prob=True,
                    suppress_blank=True,
                    suppress_tokens=suppress,
                    max_initial_timestamp_index=50,
                )
                if any(t <= 0 for t in temps):
                    eng.generate(
                        xa, [prompt],
                        beam_size=args.beam_size, patience=1.0, **common,
                    )
                sample_kwargs = dict(
                    beam_size=1, num_hypotheses=args.best_of,
                    sampling_topk=0, **common,
                )
                if sample_tail:
                    eng.generate(
                        xa, [prompt],
                        sampling_temperature=sample_tail[0], **sample_kwargs,
                    )
                if len(sample_tail) > 1:
                    n = len(sample_tail)
                    xa_n = jnp.broadcast_to(
                        jnp.asarray(xa), (n,) + tuple(xa.shape[1:])
                    )
                    eng.generate(
                        xa_n, [prompt] * n,
                        sampling_temperature=sample_tail, **sample_kwargs,
                    )

        phase("fallback rungs (all temps x prompt buckets)", run_rungs)

    n1 = _count_cache_entries(cache_dir)
    total = time.perf_counter() - t_start
    report = {
        "model": args.model,
        "compute_type": args.compute_type,
        "batch_size": args.batch_size,
        "beam_size": args.beam_size,
        "max_new_tokens": args.max_new_tokens,
        "persistent_cache_dir": cache_dir,
        "cache_entries_before": n0,
        "cache_entries_after": n1,
        "new_programs_cached": n1 - n0,
        "phases": {name: round(dt, 1) for name, dt in phases},
        "total_seconds": round(total, 1),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
