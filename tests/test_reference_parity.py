"""Direct behavioral parity against the reference's pure-Python modules.

The reference package at /root/reference is importable module-by-module
(its CT2/ORT/PyAV dependencies are only needed at call time or can be
stubbed), so these tests run OUR implementations and the REFERENCE
implementations side by side on the same inputs:

  * feature_extractor: log-mel output equality to float tolerance,
  * vad: the hysteresis state machine + chunk collection + timestamp
    restoration given identical speech probabilities,
  * tokenizer: special ids, encode/decode, timestamp decoding, word
    splitting, suppress sets,
  * utils: format_timestamp, get_end.

This is stronger than golden files: any drift in either side fails.
"""

import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # faster_whisper/__init__.py imports .audio which needs PyAV; stub it.
    if "av" not in sys.modules:
        av = types.ModuleType("av")
        av.error = types.SimpleNamespace(InvalidDataError=Exception)
        av.audio = types.SimpleNamespace(
            resampler=types.SimpleNamespace(AudioResampler=object),
            fifo=types.SimpleNamespace(AudioFifo=object),
        )
        sys.modules["av"] = av
        sys.modules["av.error"] = av.error  # type: ignore[assignment]
    if "ctranslate2" not in sys.modules:
        # the reference's transcribe.py imports ctranslate2 at module level
        # (incl. attribute lookups inside type annotations at class-creation
        # time) but only *calls* it at inference time; an any-attribute stub
        # suffices here
        class _AnyAttr(types.ModuleType):
            def __getattr__(self, name):
                return object

        ct2 = _AnyAttr("ctranslate2")
        ct2.models = _AnyAttr("ctranslate2.models")
        ct2.get_cuda_device_count = lambda: 0
        ct2.get_supported_compute_types = lambda *a, **k: ["float32"]
        sys.modules["ctranslate2"] = ct2
    if "onnxruntime" not in sys.modules:
        sys.modules["onnxruntime"] = types.ModuleType("onnxruntime")
    try:
        import faster_whisper.feature_extractor as ref_fe
        import faster_whisper.tokenizer as ref_tok
        import faster_whisper.utils as ref_utils
        import faster_whisper.vad as ref_vad
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference package not importable: {e}")
    return ref_fe, ref_tok, ref_vad, ref_utils


# ---------------------------------------------------------------------------
# Feature extractor
# ---------------------------------------------------------------------------


def test_log_mel_matches_reference(ref_modules, jfk_path):
    ref_fe = ref_modules[0]
    from faster_whisper_tpu.audio import decode_audio
    from faster_whisper_tpu.feature_extractor import FeatureExtractor

    audio = decode_audio(jfk_path, sampling_rate=16000)

    ours = FeatureExtractor()(audio)
    ref = ref_fe.FeatureExtractor()(audio)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_log_mel_chunk_length_override_matches_reference(ref_modules, jfk_path):
    ref_fe = ref_modules[0]
    from faster_whisper_tpu.audio import decode_audio
    from faster_whisper_tpu.feature_extractor import FeatureExtractor

    audio = decode_audio(jfk_path, sampling_rate=16000)[: 16000 * 5]
    ours = FeatureExtractor()(audio, chunk_length=10)
    ref = ref_fe.FeatureExtractor()(audio, chunk_length=10)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# VAD: state machine + chunk collection given identical probabilities
# ---------------------------------------------------------------------------


def _fake_probs_model(probs):
    """A stand-in for the Silero model returning canned per-window probs."""

    class _M:
        def __call__(self, padded_audio, *a, **k):
            n = len(padded_audio) // 512
            return np.asarray(probs[:n], dtype=np.float32)

    return _M()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vad_state_machine_matches_reference(ref_modules, seed):
    ref_vad = ref_modules[2]
    import faster_whisper_tpu.vad as our_vad

    rng = np.random.default_rng(seed)
    n_windows = 400  # ~12.8 s
    # blocky speech/silence pattern with noise so hysteresis paths trigger
    state = rng.random(n_windows // 20) > 0.45
    probs = np.repeat(state, 20).astype(np.float32)
    probs = np.clip(probs * 0.9 + rng.normal(0, 0.15, n_windows), 0, 1)
    audio = rng.standard_normal(n_windows * 512).astype(np.float32)

    fake = _fake_probs_model(probs)
    our_opts = our_vad.VadOptions(min_silence_duration_ms=300, max_speech_duration_s=6.0)
    ref_opts = ref_vad.VadOptions(min_silence_duration_ms=300, max_speech_duration_s=6.0)

    orig_our, orig_ref = our_vad.get_vad_model, ref_vad.get_vad_model
    our_vad.get_vad_model = lambda: fake
    ref_vad.get_vad_model = lambda: fake
    try:
        ours = our_vad.get_speech_timestamps(audio, our_opts)
        ref = ref_vad.get_speech_timestamps(audio, ref_opts)
    finally:
        our_vad.get_vad_model, ref_vad.get_vad_model = orig_our, orig_ref

    assert ours == ref


def test_collect_chunks_and_timestamp_map_match_reference(ref_modules):
    ref_vad = ref_modules[2]
    import faster_whisper_tpu.vad as our_vad

    class Engine:
        def __init__(self, script):
            self.script = script
            self.calls = []

        def generate(self, enc, prompts, **kw):
            self.calls.append(kw)
            seq, score, nsp = self.script[len(self.calls) - 1]
            return [Result(seq, score, nsp)]

    class Tok:
        def decode(self, toks):
            return " ".join(str(t) for t in toks)

    def build(cls, script):
        m = object.__new__(cls)
        m.model = Engine(script)
        m.logger = logging.getLogger("fallback-parity")
        m.time_precision = 0.02
        m.max_length = 448
        return m

    diverse = list(range(100, 130))
    repeated = [7, 7] * 40  # zlib-compressible -> CR above 2.4
    scenarios = [
        # passes immediately
        [(diverse, -0.2, 0.1)],
        # too repetitive twice, then ok
        [(repeated, -0.2, 0.1), (repeated, -0.3, 0.1), (diverse, -0.4, 0.1)],
        # low log prob all the way -> all-failed best pick
        [(diverse, -2.0 - 0.1 * i, 0.1) for i in range(6)],
        # silence override: high no-speech + low logprob stops the ladder
        [(diverse, -3.0, 0.9)],
        # CR failures with one below-threshold candidate: best pick must
        # come from the below-threshold set
        [(repeated, -0.5, 0.1)] + [(diverse, -1.8 - 0.1 * i, 0.1)
                                   for i in range(5)],
    ]
    for script in scenarios:
        ours_m = build(OurModel, script)
        ref_m = build(ref_tr.WhisperModel, script)
        o_res, o_lp, o_temp, o_cr = ours_m.generate_with_fallback(
            None, [1, 2, 3], Tok(), _fallback_options(OurOpts)
        )
        r_res, r_lp, r_temp, r_cr = ref_m.generate_with_fallback(
            None, [1, 2, 3], Tok(),
            _fallback_options(ref_tr.TranscriptionOptions),
        )
        assert o_res.sequences_ids == r_res.sequences_ids
        assert o_lp == pytest.approx(r_lp)
        assert o_temp == r_temp
        assert o_cr == pytest.approx(r_cr)
        assert len(ours_m.model.calls) == len(ref_m.model.calls)
        for ok, rk in zip(ours_m.model.calls, ref_m.model.calls):
            assert ok == rk


# ---------------------------------------------------------------------------
# add_word_timestamps / find_alignment heuristics parity
# ---------------------------------------------------------------------------


def test_add_word_timestamps_matches_reference(ref_modules, both_tokenizers):
    """Run our add_word_timestamps and the reference's side by side over
    an identical mocked ``model.align`` (same DTW alignments and token
    probabilities): the jump-time extraction, word splitting, anomaly
    duration heuristics, and punctuation merging must produce identical
    word dicts and last_speech_timestamp."""
    import copy
    import logging

    import faster_whisper.transcribe as ref_tr

    from faster_whisper_tpu.transcribe import WhisperModel as OurModel

    ours_tok, _ = both_tokenizers
    tsb = ours_tok.timestamp_begin

    class AlignResult:
        def __init__(self, probs, aligns):
            self.text_token_probs = probs
            self.alignments = aligns

    rng = np.random.default_rng(3)

    def scripted_align(n_tokens_list, t_frames):
        """Monotonic synthetic DTW paths + probs per batch item."""
        results = []
        for n in n_tokens_list:
            rows = n + 1  # text + eot
            path = []
            ti = fi = 0
            while ti < rows or fi < t_frames - 1:
                path.append((min(ti, rows - 1), min(fi, t_frames - 1)))
                if ti >= rows:
                    fi += 1
                elif fi >= t_frames - 1:
                    ti += 1
                elif rng.random() < 0.4:
                    ti += 1
                else:
                    fi += int(rng.integers(1, 4))
            probs = rng.random(n).round(3).tolist()
            results.append(AlignResult(probs, path))
        return results

    class Engine:
        def __init__(self):
            self.calls = []

        def align(self, enc, sot_seq, text_tokens, num_frames, **kw):
            self.calls.append((list(map(list, text_tokens)), num_frames, kw))
            # deterministic per call-shape: reseed from the token count
            global_rng = np.random.default_rng(
                1000 + sum(len(t) for t in text_tokens)
            )
            nonlocal_results = []
            for n in [len(t) for t in text_tokens]:
                rows = n + 1
                t_frames = max(1, (num_frames if isinstance(num_frames, int)
                                   else num_frames[0]) // 2)
                path, ti, fi = [], 0, 0
                while ti < rows or fi < t_frames - 1:
                    path.append((min(ti, rows - 1), min(fi, t_frames - 1)))
                    if ti >= rows:
                        fi += 1
                    elif fi >= t_frames - 1:
                        ti += 1
                    elif global_rng.random() < 0.4:
                        ti += 1
                    else:
                        fi += int(global_rng.integers(1, 4))
                probs = global_rng.random(n).round(3).tolist()
                nonlocal_results.append(AlignResult(probs, path))
            return nonlocal_results

    def build(cls):
        m = object.__new__(cls)
        m.model = Engine()
        m.logger = logging.getLogger("wts-parity")
        m.time_precision = 0.02
        m.tokens_per_second = 50.0
        m.frames_per_second = 100.0
        m.max_length = 448
        return m

    # segments with real-ish text tokens (words + punctuation)
    words = " the quick brown fox, jumps. over the lazy dog!"
    token_ids = [t for t in ours_tok.encode(words) if t < ours_tok.eot]
    seg_tokens = [
        token_ids[:6] + [tsb + 10],
        [tsb + 12] + token_ids[6:] + [tsb + 80],
    ]
    base_segments = [
        dict(seek=0, start=0.2, end=2.4, tokens=seg_tokens[0]),
        dict(seek=0, start=2.4, end=6.0, tokens=seg_tokens[1]),
    ]

    for last_ts in (0.0, 1.7):
        ours_segs = copy.deepcopy([base_segments])
        ref_segs = copy.deepcopy([base_segments])
        build(OurModel).add_word_timestamps(
            ours_segs, ours_tok, None, 600, "\"'([{-", "\"'.,!?:)]}",
            last_speech_timestamp=last_ts,
        )
        build(ref_tr.WhisperModel).add_word_timestamps(
            ref_segs, ours_tok, None, 600, "\"'([{-", "\"'.,!?:)]}",
            last_speech_timestamp=last_ts,
        )
        assert ours_segs == ref_segs, last_ts
