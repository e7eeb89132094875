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

    rng = np.random.default_rng(3)
    audio = rng.standard_normal(16000 * 60).astype(np.float32)
    chunks = [
        {"start": 16000 * 1, "end": 16000 * 8},
        {"start": 16000 * 12, "end": 16000 * 30},
        {"start": 16000 * 42, "end": 16000 * 59},
    ]

    ours_audio, ours_meta = our_vad.collect_chunks(audio, chunks, max_duration=15)
    ref_audio, ref_meta = ref_vad.collect_chunks(audio, chunks, max_duration=15)
    assert len(ours_audio) == len(ref_audio)
    for a, b in zip(ours_audio, ref_audio):
        np.testing.assert_array_equal(a, b)
    assert ours_meta == ref_meta

    ours_map = our_vad.SpeechTimestampsMap(chunks, 16000)
    ref_map = ref_vad.SpeechTimestampsMap(chunks, 16000)
    for t in [0.0, 0.5, 3.3, 7.0, 12.9, 25.0, 43.9]:
        ci_ours = ours_map.get_chunk_index(t)
        ci_ref = ref_map.get_chunk_index(t)
        assert ci_ours == ci_ref
        assert ours_map.get_original_time(t, ci_ours) == pytest.approx(
            ref_map.get_original_time(t, ci_ref)
        )


# ---------------------------------------------------------------------------
# Tokenizer (same synthetic tokenizer.json driven through both wrappers)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def both_tokenizers(ref_modules):
    ref_tok = ref_modules[1]
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.tokenizer import Tokenizer as OurTokenizer

    hf = build_synthetic_tokenizer(base_vocab=50257)
    ours = OurTokenizer(hf, multilingual=True, task="transcribe", language="en")
    ref = ref_tok.Tokenizer(hf, multilingual=True, task="transcribe", language="en")
    return ours, ref


def test_tokenizer_special_ids_match_reference(both_tokenizers):
    ours, ref = both_tokenizers
    assert ours.sot == ref.sot
    assert ours.eot == ref.eot
    assert ours.sot_prev == ref.sot_prev
    assert ours.sot_lm == ref.sot_lm
    assert ours.no_speech == ref.no_speech
    assert ours.no_timestamps == ref.no_timestamps
    assert ours.timestamp_begin == ref.timestamp_begin
    assert ours.transcribe == ref.transcribe
    assert ours.translate == ref.translate
    assert list(ours.sot_sequence) == list(ref.sot_sequence)
    assert ours.language_code == ref.language_code


def test_tokenizer_non_speech_tokens_match_reference(both_tokenizers):
    ours, ref = both_tokenizers
    assert list(ours.non_speech_tokens) == list(ref.non_speech_tokens)


def test_tokenizer_decode_paths_match_reference(both_tokenizers):
    ours, ref = both_tokenizers
    toks = ours.encode(" hello world, this is a test")
    assert toks == ref.encode(" hello world, this is a test")
    assert ours.decode(toks) == ref.decode(toks)
    ts = [ours.timestamp_begin + 5] + toks + [ours.timestamp_begin + 80]
    assert ours.decode_with_timestamps(ts) == ref.decode_with_timestamps(ts)


def test_tokenizer_word_split_matches_reference(both_tokenizers):
    ours, ref = both_tokenizers
    toks = ours.encode(" hello world, it's a test!")
    w_ours, t_ours = ours.split_to_word_tokens(toks)
    w_ref, t_ref = ref.split_to_word_tokens(toks)
    assert w_ours == w_ref
    assert t_ours == t_ref


def test_get_suppressed_tokens_matches_reference(ref_modules, both_tokenizers):
    import faster_whisper.transcribe as ref_tr

    from faster_whisper_tpu.transcribe import get_suppressed_tokens

    ours, ref = both_tokenizers
    for sup in ([-1], [], [42, 7], [-1, 42]):
        got = get_suppressed_tokens(ours, list(sup))
        want = ref_tr.get_suppressed_tokens(ref, list(sup))
        assert tuple(got) == tuple(want), sup


def test_format_timestamp_matches_reference(ref_modules):
    ref_utils = ref_modules[3]
    from faster_whisper_tpu.utils import format_timestamp

    for t in [0.0, 0.02, 1.5, 59.999, 61.02, 3599.98, 3600.0, 3723.456]:
        assert format_timestamp(t) == ref_utils.format_timestamp(t)
        assert format_timestamp(
            t, always_include_hours=True, decimal_marker=","
        ) == ref_utils.format_timestamp(t, always_include_hours=True, decimal_marker=",")


def test_get_end_matches_reference(ref_modules):
    ref_utils = ref_modules[3]
    from faster_whisper_tpu.utils import get_end

    segs = [
        {"words": [{"end": 1.0}, {"end": 2.5}], "end": 2.0},
        {"words": [], "end": 4.0},
    ]
    assert get_end(segs) == ref_utils.get_end(segs)
    assert get_end([]) == ref_utils.get_end([])


# ---------------------------------------------------------------------------
# Decode-policy layer: timestamp splitting, punctuation merge, VAD-clock
# restoration
# ---------------------------------------------------------------------------


class _PolicyConsts:
    """The derived constants both implementations read off self
    (reference: transcribe.py:711-722)."""

    input_stride = 2
    time_precision = 0.02
    frames_per_second = 100
    tokens_per_second = 50


def _ts_token_cases(tsb, eot):
    """Token streams covering the timestamp-pairing shapes: consecutive
    pairs, single-timestamp ending, and no timestamps at all."""
    t = tsb
    return [
        # two complete segments: <0.00> text <1.00><1.00> text <2.50>
        [t + 0, 5, 6, t + 50, t + 50, 7, 8, 9, t + 125],
        # single timestamp ending: <0.00> text <2.00>
        [t + 0, 11, 12, 13, t + 100],
        # no consecutive pair, trailing text after last timestamp
        [t + 10, 5, 6],
        # no timestamps at all (without_timestamps decode)
        [5, 6, 7, 8],
        # empty
        [],
    ]


def test_split_segments_by_timestamps_matches_reference(
    ref_modules, both_tokenizers
):
    import faster_whisper.transcribe as ref_tr

    from faster_whisper_tpu.transcribe import WhisperModel as OurModel

    ours_tok, ref_tok = both_tokenizers
    consts = _PolicyConsts()

    for tokens in _ts_token_cases(ours_tok.timestamp_begin, ours_tok.eot):
        for seek0 in (0, 1200):
            got = OurModel._split_segments_by_timestamps(
                consts,
                tokenizer=ours_tok,
                tokens=list(tokens),
                time_offset=seek0 * 0.01,
                segment_size=3000,
                segment_duration=30.0,
                seek=seek0,
            )
            want = ref_tr.WhisperModel._split_segments_by_timestamps(
                consts,
                tokenizer=ref_tok,
                tokens=list(tokens),
                time_offset=seek0 * 0.01,
                segment_size=3000,
                segment_duration=30.0,
                seek=seek0,
            )
            assert got[1] == want[1], tokens  # seek advance
            assert got[2] == want[2], tokens  # single_timestamp_ending
            assert len(got[0]) == len(want[0]), tokens
            for g, w in zip(got[0], want[0]):
                assert g["tokens"] == w["tokens"]
                assert g["start"] == pytest.approx(w["start"])
                assert g["end"] == pytest.approx(w["end"])


def test_merge_punctuations_matches_reference(ref_modules):
    import faster_whisper.transcribe as ref_tr

    from faster_whisper_tpu.transcribe import merge_punctuations

    def mk():
        return [
            {"word": " \u00bf", "tokens": [1], "start": 0.0, "end": 0.1},
            {"word": " Hola", "tokens": [2], "start": 0.1, "end": 0.5},
            {"word": ",", "tokens": [3], "start": 0.5, "end": 0.6},
            {"word": " mundo", "tokens": [4], "start": 0.6, "end": 1.0},
            {"word": "!", "tokens": [5], "start": 1.0, "end": 1.1},
            {"word": '"', "tokens": [6], "start": 1.1, "end": 1.2},
        ]

    ours, ref = mk(), mk()
    prepended, appended = "\"'\u201c\u00bf([{-", "\"'.\u3002,\uff0c!\uff01?\uff1f:\uff1a\u201d)]}\u3001"
    merge_punctuations(ours, prepended, appended)
    ref_tr.merge_punctuations(ref, prepended, appended)
    assert ours == ref


def test_restore_speech_timestamps_matches_reference(ref_modules):
    import faster_whisper.transcribe as ref_tr

    import faster_whisper_tpu.transcribe as our_tr

    chunks = [
        {"start": 16000 * 2, "end": 16000 * 9},
        {"start": 16000 * 15, "end": 16000 * 28},
    ]

    def mk_segments(mod):
        return [
            mod.Segment(
                id=1, seek=0, start=1.0, end=4.0, text=" a", tokens=[1],
                avg_logprob=-0.1, compression_ratio=1.0, no_speech_prob=0.0,
                words=None, temperature=0.0,
            ),
            mod.Segment(
                id=2, seek=0, start=8.0, end=12.0, text=" b", tokens=[2],
                avg_logprob=-0.1, compression_ratio=1.0, no_speech_prob=0.0,
                words=[
                    mod.Word(start=8.0, end=9.0, word=" b", probability=0.9),
                    mod.Word(start=11.0, end=12.0, word=" c", probability=0.9),
                ],
                temperature=0.0,
            ),
        ]

    got = list(
        our_tr.restore_speech_timestamps(mk_segments(our_tr), chunks, 16000)
    )
    want = list(
        ref_tr.restore_speech_timestamps(mk_segments(ref_tr), chunks, 16000)
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.start == pytest.approx(w.start)
        assert g.end == pytest.approx(w.end)
        if w.words:
            assert [(x.start, x.end) for x in g.words] == [
                (x.start, x.end) for x in w.words
            ]


# ---------------------------------------------------------------------------
# Full API-signature parity (names, order-independent, default values)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "cls_name", ["WhisperModel", "BatchedInferencePipeline"]
)
def test_transcribe_signature_defaults_match_reference(ref_modules, cls_name):
    import inspect

    import faster_whisper.transcribe as ref_tr

    import faster_whisper_tpu.transcribe as our_tr

    def defaults(fn):
        return {
            k: (v.default if v.default is not inspect.Parameter.empty else "<req>")
            for k, v in inspect.signature(fn).parameters.items()
            if k != "self"
        }

    ref_d = defaults(getattr(getattr(ref_tr, cls_name), "transcribe"))
    our_d = defaults(getattr(getattr(our_tr, cls_name), "transcribe"))
    assert set(ref_d) == set(our_d)
    for k in ref_d:
        assert ref_d[k] == our_d[k], k


def test_language_codes_match_reference(ref_modules):
    import faster_whisper.tokenizer as ref_tok

    from faster_whisper_tpu.tokenizer import _LANGUAGE_CODES

    assert tuple(_LANGUAGE_CODES) == tuple(ref_tok._LANGUAGE_CODES)
    assert len(_LANGUAGE_CODES) == 100


# ---------------------------------------------------------------------------
# generate_with_fallback decision parity
# ---------------------------------------------------------------------------


def _fallback_options(mod, **over):
    kw = dict(
        beam_size=5, best_of=5, patience=1.0, length_penalty=1.0,
        repetition_penalty=1.0, no_repeat_ngram_size=0,
        log_prob_threshold=-1.0, no_speech_threshold=0.6,
        compression_ratio_threshold=2.4,
        condition_on_previous_text=True, prompt_reset_on_temperature=0.5,
        temperatures=[0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
        initial_prompt=None, prefix=None, suppress_blank=True,
        suppress_tokens=[-1], without_timestamps=False,
        max_initial_timestamp=1.0, word_timestamps=False,
        prepend_punctuations="\"'([{-", append_punctuations="\"'.,!?:)]}",
        multilingual=False, max_new_tokens=None, clip_timestamps="0",
        hallucination_silence_threshold=None, hotwords=None,
    )
    kw.update(over)
    return mod(**kw)


def test_generate_with_fallback_decisions_match_reference(ref_modules):
    """The temperature-ladder policy (CR/log-prob/no-speech checks, the
    all-failed best-pick, rung count, and per-rung engine kwargs) must
    make byte-identical decisions to the reference's method when both run
    over the same scripted engine results."""
    import logging

    import faster_whisper.transcribe as ref_tr

    from faster_whisper_tpu.transcribe import (
        TranscriptionOptions as OurOpts,
        WhisperModel as OurModel,
    )

    class Result:
        def __init__(self, seq, score, nsp):
            self.sequences_ids = [list(seq)]
            self.scores = [score]
            self.no_speech_prob = nsp

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
