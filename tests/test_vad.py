import numpy as np
import pytest

import faster_whisper_tpu.vad as vad_mod
from faster_whisper_tpu.vad import (
    SpeechTimestampsMap,
    VadOptions,
    collect_chunks,
    get_speech_timestamps,
)

SR = 16000
WIN = 512


class FakeModel:
    """Injects a fixed probability sequence in place of the Silero net."""

    def __init__(self, probs):
        self.probs = np.asarray(probs, dtype=np.float32)

    def __call__(self, audio):
        n = len(audio) // WIN
        out = np.zeros(n, dtype=np.float32)
        out[: min(n, len(self.probs))] = self.probs[:n]
        return out


@pytest.fixture
def fake_vad(monkeypatch):
    def install(probs):
        monkeypatch.setattr(vad_mod, "get_vad_model", lambda: FakeModel(probs))

    return install


def _audio(n_windows):
    return np.zeros(n_windows * WIN, dtype=np.float32)


def test_simple_speech_segment(fake_vad):
    probs = [0.0] * 10 + [0.9] * 20 + [0.0] * 10
    fake_vad(probs)
    ts = get_speech_timestamps(
        _audio(40), VadOptions(min_silence_duration_ms=100, speech_pad_ms=0)
    )
    assert len(ts) == 1
    assert ts[0]["start"] == 10 * WIN
    # end = first window below neg_threshold after speech
    assert ts[0]["end"] == 30 * WIN


def test_short_silence_not_split(fake_vad):
    # 100 ms silence < min_silence 2000 ms: stays one chunk
    probs = [0.9] * 20 + [0.0] * 3 + [0.9] * 20
    fake_vad(probs)
    ts = get_speech_timestamps(_audio(43), VadOptions(speech_pad_ms=0))
    assert len(ts) == 1


def test_long_silence_splits(fake_vad):
    # 2.5 s silence >= min_silence 2000 ms: two chunks
    n_sil = int(2.5 * SR / WIN) + 1
    probs = [0.9] * 20 + [0.0] * n_sil + [0.9] * 20 + [0.0] * 70
    fake_vad(probs)
    ts = get_speech_timestamps(
        _audio(len(probs)), VadOptions(speech_pad_ms=0)
    )
    assert len(ts) == 2


def test_min_speech_duration_filters(fake_vad):
    probs = [0.0] * 5 + [0.9] * 2 + [0.0] * 80  # 64 ms of speech
    fake_vad(probs)
    ts = get_speech_timestamps(
        _audio(len(probs)),
        VadOptions(
            min_speech_duration_ms=250,
            min_silence_duration_ms=100,
            speech_pad_ms=0,
        ),
    )
    assert ts == []


def test_max_speech_duration_splits(fake_vad):
    probs = [0.9] * 200  # 6.4 s of continuous speech
    fake_vad(probs)
    ts = get_speech_timestamps(
        _audio(200),
        VadOptions(max_speech_duration_s=3.0, speech_pad_ms=0),
    )
    assert len(ts) >= 2
    for t in ts:
        assert (t["end"] - t["start"]) / SR <= 3.1


def test_speech_pad_applied(fake_vad):
    probs = [0.0] * 20 + [0.9] * 20 + [0.0] * 20
    fake_vad(probs)
    ts = get_speech_timestamps(
        _audio(60),
        VadOptions(min_silence_duration_ms=100, speech_pad_ms=400),
    )
    assert len(ts) == 1
    pad = int(0.4 * SR)
    assert ts[0]["start"] == 20 * WIN - pad


def test_neg_threshold_hysteresis(fake_vad):
    # probabilities hovering between neg_threshold (0.35) and threshold (0.5)
    # keep the segment open
    probs = [0.9] * 10 + [0.4] * 10 + [0.9] * 10 + [0.0] * 80
    fake_vad(probs)
    ts = get_speech_timestamps(
        _audio(len(probs)), VadOptions(min_silence_duration_ms=100, speech_pad_ms=0)
    )
    assert len(ts) == 1


def test_collect_chunks_empty():
    chunks, meta = collect_chunks(np.zeros(100, np.float32), [])
    assert len(chunks) == 1 and chunks[0].size == 0
    assert meta == [{"offset": 0, "duration": 0, "segments": []}]


def test_collect_chunks_packs_to_max_duration():
    audio = np.arange(SR * 10, dtype=np.float32)
    ts = [
        {"start": 0, "end": SR * 2},
        {"start": SR * 3, "end": SR * 5},
        {"start": SR * 6, "end": SR * 9},
    ]
    chunks, meta = collect_chunks(audio, ts, max_duration=4.0)
    assert len(chunks) == 2
    assert meta[0]["duration"] == pytest.approx(4.0)
    assert meta[1]["offset"] == pytest.approx(4.0)
    assert meta[1]["duration"] == pytest.approx(3.0)
    # data integrity: concatenated chunks == concatenated speech regions
    np.testing.assert_array_equal(
        np.concatenate(chunks),
        np.concatenate([audio[t["start"] : t["end"]] for t in ts]),
    )


def test_speech_timestamps_map_roundtrip():
    ts = [
        {"start": SR * 2, "end": SR * 4},
        {"start": SR * 7, "end": SR * 10},
    ]
    m = SpeechTimestampsMap(ts, SR)
    # time 0 in compressed clock -> 2 s original (2 s leading silence)
    assert m.get_original_time(0.0) == pytest.approx(2.0)
    assert m.get_original_time(1.0) == pytest.approx(3.0)
    # after the first chunk (2 s compressed), 3 s more silence accrued
    assert m.get_original_time(3.0) == pytest.approx(8.0)


def test_real_audio_vad(jfk_path):
    import faster_whisper_tpu as fw

    audio = fw.decode_audio(jfk_path, sampling_rate=16000)
    ts = get_speech_timestamps(audio, VadOptions())
    # jfk.flac is continuous speech: one chunk covering nearly everything
    assert len(ts) >= 1
    speech = sum(t["end"] - t["start"] for t in ts) / SR
    assert speech > 9.0
    silence = np.zeros(SR * 3, dtype=np.float32)
    assert get_speech_timestamps(silence) == []


def test_get_speech_timestamps_accepts_device_audio(jfk_path):
    """audio_device= lets callers share an already-uploaded jax copy; the
    result must equal the host-array path exactly."""
    import jax.numpy as jnp

    from faster_whisper_tpu.audio import decode_audio
    from faster_whisper_tpu.vad import VadOptions, get_speech_timestamps

    audio = decode_audio(jfk_path, sampling_rate=16000)
    opts = VadOptions()
    host = get_speech_timestamps(audio, opts)
    dev = get_speech_timestamps(audio, opts, audio_device=jnp.asarray(audio))
    assert host == dev


def test_native_hysteresis_matches_python():
    """The C transliteration (native/vad_sm.cpp) must match the Python
    hysteresis loop EXACTLY across random probability streams and option
    corners (max-speech splits, min-silence, thresholds)."""
    from faster_whisper_tpu.vad import _hysteresis_py
    from faster_whisper_tpu.vad_native import hysteresis_native

    rng = np.random.default_rng(0)
    param_sets = [
        # (threshold, neg, min_speech, max_speech, min_sil, sil_at_max)
        (0.5, 0.35, 4000.0, float("inf"), 2000.0, 1568.0),
        (0.5, 0.35, 0.0, 16000 * 4.0, 32000.0, 1568.0),
        (0.3, 0.15, 250.0, 16000 * 2.5, 1600.0, 1568.0),
        (0.8, 0.65, 0.0, 16000 * 1.0, 500.0, 1568.0),
    ]
    n = 4000
    for seed in range(6):
        r = np.random.default_rng(seed)
        # random walk in [0,1]: realistic slow-moving speech probability
        steps = r.normal(0, 0.08, n)
        probs = np.clip(np.cumsum(steps) % 2, 0, None)
        probs = np.abs(1 - np.abs(1 - probs)).astype(np.float32)
        for params in param_sets:
            thr, neg, msp, mxs, msl, sam = params
            py = _hysteresis_py(
                probs, 512, thr, neg, msp, mxs, msl, sam, n * 512
            )
            nat = hysteresis_native(
                probs, 512, thr, neg, msp, mxs, msl, sam, n * 512
            )
            assert nat is not None, "native lib failed to build"
            assert nat == py, (seed, params)


def test_native_hysteresis_threshold_boundaries():
    """Probabilities EXACTLY equal to the float32-rounded thresholds:
    numpy 2 compares np.float32(p) against the Python-float threshold in
    float32 (NEP 50 weak promotion), and the C loop must match that
    width — a double comparison diverges when f32(threshold) != threshold."""
    from faster_whisper_tpu.vad import _hysteresis_py
    from faster_whisper_tpu.vad_native import hysteresis_native

    thr, neg = 0.5, 0.35  # f32(0.35) < 0.35 in double
    probs = np.array(
        [0.9, 0.9, np.float32(0.35), 0.2, 0.2, 0.9, np.float32(0.5),
         0.34, 0.1, 0.1, 0.9, 0.9],
        dtype=np.float32,
    )
    args = (512, thr, neg, 0.0, float("inf"), 1024.0, 1568.0,
            len(probs) * 512)
    py = _hysteresis_py(probs, *args)
    nat = hysteresis_native(probs, *args)
    assert nat == py


def _tiled_fixture_audio(jfk_path, n_samples):
    from faster_whisper_tpu.audio import decode_audio

    base = np.asarray(decode_audio(jfk_path, sampling_rate=SR), np.float32)
    reps = -(-n_samples // len(base))
    return np.tile(base, reps)[:n_samples]


def test_upload_with_vad_matches_whole_buffer_forward(jfk_path):
    """The pipelined sliced forward (LSTM state + context chained across
    UPLOAD_BUCKET slices, models/silero.py::_vad_slice_step) is bitwise
    equal to the one-shot whole-buffer forward, and the returned device
    PCM equals upload_audio's buffer exactly."""
    from faster_whisper_tpu.models.silero import VAD_SLICE_SAMPLES
    from faster_whisper_tpu.ops.mel import UPLOAD_BUCKET_SAMPLES, upload_audio
    from faster_whisper_tpu.vad import get_vad_model, upload_with_vad

    assert VAD_SLICE_SAMPLES == UPLOAD_BUCKET_SAMPLES  # shared grid

    audio = _tiled_fixture_audio(jfk_path, int(2.3 * VAD_SLICE_SAMPLES))
    expected_windows = len(audio) // WIN + 1

    model = get_vad_model()
    ref = model(np.pad(audio, (0, WIN - len(audio) % WIN)))[:expected_windows]

    audio_dev, probs_dev = upload_with_vad(audio)
    got = np.asarray(probs_dev)[:expected_windows]
    np.testing.assert_array_equal(got, np.asarray(ref))
    np.testing.assert_array_equal(
        np.asarray(audio_dev), np.asarray(upload_audio(audio))
    )


def test_upload_with_vad_exact_bucket_multiple(jfk_path):
    """len(audio) an exact UPLOAD_BUCKET multiple: the reference pads one
    extra window past the buffer, supplied by a device-made zero slice;
    the audio copy stays at the bucket length like upload_audio's."""
    from faster_whisper_tpu.models.silero import VAD_SLICE_SAMPLES
    from faster_whisper_tpu.vad import get_vad_model, upload_with_vad

    audio = _tiled_fixture_audio(jfk_path, 2 * VAD_SLICE_SAMPLES)
    expected_windows = len(audio) // WIN + 1

    model = get_vad_model()
    ref = model(np.pad(audio, (0, WIN)))[:expected_windows]

    audio_dev, probs_dev = upload_with_vad(audio)
    assert probs_dev.shape[0] >= expected_windows
    assert audio_dev.shape[0] == len(audio)
    np.testing.assert_array_equal(
        np.asarray(probs_dev)[:expected_windows], np.asarray(ref)
    )


def test_pipelined_vad_same_speech_timestamps(jfk_path, monkeypatch):
    """get_speech_timestamps decisions are identical with the pipelined
    sliced path on (default) and off."""
    audio = _tiled_fixture_audio(jfk_path, int(1.5 * SR * 30))
    opts = VadOptions(max_speech_duration_s=30, min_silence_duration_ms=160)

    monkeypatch.setenv("FWT_PIPELINED_VAD", "0")
    ref = get_speech_timestamps(audio, opts)
    monkeypatch.setenv("FWT_PIPELINED_VAD", "1")
    got = get_speech_timestamps(audio, opts)
    assert got == ref
