import numpy as np
import pytest

from faster_whisper_tpu.audio import pad_or_trim
from faster_whisper_tpu.feature_extractor import FeatureExtractor


@pytest.fixture(scope="module")
def fe():
    return FeatureExtractor()


def _host_reference(fe, chunk):
    """The batched pipeline's per-chunk host path: FeatureExtractor(chunk)
    -> drop last frame -> zero-pad to the 30 s window."""
    feats = fe(chunk)[..., :-1]
    return np.asarray(pad_or_trim(feats, fe.nb_max_frames))


def test_chunk_features_matches_host_path(fe):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 40) * 0.1).astype(np.float32)
    # three chunks of different lengths, consecutive in the buffer
    lengths = [16000 * 20, 16000 * 12, 16000 * 8]
    starts = [0, lengths[0], lengths[0] + lengths[1]]

    got = np.asarray(fe.chunk_features(audio, starts, lengths))
    assert got.shape == (3, 80, 3000)

    for i, (s, l) in enumerate(zip(starts, lengths)):
        want = _host_reference(fe, audio[s : s + l])
        np.testing.assert_allclose(got[i], want, atol=3e-4, rtol=1e-3)


def test_chunk_features_short_chunk(fe):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    got = np.asarray(fe.chunk_features(audio, [0], [len(audio)]))
    want = _host_reference(fe, audio)
    np.testing.assert_allclose(got[0], want, atol=3e-4, rtol=1e-3)
    # padding region is exactly zero
    valid = (len(audio) + 160) // 160 - 1
    assert np.all(got[0][:, valid:] == 0.0)


def test_chunk_features_many_chunks_bucketing(fe):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000 * 30) * 0.1).astype(np.float32)
    # 10 chunks of 3 s -> exercises the bucket padding (bucket=8 -> 16)
    starts = [i * 16000 * 3 for i in range(10)]
    lengths = [16000 * 3] * 10
    got = np.asarray(fe.chunk_features(audio, starts, lengths))
    assert got.shape == (10, 80, 3000)
    want = _host_reference(fe, audio[: 16000 * 3])
    np.testing.assert_allclose(got[0], want, atol=3e-4, rtol=1e-3)


def test_extract_window_matches_slice(fe):
    import jax.numpy as jnp

    from faster_whisper_tpu.ops.mel import extract_window

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((80, 4000)).astype(np.float32)
    padded = jnp.pad(jnp.asarray(feats), ((0, 0), (0, 3000)))

    for seek, size in [(0, 3000), (1000, 3000), (3500, 500), (3999, 1)]:
        got = np.asarray(
            extract_window(padded, jnp.int32(seek), jnp.int32(size), 3000)
        )
        want = np.asarray(pad_or_trim(feats[:, seek : seek + size], 3000))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_assemble_segments_matches_host_concat():
    import jax.numpy as jnp

    from faster_whisper_tpu.ops.mel import assemble_segments

    rng = np.random.default_rng(4)
    # on the int16 grid so the shared-upload transport is lossless
    audio = (rng.integers(-20000, 20000, 16000 * 40) / 32768.0).astype(
        np.float32
    )
    spans = [(0, 16000), (16000 * 5, 16000 * 8), (16000 * 39, 16000 * 40)]
    want = np.concatenate([audio[s:e] for s, e in spans])
    got = np.asarray(assemble_segments(jnp.asarray(audio), spans))
    np.testing.assert_array_equal(got, want)

    # spans longer than seg_cap split on the host
    got2 = np.asarray(
        assemble_segments(jnp.asarray(audio), spans, seg_cap=16000)
    )
    np.testing.assert_array_equal(got2, want)

    assert assemble_segments(jnp.asarray(audio), []).shape == (0,)


def test_shared_upload_pipeline_matches_separate(monkeypatch):
    """FWT_SHARED_UPLOAD=1 (device-assembled speech concat) must produce
    the same segments as the separate-upload path on int16-grid audio."""
    from faster_whisper_tpu.testing import build_test_model
    from faster_whisper_tpu.transcribe import BatchedInferencePipeline

    rng = np.random.default_rng(5)
    model = build_test_model()
    audio = (rng.integers(-15000, 15000, 16000 * 8) / 32768.0).astype(
        np.float32
    )
    clips = [{"start": 0.5, "end": 3.0}, {"start": 4.0, "end": 7.5}]
    kw = dict(language="en", beam_size=2, clip_timestamps=clips)

    monkeypatch.setenv("FWT_SHARED_UPLOAD", "0")
    ref, _ = BatchedInferencePipeline(model).transcribe(audio, **kw)
    ref = [s.text for s in ref]
    monkeypatch.setenv("FWT_SHARED_UPLOAD", "1")
    got, _ = BatchedInferencePipeline(model).transcribe(audio, **kw)
    got = [s.text for s in got]
    assert got == ref
