import numpy as np
import pytest

from faster_whisper_tpu.feature_extractor import FeatureExtractor


def _oracle_log_mel(waveform: np.ndarray, mel_filters: np.ndarray, padding=160):
    """Independent numpy oracle for the Whisper log-mel pipeline, written
    directly against the published formula (Hann window, reflect-centered
    400-point rFFT at hop 160, drop last frame, Slaney mel matmul,
    log10 -> dynamic-range clamp -> affine scale)."""
    n_fft, hop = 400, 160
    x = np.pad(waveform.astype(np.float32), (0, padding))
    x = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)

    n_frames = 1 + (len(x) - n_fft) // hop
    spec = np.empty((n_frames, n_fft // 2 + 1), dtype=np.complex64)
    for t in range(n_frames):
        frame = x[t * hop : t * hop + n_fft] * window
        spec[t] = np.fft.rfft(frame)

    power = (np.abs(spec[:-1]) ** 2).astype(np.float32)  # drop last frame
    mel = mel_filters @ power.T
    log_spec = np.log10(np.clip(mel, 1e-10, None))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


@pytest.fixture(scope="module")
def extractor():
    return FeatureExtractor()


def test_mel_filters_shape_and_energy(extractor):
    filters = extractor.mel_filters
    assert filters.shape == (80, 201)
    # Every mel band except possibly the edges must have positive energy.
    assert (filters.sum(axis=1)[1:-1] > 0).all()
    # Slaney normalization: peak filter values decrease with center frequency.
    peaks = filters.max(axis=1)
    assert peaks[0] > peaks[-1]


def test_mel_filters_128(extractor):
    fe = FeatureExtractor(feature_size=128)
    assert fe.mel_filters.shape == (128, 201)


def test_log_mel_matches_oracle(extractor):
    rng = np.random.default_rng(0)
    waveform = rng.standard_normal(16000 * 3).astype(np.float32) * 0.1
    got = extractor(waveform)
    want = _oracle_log_mel(waveform, extractor.mel_filters)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_log_mel_speech_like_signal(extractor):
    t = np.arange(16000 * 2, dtype=np.float32) / 16000
    waveform = (
        0.3 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.sin(2 * np.pi * 880 * t)
    ).astype(np.float32)
    got = extractor(waveform)
    want = _oracle_log_mel(waveform, extractor.mel_filters)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_frame_count_contract(extractor):
    # (len + padding) // hop frames, e.g. exactly 3001 for a full 30 s window.
    waveform = np.zeros(16000 * 30, dtype=np.float32)
    feats = extractor(waveform)
    assert feats.shape == (80, 3001)


def test_chunk_length_override_mutates_state(extractor):
    fe = FeatureExtractor()
    fe(np.zeros(16000, dtype=np.float32), chunk_length=10)
    assert fe.n_samples == 160000
    assert fe.nb_max_frames == 1000


def test_silence_normalization(extractor):
    feats = extractor(np.zeros(16000, dtype=np.float32))
    # All-zero audio: every bin clamps to the same normalized floor.
    assert np.allclose(feats, feats.flat[0])


def test_global_max_not_polluted_by_bucketing(extractor):
    # A 31 s waveform forces bucket padding; the normalization max must come
    # from real frames only, so results must equal the oracle.
    rng = np.random.default_rng(1)
    waveform = rng.standard_normal(16000 * 31).astype(np.float32) * 0.05
    got = extractor(waveform)
    want = _oracle_log_mel(waveform, extractor.mel_filters)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
