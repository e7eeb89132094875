import hashlib
import io

import numpy as np

from faster_whisper_tpu.audio import decode_audio, pad_or_trim


def _make_wav_bytes(samples_i16: np.ndarray, rate: int, channels: int) -> bytes:
    pcm = samples_i16.astype("<i2").tobytes()
    hdr = b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * 2).to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    data = b"data" + len(pcm).to_bytes(4, "little") + pcm
    return hdr + fmt + data


def test_decode_wav_mono_16k():
    t = np.arange(16000, dtype=np.float32) / 16000
    ref = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    wav = _make_wav_bytes(ref, 16000, 1)
    audio = decode_audio(io.BytesIO(wav), sampling_rate=16000)
    assert audio.dtype == np.float32
    assert audio.shape == (16000,)
    np.testing.assert_allclose(audio, ref.astype(np.float32) / 32768.0, atol=1e-6)


def test_decode_wav_resample():
    rate_in = 8000
    t = np.arange(rate_in, dtype=np.float32) / rate_in
    ref = (0.5 * np.sin(2 * np.pi * 200 * t) * 32767).astype(np.int16)
    wav = _make_wav_bytes(ref, rate_in, 1)
    audio = decode_audio(io.BytesIO(wav), sampling_rate=16000)
    assert abs(audio.shape[0] - 16000) <= 2
    # The resampled signal should still be a 200 Hz tone with ~0.5 amplitude.
    assert 0.4 < np.abs(audio).max() < 0.6


def test_decode_wav_split_stereo():
    left = (np.full(1000, 0.25) * 32767).astype(np.int16)
    right = (np.full(1000, -0.5) * 32767).astype(np.int16)
    interleaved = np.empty(2000, dtype=np.int16)
    interleaved[0::2] = left
    interleaved[1::2] = right
    wav = _make_wav_bytes(interleaved, 16000, 2)
    l, r = decode_audio(io.BytesIO(wav), sampling_rate=16000, split_stereo=True)
    assert np.allclose(l, 0.25, atol=1e-3)
    assert np.allclose(r, -0.5, atol=1e-3)


def test_decode_flac_md5(jfk_path):
    """The FLAC STREAMINFO block carries an MD5 of the unencoded PCM;
    our decoder must reproduce it exactly."""
    from faster_whisper_tpu.flac import decode_flac_raw

    with open(jfk_path, "rb") as f:
        data = f.read()
    samples, rate, bps, md5_expected = decode_flac_raw(data)
    assert samples.shape[0] > 0

    nbytes = (bps + 7) // 8
    flat = samples.reshape(-1).astype(np.int64)
    flat = flat & ((1 << (8 * nbytes)) - 1)  # two's complement truncation
    raw = np.zeros((flat.size, nbytes), dtype=np.uint8)
    for b in range(nbytes):
        raw[:, b] = (flat >> (8 * b)) & 0xFF
    assert hashlib.md5(raw.tobytes()).digest() == md5_expected


def test_decode_flac_jfk(jfk_path):
    audio = decode_audio(jfk_path, sampling_rate=16000)
    assert audio.dtype == np.float32
    # jfk.flac is an 11 s clip
    assert 10.0 < audio.shape[0] / 16000 < 12.0
    assert np.abs(audio).max() > 0.05  # actual speech content


def test_decode_stereo_wav(stereo_wav_path):
    audio = decode_audio(stereo_wav_path, sampling_rate=16000)
    assert audio.ndim == 1
    left, right = decode_audio(stereo_wav_path, sampling_rate=16000, split_stereo=True)
    assert left.shape == right.shape
    assert not np.allclose(left, right)  # diarization fixture: distinct channels


def test_pad_or_trim():
    x = np.ones((80, 2000), dtype=np.float32)
    y = pad_or_trim(x, 3000)
    assert y.shape == (80, 3000)
    assert np.all(y[:, 2000:] == 0)

    z = pad_or_trim(np.ones((80, 4000), dtype=np.float32), 3000)
    assert z.shape == (80, 3000)
