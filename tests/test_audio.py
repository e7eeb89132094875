import hashlib
import io
import os

import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# Native libav backend (MP3/M4A/... via native/media_decoder.cpp)
# ---------------------------------------------------------------------------


def _mpg123_decode(path):
    """Independent ground truth: decode an MP3 with libmpg123 via ctypes.

    Returns (int16 interleaved ndarray, rate, channels) or None when
    libmpg123 is not present on the system.
    """
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("mpg123") or "libmpg123.so.0"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None

    lib.mpg123_init()
    lib.mpg123_new.restype = ctypes.c_void_p
    err = ctypes.c_int()
    h = lib.mpg123_new(None, ctypes.byref(err))
    assert h

    lib.mpg123_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    assert lib.mpg123_open(h, path.encode()) == 0

    rate = ctypes.c_long()
    ch = ctypes.c_int()
    enc = ctypes.c_int()
    lib.mpg123_getformat.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    assert lib.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(ch), ctypes.byref(enc)) == 0
    # Lock the output format to s16 at the native rate/channels.
    MPG123_ENC_SIGNED_16 = 0xD0
    lib.mpg123_format_none(ctypes.c_void_p(h))
    lib.mpg123_format.argtypes = [
        ctypes.c_void_p,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.mpg123_format(h, rate, ch, MPG123_ENC_SIGNED_16)

    lib.mpg123_read.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t),
    ]
    buf = ctypes.create_string_buffer(1 << 16)
    done = ctypes.c_size_t()
    out = bytearray()
    MPG123_OK, MPG123_DONE, MPG123_NEW_FORMAT = 0, -12, -11
    while True:
        rc = lib.mpg123_read(h, buf, len(buf), ctypes.byref(done))
        out += buf.raw[: done.value]
        if rc == MPG123_DONE:
            break
        if rc not in (MPG123_OK, MPG123_NEW_FORMAT):
            break
    lib.mpg123_close(ctypes.c_void_p(h))
    lib.mpg123_delete(ctypes.c_void_p(h))
    return np.frombuffer(bytes(out), dtype=np.int16), int(rate.value), int(ch.value)


def test_decode_mp3_hotwords(hotwords_mp3_path):
    audio = decode_audio(hotwords_mp3_path, sampling_rate=16000)
    assert audio.dtype == np.float32
    assert 3.0 < len(audio) / 16000 < 5.0
    assert float(np.sqrt(np.mean(audio**2))) > 0.01


def test_decode_mp3_multilingual_resampled(multilingual_mp3_path):
    # MPEG-2 Layer III mono @ 24 kHz -> 16 kHz mono
    audio = decode_audio(multilingual_mp3_path, sampling_rate=16000)
    assert audio.dtype == np.float32
    assert 55.0 < len(audio) / 16000 < 65.0
    assert float(np.sqrt(np.mean(audio**2))) > 0.01


def test_decode_mp3_filelike(hotwords_mp3_path):
    with open(hotwords_mp3_path, "rb") as f:
        audio = decode_audio(f, sampling_rate=16000)
    ref = decode_audio(hotwords_mp3_path, sampling_rate=16000)
    np.testing.assert_array_equal(audio, ref)


def test_mp3_native_decode_matches_mpg123(hotwords_mp3_path):
    """Cross-validate the libav-based native decoder against libmpg123 —
    two independent MPEG Layer III implementations."""
    truth = _mpg123_decode(hotwords_mp3_path)
    if truth is None:
        import pytest

        pytest.skip("libmpg123 not available")
    want, rate, ch = truth

    from faster_whisper_tpu.media_native import decode_media_native

    with open(hotwords_mp3_path, "rb") as f:
        data = f.read()
    got = decode_media_native(data, rate, ch == 2)
    assert got is not None
    got_i16 = np.clip(got * 32768.0, -32768, 32767)

    # Decoders may differ in gapless trim by a few frames: align by
    # cross-correlating the first seconds, then require near-identity.
    a = got_i16[: rate * ch]
    b = want[: rate * ch].astype(np.float32)
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    lags = range(-2304 * ch, 2304 * ch + 1, ch)
    best_lag, best = 0, -1.0
    for lag in lags:
        if lag >= 0:
            x, y = a[lag:n], b[: n - lag]
        else:
            x, y = a[: n + lag], b[-lag:n]
        denom = np.linalg.norm(x) * np.linalg.norm(y)
        if denom == 0:
            continue
        c = float(np.dot(x, y) / denom)
        if c > best:
            best, best_lag = c, lag
    assert best > 0.99, (best, best_lag)


# ---------------------------------------------------------------------------
# Compressed-container matrix: AAC/M4A, OGG/Vorbis, Opus
# ---------------------------------------------------------------------------


def _best_alignment_corr(a, b, max_lag):
    """Max normalized correlation over integer lags in [-max_lag, max_lag]."""
    n = min(len(a), len(b))
    a, b = a[:n].astype(np.float64), b[:n].astype(np.float64)
    best = -1.0
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            x, y = a[lag:], b[: n - lag]
        else:
            x, y = a[: n + lag], b[-lag:]
        denom = np.linalg.norm(x) * np.linalg.norm(y)
        if denom == 0:
            continue
        best = max(best, float(np.dot(x, y) / denom))
    return best


@pytest.mark.parametrize("ext", ["m4a", "ogg", "opus"])
def test_decode_compressed_containers_match_flac(ext, jfk_path, local_data_dir):
    """M4A/AAC, OGG/Vorbis and Opus must decode end-to-end and match the
    lossless original (the reference's own benchmark file is an .m4a —
    reference: benchmark/utils.py:12-15).  Fixtures are jfk.flac's first
    6 s re-encoded at 64 kbps by tests/tools/media_encode.cpp."""
    from faster_whisper_tpu.media_native import media_native_available

    path = os.path.join(local_data_dir, f"jfk.{ext}")
    assert os.path.exists(path), "fixture missing — run tests/tools/media_encode"
    if not media_native_available():
        try:
            import av  # noqa: F401
        except ImportError:
            pytest.skip("no libav shim and no PyAV")

    got = decode_audio(path, sampling_rate=16000)
    ref = decode_audio(jfk_path, sampling_rate=16000)[: 16000 * 6]

    # 6 s at 16 kHz, allowing codec/resampler edge trims
    assert abs(len(got) - len(ref)) < 16000 // 2, (len(got), len(ref))
    assert got.dtype == np.float32
    assert float(np.abs(got).max()) <= 1.0

    # lossy codecs shift by their codec delay: align by scanning lags,
    # then require strong correlation with the lossless original
    corr = _best_alignment_corr(got[: 16000 * 3], ref[: 16000 * 3], 2000)
    assert corr > 0.85, (ext, corr)


def test_decode_m4a_filelike(local_data_dir):
    """File-like M4A input must match path input (MP4 demuxing needs
    working seek callbacks, unlike the streamable formats)."""
    from faster_whisper_tpu.media_native import media_native_available

    path = os.path.join(local_data_dir, "jfk.m4a")
    if not media_native_available():
        pytest.skip("no libav shim")
    ref = decode_audio(path, sampling_rate=16000)
    with open(path, "rb") as f:
        got = decode_audio(f, sampling_rate=16000)
    np.testing.assert_array_equal(got, ref)
