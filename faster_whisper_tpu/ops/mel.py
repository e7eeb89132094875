"""Fused STFT + log-mel spectrogram on TPU.

The reference computes features on the host with a numpy strided-window rFFT
(reference: faster_whisper/feature_extractor.py:68-230).  On TPU the natural
formulation is two MXU matmuls: the Hann window is folded into a real DFT
basis, so

    power[t, k] = (frames @ (w * cos))**2 + (frames @ (w * sin))**2
    mel[t, m]   = power @ mel_filters.T

which XLA fuses with the subsequent log/clip/scale elementwise chain.  Frame
extraction is a gather of overlapping 400-sample windows.  All math is f32:
the feature path feeds a global-max normalization, so bf16 would visibly
perturb the decoder input.

Numerics contract (must match the reference bit-for-bit up to f32 rounding,
reference: feature_extractor.py:198-230):
  * Hann window  np.hanning(n_fft + 1)[:-1]
  * reflect padding of n_fft//2 on both sides (center=True)
  * hop 160, rFFT 400 -> 201 bins, the LAST time frame is dropped
  * log10(clip(mel, 1e-10)), clamp at global_max - 8.0, then (x + 4) / 4
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


# Upload-length program bucket: 2048 VAD windows, so the one shared PCM
# upload, the dequant program, and the VAD forward all bucket on the
# same grid (models/silero.py VAD_WINDOW_BUCKET) — arbitrary file
# lengths reuse a handful of programs instead of compiling a fresh
# dequant/pad/forward chain per distinct sample count.
UPLOAD_BUCKET_SAMPLES = 2048 * 512


def upload_audio(buf: np.ndarray) -> jax.Array:
    """Host->device PCM transfer, as int16 when enabled (default).

    Audio decode produces s16-derived float32 (value grid k/32768 for
    unresampled mono sources), so shipping int16 and dividing on device
    halves the transfer bytes at <=0.5 LSB error — significant on
    tunneled TPUs where host->device runs at ~50 MB/s.  Disable with
    FWT_I16_TRANSFER=0 for bit-exact float32 transport.

    The buffer is zero-padded to an UPLOAD_BUCKET_SAMPLES multiple (the
    pad costs <=2 MB of extra transfer, ~40 ms); downstream consumers
    mask/slice by the true sample count they track host-side.
    """
    import os

    n = len(buf)
    total = max(
        UPLOAD_BUCKET_SAMPLES,
        -(-n // UPLOAD_BUCKET_SAMPLES) * UPLOAD_BUCKET_SAMPLES,
    )
    if os.environ.get("FWT_I16_TRANSFER", "1") == "0":
        return jnp.asarray(
            np.pad(np.asarray(buf, np.float32), (0, total - n))
        )
    q = np.zeros(total, np.int16)
    q[:n] = np.clip(np.round(buf * 32768.0), -32768, 32767).astype(np.int16)
    return _dequant_i16(jnp.asarray(q))


@jax.jit
def _dequant_i16(q: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * (1.0 / 32768.0)


def hann_window(n_fft: int) -> np.ndarray:
    """The periodic Hann window used by Whisper: np.hanning(n_fft+1)[:-1]."""
    return np.hanning(n_fft + 1)[:-1].astype(np.float32)


def _frames_from_signal(full: jax.Array, n_frames: int, n_fft: int, hop: int):
    """Overlapping (n_frames, n_fft) windows of ``full`` at stride ``hop``
    without a gather: n_fft = 2.5 * hop, so frame t = [block t, block t+1,
    first half of block t+2] over hop-sized blocks.  (2-D gathers of this
    shape take minutes to compile on TPU Mosaic; slice+concat is instant.)
    """
    assert n_fft == hop * 2 + hop // 2, (n_fft, hop)
    need = (n_frames + 2) * hop
    blocks = full[:need].reshape(n_frames + 2, hop)
    return jnp.concatenate(
        [
            blocks[:n_frames],
            blocks[1 : n_frames + 1],
            blocks[2 : n_frames + 2, : hop // 2],
        ],
        axis=1,
    )


def dft_basis(n_fft: int, window: np.ndarray):
    """Real-DFT basis with the analysis window folded in.

    Returns (cos_basis, sin_basis), each of shape (n_fft, n_fft//2 + 1), such
    that for a frame x: re = x @ cos_basis, im = x @ sin_basis gives
    rfft(w * x) = re + 1j * im.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    cos_b = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def _log_mel_impl(
    padded: jax.Array,  # (L,) waveform, already zero-padded to the frame grid
    n_valid_frames: jax.Array,  # scalar int32: frames that carry real signal
    mel_filters: jax.Array,  # (n_mels, n_bins)
    cos_basis: jax.Array,  # (n_fft, n_bins)
    sin_basis: jax.Array,  # (n_fft, n_bins)
    n_fft: int,
    hop_length: int,
):
    half = n_fft // 2
    x = jnp.pad(padded, (half, half + hop_length), mode="reflect")

    n_frames = padded.shape[0] // hop_length  # last frame already dropped
    frames = _frames_from_signal(x, n_frames, n_fft, hop_length)  # (T, n_fft)

    # HIGHEST precision: on TPU the default f32 matmul rounds through
    # bf16 passes, which visibly perturbs the log-compressed features.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_basis, precision=hi, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_basis, precision=hi, preferred_element_type=jnp.float32)
    power = re * re + im * im  # (T, n_bins)

    mel = jnp.dot(
        power, mel_filters.T, precision=hi, preferred_element_type=jnp.float32
    )

    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))

    # Global max over the *valid* frames only: the waveform may have been
    # right-padded to a bucketed length for compile-cache friendliness, and
    # those silent frames must not participate in the dynamic-range clamp.
    frame_ids = jnp.arange(n_frames, dtype=jnp.int32)[:, None]
    valid = frame_ids < n_valid_frames
    global_max = jnp.max(jnp.where(valid, log_spec, -jnp.inf))

    log_spec = jnp.maximum(log_spec, global_max - 8.0)
    log_spec = (log_spec + 4.0) / 4.0

    return log_spec.T  # (n_mels, T)


@functools.partial(jax.jit, static_argnames=("n_frames",))
def extract_window(
    features_padded: jax.Array,  # (n_mels, F + n_frames) zero-padded features
    seek: jax.Array,  # scalar start frame
    segment_size: jax.Array,  # scalar valid frames in the window
    n_frames: int,  # window length (3000)
) -> jax.Array:
    """Slice one seek window out of device-resident features and zero-fill
    past ``segment_size`` (the sequential loop's ``pad_or_trim(features[:,
    seek:seek+segment_size])``, reference: transcribe.py:1178-1180) without
    a host round-trip per window."""
    n_mels = features_padded.shape[0]
    w = jax.lax.dynamic_slice(
        features_padded, (jnp.int32(0), seek), (n_mels, n_frames)
    )
    mask = jnp.arange(n_frames) < segment_size
    return jnp.where(mask[None, :], w, 0.0)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "n_frames_win", "padding")
)
def _chunked_mel_impl(
    audio: jax.Array,  # (L,) full audio on device (zero-padded at the end)
    starts: jax.Array,  # (N,) chunk start samples
    lengths: jax.Array,  # (N,) chunk lengths in samples
    mel_filters: jax.Array,
    cos_basis: jax.Array,
    sin_basis: jax.Array,
    n_fft: int,
    hop_length: int,
    n_frames_win: int,  # output frames per chunk (3000 for 30 s windows)
    padding: int,
):
    """Per-chunk log-mel over fixed windows, computed fully on device.

    Reproduces FeatureExtractor(chunk)[..., :-1] then zero-pad-to-window for
    every chunk (the batched pipeline's per-chunk feature path, reference:
    faster_whisper/transcribe.py:463-467): per-chunk zero pad of
    ``padding`` samples, reflect-centered frames, per-chunk global-max
    normalization over the chunk's own (length+padding)//hop frames.
    Runs as one dispatch (lax.map over chunks) so the host never ships
    per-chunk buffers (~30 MB/s h2d on tunneled TPUs makes that ruinous).
    """
    half = n_fft // 2
    hi = jax.lax.Precision.HIGHEST
    W = n_frames_win * hop_length + padding  # static window sample count

    def one_chunk(args):
        start, length = args
        padded_len = length + padding  # chunk + zero tail

        core = jax.lax.dynamic_slice(audio, (start,), (W,))
        core = jnp.where(jnp.arange(W) < length, core, 0.0)

        # reflect-pad exactly like np.pad(chunk+zeros, half, "reflect"):
        # left mirror is static, right mirror sits at the runtime chunk end
        left = jnp.flip(core[1 : half + 1])
        rsrc = jax.lax.dynamic_slice(core, (padded_len - half - 1,), (half,))
        full = jnp.concatenate([left, core, jnp.zeros(half, core.dtype)])
        full = jax.lax.dynamic_update_slice(full, jnp.flip(rsrc), (half + padded_len,))

        frames = _frames_from_signal(full, n_frames_win + 1, n_fft, hop_length)

        re = jnp.dot(frames, cos_basis, precision=hi,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, sin_basis, precision=hi,
                     preferred_element_type=jnp.float32)
        power = re * re + im * im

        mel = jnp.dot(power, mel_filters.T, precision=hi,
                      preferred_element_type=jnp.float32)
        log_spec = jnp.log10(jnp.clip(mel, min=1e-10))

        n_frames_chunk = padded_len // hop_length  # incl. the dropped frame
        frame_ids = jnp.arange(n_frames_win + 1, dtype=jnp.int32)[:, None]
        in_chunk = frame_ids < n_frames_chunk
        global_max = jnp.max(jnp.where(in_chunk, log_spec, -jnp.inf))

        log_spec = jnp.maximum(log_spec, global_max - 8.0)
        log_spec = (log_spec + 4.0) / 4.0

        # keep frames [0, n_frames_chunk-1); zero-fill the rest (pad_or_trim)
        keep = frame_ids < jnp.maximum(n_frames_chunk - 1, 0)
        log_spec = jnp.where(keep, log_spec, 0.0)
        return log_spec[:n_frames_win].T  # (n_mels, n_frames_win)

    return jax.lax.map(one_chunk, (starts, lengths))


MEL_BUCKET_SAMPLES = 240 * 16000  # audio-length program bucket
MEL_CHUNK_BUCKET = 8  # chunk-count program bucket
MEL_MAX_CHUNKS = 32  # per-program chunk cap: larger calls run as slabs,
# so the chunk axis keys exactly {8, 16, 24, 32} — a fragmented VAD
# (one chunk per speech segment) can otherwise produce arbitrarily many
# chunks and an unwarmable program per count


def mel_length_bucket(
    n_samples: int,
    n_fft: int = 400,
    hop_length: int = 160,
    n_frames_win: int = 3000,
    bucket_samples: int = MEL_BUCKET_SAMPLES,
) -> int:
    """The padded audio length chunked_log_mel's program will see for
    ``n_samples`` of concatenated speech.  Exported so
    precompile.warm_parallel computes the SAME buckets as production
    (the zero-new-compiles warm contract)."""
    tail = n_frames_win * hop_length + n_fft
    return max(
        bucket_samples, -(-(n_samples + tail) // bucket_samples) * bucket_samples
    )


def mel_chunk_bucket(n_chunks: int, bucket: int = MEL_CHUNK_BUCKET) -> int:
    """The padded chunk count chunked_log_mel's program will see."""
    return max(bucket, -(-n_chunks // bucket) * bucket)


def assemble_out_bucket(total_samples: int) -> int:
    """The bucketed output length assemble_segments' program will carry
    for ``total_samples`` of concatenated speech (feeds
    mel_length_bucket in the shared-upload pipeline — exported so
    precompile.warm_parallel reproduces the exact production chain)."""
    out_bucket = int(os.environ.get("FWT_ASSEMBLE_BUCKET", 120 * 16000))
    return max(out_bucket, -(-total_samples // out_bucket) * out_bucket)


def chunked_log_mel(
    audio: np.ndarray,
    starts: np.ndarray,
    lengths: np.ndarray,
    mel_filters: jax.Array,
    cos_basis: jax.Array,
    sin_basis: jax.Array,
    n_fft: int = 400,
    hop_length: int = 160,
    n_frames_win: int = 3000,
    padding: int = 160,
    bucket: int = MEL_CHUNK_BUCKET,
    bucket_samples: int = MEL_BUCKET_SAMPLES,
) -> jax.Array:
    """(N, n_mels, n_frames_win) per-chunk features, device-resident.

    The chunk count is padded to a ``bucket`` multiple and the audio
    length to a ``bucket_samples`` multiple so XLA compiles a small,
    *enumerable* set of programs (an exact-length key would compile a new
    program for every distinct audio duration a deployment sees, and the
    program set could not be precompiled ahead of the first request);
    callers slice [:N].  The pad region is zeros past every chunk's
    ``lengths`` mask, so outputs for real chunks are unchanged.
    """
    n = len(starts)
    if n > MEL_MAX_CHUNKS:
        # Ship the audio to the device ONCE before slabbing: recursing on
        # the host array would re-pad and re-upload the whole buffer per
        # 32-chunk slab (~0.5 s of duplicate h2d transfer each on the
        # tunneled link).  Uploaded as bit-exact float32 zero-padded to
        # the shared UPLOAD grid — the same device-array shape the
        # FWT_SHARED_UPLOAD path hands every slab, so the per-slab tail
        # pad keys the identical (enumerable, warmable) program set and
        # chunk outputs are unchanged (pad region is masked zeros).
        if not isinstance(audio, jax.Array):
            total_up = max(
                UPLOAD_BUCKET_SAMPLES,
                -(-len(audio) // UPLOAD_BUCKET_SAMPLES)
                * UPLOAD_BUCKET_SAMPLES,
            )
            audio = jnp.asarray(
                np.pad(
                    np.asarray(audio, dtype=np.float32),
                    (0, total_up - len(audio)),
                )
            )
        outs = [
            chunked_log_mel(
                audio,
                starts[i : i + MEL_MAX_CHUNKS],
                lengths[i : i + MEL_MAX_CHUNKS],
                mel_filters, cos_basis, sin_basis,
                n_fft=n_fft, hop_length=hop_length,
                n_frames_win=n_frames_win, padding=padding,
                bucket=bucket, bucket_samples=bucket_samples,
            )
            for i in range(0, n, MEL_MAX_CHUNKS)
        ]
        return jnp.concatenate(outs, axis=0)
    n_pad = mel_chunk_bucket(n, bucket)
    starts_b = np.zeros(n_pad, np.int32)
    lengths_b = np.ones(n_pad, np.int32)
    starts_b[:n] = starts
    lengths_b[:n] = np.minimum(lengths, n_frames_win * hop_length)

    total = mel_length_bucket(
        len(audio), n_fft, hop_length, n_frames_win, bucket_samples
    )
    # float32 transport: features feed the model, so they stay bit-exact
    # (int16 transport shifts quiet log-mel bins by ~1e-3); the VAD path
    # uses upload_audio's int16 mode where only threshold decisions matter.
    # An already-on-device audio array (shared with the VAD upload) is
    # tail-padded on device — no second host->device transfer.
    if isinstance(audio, jax.Array):
        audio_dev = jnp.pad(
            audio.astype(jnp.float32), (0, total - len(audio))
        )
    else:
        audio_dev = jnp.asarray(
            np.pad(
                np.asarray(audio, dtype=np.float32),
                (0, total - len(audio)),
            )
        )
    out = _chunked_mel_impl(
        audio_dev,
        jnp.asarray(starts_b),
        jnp.asarray(lengths_b),
        mel_filters,
        cos_basis,
        sin_basis,
        n_fft,
        hop_length,
        n_frames_win,
        padding,
    )
    return out[:n]


@functools.partial(jax.jit, static_argnames=("seg_cap", "out_len"))
def _assemble_impl(audio, src, dst, lens, seg_cap: int, out_len: int):
    audio_p = jnp.pad(audio.astype(jnp.float32), (0, seg_cap))
    out0 = jnp.zeros(out_len + seg_cap, jnp.float32)
    offs = jnp.arange(seg_cap)

    def body(out, t):
        s, d, ln = t
        seg = jax.lax.dynamic_slice(audio_p, (s,), (seg_cap,))
        cur = jax.lax.dynamic_slice(out, (d,), (seg_cap,))
        seg = jnp.where(offs < ln, seg, cur)
        return jax.lax.dynamic_update_slice(out, seg, (d,)), None

    out, _ = jax.lax.scan(body, out0, (src, dst, lens))
    return out[:out_len]


def assemble_segments(
    audio_dev: jax.Array,
    spans,  # [(start, end)] sample ranges of the original audio
    seg_cap: int = 16000 * 31,
    bucket: int = 64,
    trim: bool = True,  # False: return the out_len-bucketed buffer
    # (zeros past the true total) so downstream eager ops key on the
    # bucket, not on one shape per distinct speech total
) -> jax.Array:
    """Device-side ``np.concatenate([audio[s:e] for s, e in spans])``.

    The batched pipeline's speech-concat buffer is rebuilt from the
    already-uploaded device audio instead of shipping a second ~full-size
    host buffer over the (slow, tunneled) host->device link.  Spans longer
    than ``seg_cap`` are split on the host; the copy runs as a scan of
    masked fixed-size dynamic-update-slices (no gathers — a flat index
    gather would itself be audio-sized).
    """
    src, dst, lens = [], [], []
    pos = 0
    for s, e in spans:
        s, e = int(s), int(e)
        while e - s > 0:
            take = min(e - s, seg_cap)
            src.append(s)
            dst.append(pos)
            lens.append(take)
            pos += take
            s += take
    total = pos
    if total == 0:
        return jnp.zeros(0, jnp.float32)
    # Bucket the output length (static in the program) so arbitrary
    # speech totals reuse a small, precompilable program set; the tail
    # rows are zero-length masked no-ops so the pad region stays zero.
    out_len = assemble_out_bucket(total)
    nb = max(bucket, -(-len(src) // bucket) * bucket)
    src_b = np.zeros(nb, np.int32)
    dst_b = np.zeros(nb, np.int32)
    len_b = np.zeros(nb, np.int32)  # zero-length pads are masked no-ops
    src_b[: len(src)] = src
    dst_b[: len(dst)] = dst
    len_b[: len(lens)] = lens
    out = _assemble_impl(
        audio_dev,
        jnp.asarray(src_b),
        jnp.asarray(dst_b),
        jnp.asarray(len_b),
        seg_cap,
        out_len,
    )
    return out[:total] if trim else out


def log_mel_spectrogram(
    waveform: np.ndarray,
    mel_filters: jax.Array,
    cos_basis: jax.Array,
    sin_basis: jax.Array,
    n_fft: int = 400,
    hop_length: int = 160,
    padding: int = 160,
    bucket_frames: int = 1500,
) -> jax.Array:
    """Compute Whisper log-mel features for a 1-D waveform.

    The waveform is zero-padded by ``padding`` samples (reference:
    feature_extractor.py:210-211) and then padded up to a multiple of
    ``bucket_frames`` frames so XLA compiles a small number of shapes.
    Returns a device array of shape (n_mels, n_frames) where
    n_frames = (len(waveform) + padding) // hop_length.
    """
    n_valid = (len(waveform) + padding) // hop_length
    # Buckets are k*bucket_frames + 1: a 30 s window is exactly 3001 frames
    # (the pipeline drops the last one), so the +1 keeps full windows from
    # spilling into the next bucket.
    n_bucketed = max(1, -(-max(n_valid - 1, 1) // bucket_frames)) * bucket_frames + 1
    total_samples = n_bucketed * hop_length
    buf = np.zeros(total_samples, dtype=np.float32)
    buf[: len(waveform)] = waveform

    out = _log_mel_impl(
        jnp.asarray(buf),
        jnp.asarray(n_valid, dtype=jnp.int32),
        mel_filters,
        cos_basis,
        sin_basis,
        n_fft,
        hop_length,
    )
    return out[:, :n_valid]
