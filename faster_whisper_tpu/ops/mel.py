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

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int) -> np.ndarray:
    """The periodic Hann window used by Whisper: np.hanning(n_fft+1)[:-1]."""
    return np.hanning(n_fft + 1)[:-1].astype(np.float32)


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
    x = jnp.pad(padded, (half, half), mode="reflect")

    n_frames = padded.shape[0] // hop_length  # last frame already dropped
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    )
    frames = x[idx]  # (T, n_fft)

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
