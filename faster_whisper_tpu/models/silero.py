"""Silero VAD v6 in JAX.

TPU-native replacement for the onnxruntime execution of the bundled
silero_vad_v6.onnx (reference: faster_whisper/vad.py:295-351).  The weights
are extracted once from the ONNX file with our minimal protobuf reader; the
graph (verified against the ONNX node list) is:

    input (N, 576 = 64 context + 512 samples)
      -> reflect-pad 128 both sides                      (N, 832)
      -> STFT as conv: basis (258, 256), stride 128      (N, 258, 5)
      -> drop first frame, magnitude over 129 bins       (N, 129, 4)
      -> Conv(129->128, k3 s1 p1) + ReLU                 (N, 128, 4)
      -> Conv(128->64,  k3 s2 p1) + ReLU                 (N, 64, 2)
      -> Conv(64->64,   k3 s2 p1) + ReLU                 (N, 64, 1)
      -> Conv(64->128,  k3 s1 p1) + ReLU                 (N, 128, 1)
      -> LSTM(128) scanned ACROSS WINDOWS (the window axis is the LSTM's
         time axis; onnxruntime exploits the same trick by carrying h/c
         across batched calls, reference: vad.py:339-349)
      -> ReLU -> Linear(128->1) -> sigmoid               (N,)

The conv tower is embarrassingly parallel across windows (one big NWC conv
batch on the MXU); only the 128-wide LSTM is sequential, as a lax.scan.
"""

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_WINDOW = 512
_CONTEXT = 64

VAD_WINDOW_BUCKET = 2048  # window-count program bucket


def vad_window_bucket_windows(n_windows: int) -> int:
    """The padded window count the VAD program will see for ``n_windows``
    real windows.  Exported so precompile.warm_parallel computes the SAME
    buckets as production (the zero-new-compiles warm contract)."""
    return max(
        VAD_WINDOW_BUCKET,
        -(-n_windows // VAD_WINDOW_BUCKET) * VAD_WINDOW_BUCKET,
    )


def vad_window_bucket(n_samples: int) -> int:
    """Padded window count for ``n_samples`` of audio as
    get_speech_timestamps prepares it: the pad there is
    ``512 - n % 512``, which adds a WHOLE extra window when n_samples is
    already a multiple of 512 (reference semantics, vad.py) — warm code
    that forgets the +1 compiles a dead bucket at exact multiples."""
    n_windows = n_samples // _WINDOW + 1
    return vad_window_bucket_windows(n_windows)


def load_silero_weights(onnx_path: Optional[str] = None) -> dict:
    """Load the Silero v6 weights.

    Prefers the converted .npz bundled with this package; falls back to
    extracting from a silero_vad_v6.onnx (e.g. from a faster-whisper
    installation) with our minimal protobuf reader.
    """
    if onnx_path is None:
        npz = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets",
            "silero_vad_v6.npz",
        )
        if os.path.exists(npz):
            data = np.load(npz)
            return {k: jnp.asarray(data[k], dtype=jnp.float32) for k in data.files}

    from faster_whisper_tpu.models.onnx_reader import read_onnx_initializers

    if onnx_path is None:
        onnx_path = default_silero_path()
    raw = read_onnx_initializers(onnx_path)

    w = {
        "stft_basis": raw["encoder.feature_extractor.forward_basis_buffer"][:, 0, :],
        # torch Conv1d (out, in, k) -> NWC kernels (k, in, out)
        "conv0_w": raw["encoder.conv_layers.0.weight"].transpose(2, 1, 0),
        "conv0_b": raw["encoder.conv_layers.0.bias"],
        "conv1_w": raw["encoder.conv_layers.1.weight"].transpose(2, 1, 0),
        "conv1_b": raw["encoder.conv_layers.1.bias"],
        "conv2_w": raw["encoder.conv_layers.2.weight"].transpose(2, 1, 0),
        "conv2_b": raw["encoder.conv_layers.2.bias"],
        "conv3_w": raw["encoder.conv_layers.3.weight"].transpose(2, 1, 0),
        "conv3_b": raw["encoder.conv_layers.3.bias"],
        # ONNX LSTM: W (1, 4H, I), R (1, 4H, H), B (1, 8H) with iofc gates
        "lstm_w": raw["onnx::LSTM_209"][0],
        "lstm_r": raw["onnx::LSTM_210"][0],
        "lstm_b": raw["onnx::LSTM_211"][0],
        "out_w": raw["decoder.conv1d.weight"][:, :, 0],  # (1, 128)
        "out_b": raw["decoder.conv1d.bias"],
    }
    return {k: jnp.asarray(v, dtype=jnp.float32) for k, v in w.items()}


def default_silero_path() -> str:
    """Locate a silero_vad_v6.onnx asset: our package assets dir first,
    falling back to a faster-whisper installation's bundled copy."""
    here = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        "silero_vad_v6.onnx",
    )
    if os.path.exists(here):
        return here
    for candidate in (
        "/root/reference/faster_whisper/assets/silero_vad_v6.onnx",
    ):
        if os.path.exists(candidate):
            return candidate
    try:
        import faster_whisper

        return os.path.join(
            os.path.dirname(faster_whisper.__file__), "assets", "silero_vad_v6.onnx"
        )
    except ImportError:
        pass
    raise FileNotFoundError(
        "silero_vad_v6.onnx not found; place it under faster_whisper_tpu/assets/"
    )


@functools.partial(jax.jit, static_argnames=())
def _vad_forward_audio(weights: dict, audio: jax.Array) -> jax.Array:
    """audio: (N*512,) f32 -> speech probabilities (N,) f32.

    The 576-sample windows (64-sample context + 512 new samples) are
    built on device with reshape/slice/concat only: uploading raw audio
    instead of pre-stacked overlapping windows cuts the host->device
    transfer 4.5x, which dominates VAD wall-clock on tunneled TPUs.
    """
    windows = audio.reshape(-1, _WINDOW)  # (N, 512)
    context = jnp.concatenate(
        [
            jnp.zeros((1, _CONTEXT), windows.dtype),
            windows[:-1, -_CONTEXT:],
        ],
        axis=0,
    )
    return _vad_forward(weights, jnp.concatenate([context, windows], axis=1))


@functools.partial(jax.jit, static_argnames=())
def _vad_forward(weights: dict, windows: jax.Array) -> jax.Array:
    """windows: (N, 576) f32 -> speech probabilities (N,) f32.

    Runs at HIGHEST matmul precision: with the TPU default (bf16-rounded
    f32 matmuls) the probabilities drift up to ~0.4 from the ONNX
    reference over the LSTM recurrence — enough to flip hysteresis
    decisions near the 0.5/0.35 thresholds — while exact f32 costs only
    ~5% of VAD time (~40 ms per 13 min of audio, measured on v5e).
    Parity is pinned by tests/test_silero_onnx_parity.py.
    """
    with jax.default_matmul_precision("highest"):
        return _vad_forward_impl(weights, windows)


def _vad_forward_impl(weights: dict, windows: jax.Array) -> jax.Array:
    zeros = jnp.zeros(128, jnp.float32)
    return _vad_forward_core(weights, windows, zeros, zeros)[0]


def _vad_forward_core(
    weights: dict, windows: jax.Array, h0: jax.Array, c0: jax.Array
):
    """(N, 576) windows + LSTM state -> (probs (N,), h, c).

    The state-threading form of the forward: the pipelined sliced upload
    (vad.upload_with_vad) chains it across UPLOAD_BUCKET slices, and the
    classic whole-buffer paths call it with zero state.  Per-window math
    is identical either way, so slice-chained probabilities are bitwise
    equal to the one-shot forward (pinned by tests/test_vad.py).
    """
    n = windows.shape[0]

    x = jnp.pad(windows, ((0, 0), (128, 128)), mode="reflect")  # (N, 832)

    # STFT frames at offsets 128..512 (frame 0 is dropped by the graph) —
    # four static slices, not a gather (a (N, 832) gather of this shape
    # lowers poorly on TPU).
    frames = jnp.stack(
        [x[:, s : s + 256] for s in (128, 256, 384, 512)], axis=1
    )  # (N, 4, 256)

    spec = jnp.einsum(
        "nfs,cs->nfc",
        frames,
        weights["stft_basis"],
        preferred_element_type=jnp.float32,
    )  # (N, 4, 258)
    real, imag = spec[..., :129], spec[..., 129:]
    mag = jnp.sqrt(real * real + imag * imag)  # (N, 4, 129) NWC

    # The k=3 conv tower runs as batched im2col matmuls: at W=4 and
    # C=129/128 the general conv lowering is latency/layout-bound on TPU
    # (~0.8 s per 13 min of audio, half the VAD wall-clock); three static
    # slices + one (N, W_out, 3C) x (3C, C_out) matmul per layer is the
    # MXU-shaped formulation of the same arithmetic.
    def conv_k3(h, w, b, out_pos):
        """h (N, W, C); w (3, C, Cout); out_pos: each output's window
        start in the zero-padded (W+2) axis (stride folded in here)."""
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
        cols = jnp.stack(
            [
                jnp.concatenate(
                    [hp[:, p, :], hp[:, p + 1, :], hp[:, p + 2, :]], axis=-1
                )
                for p in out_pos
            ],
            axis=1,
        )  # (N, W_out, 3C)
        wmat = jnp.concatenate([w[0], w[1], w[2]], axis=0)  # (3C, Cout)
        y = jnp.einsum(
            "nwc,co->nwo", cols, wmat, preferred_element_type=jnp.float32
        )
        return jax.nn.relu(y + b)

    h = conv_k3(mag, weights["conv0_w"], weights["conv0_b"], (0, 1, 2, 3))
    h = conv_k3(h, weights["conv1_w"], weights["conv1_b"], (0, 2))  # s=2
    h = conv_k3(h, weights["conv2_w"], weights["conv2_b"], (0,))  # s=2
    # conv3 is k3 s1 p1 at W=1: only the center tap sees data
    feat = jax.nn.relu(
        jnp.einsum(
            "nc,co->no",
            h[:, 0, :],
            weights["conv3_w"][1],
            preferred_element_type=jnp.float32,
        )
        + weights["conv3_b"]
    )  # (N, 128)

    # LSTM across the window sequence (iofc gate order, ONNX semantics).
    wi = weights["lstm_w"]  # (512, 128)
    ri = weights["lstm_r"]  # (512, 128)
    b = weights["lstm_b"]  # (1024,)
    bias = b[:512] + b[512:]
    x_gates = feat @ wi.T + bias  # (N, 512) precomputed input contribution

    # The recurrent matvec runs on the VPU as an exact-f32
    # multiply-reduce over the (128, 512) transposed weights: a
    # (1, 128) x (128, 512) MXU dot sits on the serial dependency chain
    # at full matmul latency per window (x6 under HIGHEST precision),
    # which made the scan ~25 us/window; the VPU form is ~exact f32 with
    # no MXU passes and no latency stall.
    rt = ri.T  # (128, 512), rows reduce over the hidden axis

    def step(carry, xg):
        h, c = carry
        gates = xg + jnp.sum(rt * h[:, None], axis=0)  # (512,)
        i, o, f, g = jnp.split(gates, 4)
        i, o, f = jax.nn.sigmoid(i), jax.nn.sigmoid(o), jax.nn.sigmoid(f)
        c = f * c + i * jnp.tanh(g)
        h = o * jnp.tanh(c)
        return (h, c), h

    # unroll: each scan step is a tiny 128-wide recurrence, so per-step
    # loop overhead dominates on TPU; a deep unroll amortizes it.
    (h_n, c_n), hs = jax.lax.scan(step, (h0, c0), x_gates, unroll=16)  # (N, 128)

    hs = jax.nn.relu(hs)
    probs = jax.nn.sigmoid(hs @ weights["out_w"].T + weights["out_b"])  # (N, 1)
    return probs[:, 0], h_n, c_n


# One pipelined-upload slice == one UPLOAD_BUCKET of PCM (ops/mel.py
# buckets the shared host->device transfer on the same 2048-window grid).
VAD_SLICE_SAMPLES = VAD_WINDOW_BUCKET * _WINDOW


@jax.jit
def _vad_slice_step(
    weights: dict,
    q_slice: jax.Array,  # (VAD_SLICE_SAMPLES,) int16 (or f32 transport)
    tail: jax.Array,  # (64,) f32: last samples of the previous slice
    h: jax.Array,  # (128,) f32 LSTM hidden
    c: jax.Array,  # (128,) f32 LSTM cell
):
    """One UPLOAD_BUCKET slice of the pipelined shared-upload VAD forward.

    Dequantizes the slice, builds its 576-sample context windows (the
    first window's 64-sample context comes from ``tail``), and runs the
    conv tower + LSTM with carried state — so successive slices chain to
    a forward bitwise-equal to the whole-buffer `_vad_forward_audio`
    while each slice's compute overlaps the NEXT slice's host->device
    transfer (vad.upload_with_vad).  Returns
    (probs, new_tail, h, c, audio_f32_slice); the f32 slices, written
    into one buffer via _write_slice, reproduce the exact buffer
    upload_audio would have produced, feeding the device-assembled
    feature path with no second transfer.
    """
    if q_slice.dtype == jnp.int16:
        audio = q_slice.astype(jnp.float32) * (1.0 / 32768.0)
    else:  # FWT_I16_TRANSFER=0: bit-exact float32 transport
        audio = q_slice.astype(jnp.float32)
    windows = audio.reshape(-1, _WINDOW)
    context = jnp.concatenate([tail[None, :], windows[:-1, -_CONTEXT:]], axis=0)
    stacked = jnp.concatenate([context, windows], axis=1)
    with jax.default_matmul_precision("highest"):
        probs, h_n, c_n = _vad_forward_core(weights, stacked, h, c)
    return probs, windows[-1, -_CONTEXT:], h_n, c_n, audio


@jax.jit
def _write_slice(buf: jax.Array, sl: jax.Array, off) -> jax.Array:
    """Write one pipelined-upload slice into the assembled device buffer.

    The offset is a TRACED scalar, so every slice of a given buffer
    length shares ONE program — an n-ary concatenate would instead key a
    fresh XLA program per slice count (unbounded across file durations,
    unwarmable).  Program keys land on the same per-buffer-length grid
    as ops.mel's _dequant_i16.
    """
    return jax.lax.dynamic_update_slice(buf, sl, (off,))


class SileroVAD:
    """Drop-in equivalent of the reference's SileroVADModel
    (reference: faster_whisper/vad.py:316-351): audio (multiple of 512
    samples) -> per-window speech probability, with the 64-sample context
    carried from the previous window."""

    def __init__(self, onnx_path: Optional[str] = None):
        self.weights = load_silero_weights(onnx_path)

    def __call__(
        self,
        audio: np.ndarray,
        num_samples: int = _WINDOW,
        context_size_samples: int = _CONTEXT,
    ) -> np.ndarray:
        assert audio.ndim == 1, "Input should be a 1D array"
        assert audio.shape[0] % num_samples == 0, (
            "Input size should be a multiple of num_samples"
        )
        if num_samples != _WINDOW or context_size_samples != _CONTEXT:
            raise ValueError("Silero v6 runs on 512-sample windows + 64 context")
        n = audio.shape[0] // num_samples

        # Bucket the window count so XLA compiles a handful of programs;
        # windows + rolled context are built on device (see
        # _vad_forward_audio) so only raw audio crosses the host boundary.
        n_pad = vad_window_bucket_windows(n)
        if isinstance(audio, jax.Array):
            # already on device (shared upload): pad there, no transfer.
            # Apply the same int16 grid the host transport uses so both
            # paths yield identical probabilities.
            dev = audio.astype(jnp.float32)
            if os.environ.get("FWT_I16_TRANSFER", "1") != "0":
                dev = (
                    jnp.clip(jnp.round(dev * 32768.0), -32768, 32767) / 32768.0
                )
            if n_pad != n:
                dev = jnp.pad(dev, (0, (n_pad - n) * num_samples))
        else:
            audio = audio.astype(np.float32, copy=False)
            if n_pad != n:
                audio = np.pad(audio, (0, (n_pad - n) * num_samples))

            from faster_whisper_tpu.ops.mel import upload_audio

            dev = upload_audio(audio)

        probs = _vad_forward_audio(self.weights, dev)
        return np.asarray(probs[:n])
