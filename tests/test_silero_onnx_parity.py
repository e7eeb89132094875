"""Numeric parity of the JAX Silero port against the actual ONNX graph.

The reference executes assets/silero_vad_v6.onnx with onnxruntime
(reference: faster_whisper/vad.py:296-351).  onnxruntime is not available
in hermetic environments, so the independent reference here is a tiny
numpy interpreter that executes the *actual graph* node by node (25 nodes:
Pad/Conv/Slice/Pow/Add/Sqrt/Relu/Transpose/LSTM/Squeeze/Sigmoid/Reshape),
using faster_whisper_tpu's own protobuf walker only for deserialization.
If the hand-written JAX model (models/silero.py) misreads the graph —
gate order, padding, frame offsets, state layout — this disagrees.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from faster_whisper_tpu.models.onnx_reader import read_onnx_graph  # noqa: E402
from faster_whisper_tpu.models.silero import default_silero_path  # noqa: E402


def _conv1d(x, w, b, stride, pads):
    # x (N, C, W), w (O, I, k): ONNX Conv, symmetric spatial pads.
    x = np.pad(x, ((0, 0), (0, 0), (pads[0], pads[1])))
    k = w.shape[2]
    windows = np.lib.stride_tricks.sliding_window_view(x, k, axis=2)
    windows = windows[:, :, ::stride, :]  # (N, I, T, k)
    out = np.einsum("nitk,oik->not", windows, w)
    if b is not None:
        out = out + b[None, :, None]
    return out


def _lstm_iofc(x, w, r, b, h0, c0):
    # ONNX LSTM, forward, iofc gate order.
    # x (T, B, I); w (1, 4H, I); r (1, 4H, H); b (1, 8H); h0/c0 (1, B, H).
    w, r, b = w[0], r[0], b[0]
    hidden = r.shape[1]
    wb, rb = b[:4 * hidden], b[4 * hidden:]
    h, c = h0[0], c0[0]
    ys = []
    for t in range(x.shape[0]):
        gates = x[t] @ w.T + h @ r.T + wb + rb  # (B, 4H)
        i, o, f, g = np.split(gates, 4, axis=1)
        i = 1.0 / (1.0 + np.exp(-i))
        o = 1.0 / (1.0 + np.exp(-o))
        f = 1.0 / (1.0 + np.exp(-f))
        c = f * c + i * np.tanh(g)
        h = o * np.tanh(c)
        ys.append(h)
    y = np.stack(ys)[:, None, :, :]  # (T, 1, B, H)
    return y, h[None], c[None]


def eval_onnx_graph(path, feeds):
    """Execute the graph in numpy; returns {output_name: array}."""
    nodes, inits, in_names, out_names = read_onnx_graph(path)
    env = {k: np.asarray(v, dtype=v.dtype) for k, v in inits.items()}
    env.update({k: np.asarray(v) for k, v in feeds.items()})

    for node in nodes:
        ins = [env[name] if name else None for name in node.inputs]
        op = node.op_type
        if op == "Pad":
            pads = ins[1].astype(int)
            rank = ins[0].ndim
            widths = [(pads[d], pads[d + rank]) for d in range(rank)]
            out = np.pad(ins[0], widths, mode=node.attrs.get("mode", "constant"))
        elif op == "Unsqueeze":
            out = ins[0]
            for ax in sorted(ins[1].astype(int).tolist()):
                out = np.expand_dims(out, ax)
        elif op == "Squeeze":
            out = ins[0]
            for ax in sorted(ins[1].astype(int).tolist(), reverse=True):
                out = np.squeeze(out, ax)
        elif op == "Conv":
            stride = node.attrs.get("strides", [1])[0]
            pads = node.attrs.get("pads", [0, 0])
            bias = ins[2] if len(ins) > 2 else None
            out = _conv1d(ins[0], ins[1], bias, stride, pads)
        elif op == "Slice":
            starts, ends = ins[1].astype(int), ins[2].astype(int)
            axes = ins[3].astype(int)
            steps = ins[4].astype(int) if len(ins) > 4 else np.ones_like(axes)
            sl = [slice(None)] * ins[0].ndim
            for st, en, ax, sp in zip(starts, ends, axes, steps):
                sl[ax] = slice(st, None if en >= 2**31 else en, sp)
            out = ins[0][tuple(sl)]
        elif op == "Pow":
            out = ins[0] ** ins[1]
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Sqrt":
            out = np.sqrt(ins[0])
        elif op == "Relu":
            out = np.maximum(ins[0], 0)
        elif op == "Sigmoid":
            out = 1.0 / (1.0 + np.exp(-ins[0]))
        elif op == "Transpose":
            out = np.transpose(ins[0], node.attrs["perm"])
        elif op == "Reshape":
            out = ins[0].reshape(ins[1].astype(int).tolist())
        elif op == "LSTM":
            y, hn, cn = _lstm_iofc(ins[0], ins[1], ins[2], ins[3], ins[5], ins[6])
            env[node.outputs[0]] = y
            env[node.outputs[1]] = hn
            env[node.outputs[2]] = cn
            continue
        else:  # pragma: no cover
            raise NotImplementedError(op)
        env[node.outputs[0]] = out

    return {name: env[name] for name in out_names}


def _windows_576(audio):
    """(N*512,) audio -> (N, 576) windows with the 64-sample rolled context,
    exactly as the reference builds them (vad.py:326-335)."""
    windows = audio.reshape(-1, 512)
    context = np.concatenate(
        [np.zeros((1, 64), np.float32), windows[:-1, -64:]], axis=0
    )
    return np.concatenate([context, windows], axis=1).astype(np.float32)


@pytest.fixture(scope="module")
def test_audio():
    from faster_whisper_tpu.audio import decode_audio

    path = "/root/reference/tests/data/jfk.flac"
    if os.path.exists(path):
        audio = decode_audio(path, sampling_rate=16000)
    else:
        audio = np.zeros(16000 * 4, np.float32)
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(16000 * 2) * 0.05).astype(np.float32)
    silence = np.zeros(16000, np.float32)
    audio = np.concatenate([audio[: 16000 * 5], noise, silence])
    n = len(audio) // 512 * 512
    audio = audio[:n]
    # snap to the int16 grid the device transport uses, so the two
    # implementations see bit-identical inputs
    return np.clip(np.round(audio * 32768.0), -32768, 32767) / np.float32(32768.0)


def test_jax_silero_matches_onnx_graph(test_audio):
    from faster_whisper_tpu.models.silero import SileroVAD

    onnx_path = default_silero_path()
    windows = _windows_576(test_audio)
    ref = eval_onnx_graph(
        onnx_path,
        {
            "input": windows,
            "h": np.zeros((1, 1, 128), np.float32),
            "c": np.zeros((1, 1, 128), np.float32),
        },
    )["speech_probs"].reshape(-1)

    ours = SileroVAD()(test_audio)

    assert ref.shape == ours.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)
    # the audio mixes speech, noise and silence: probs must actually swing
    assert ref.max() > 0.5 and ref.min() < 0.2


def test_onnx_graph_state_chunking_is_equivalent(test_audio):
    """Carrying h/c across two chunked calls equals one call (the
    reference relies on this when batching 10000 windows per ORT call,
    vad.py:339-349)."""
    onnx_path = default_silero_path()
    windows = _windows_576(test_audio)
    one = eval_onnx_graph(
        onnx_path,
        {
            "input": windows,
            "h": np.zeros((1, 1, 128), np.float32),
            "c": np.zeros((1, 1, 128), np.float32),
        },
    )
    half = windows.shape[0] // 2
    first = eval_onnx_graph(
        onnx_path,
        {
            "input": windows[:half],
            "h": np.zeros((1, 1, 128), np.float32),
            "c": np.zeros((1, 1, 128), np.float32),
        },
    )
    second = eval_onnx_graph(
        onnx_path,
        {"input": windows[half:], "h": first["hn"], "c": first["cn"]},
    )
    chunked = np.concatenate(
        [first["speech_probs"].reshape(-1), second["speech_probs"].reshape(-1)]
    )
    np.testing.assert_allclose(one["speech_probs"].reshape(-1), chunked, atol=1e-6)


def test_jax_silero_matches_onnxruntime(test_audio):
    """Auto-runs whenever onnxruntime is importable (it is not in the
    hermetic build image): the JAX port vs ORT's own kernels executing
    the bundled graph — the exact engine the reference uses
    (faster_whisper/vad.py:296-351).  Complements the numpy-interpreter
    tests above with the real runtime."""
    ort = pytest.importorskip("onnxruntime")
    if not hasattr(ort, "InferenceSession"):
        # test_reference_parity injects an empty stand-in module so the
        # reference package imports; that is not a usable runtime
        pytest.skip("onnxruntime in sys.modules is a test stub")

    from faster_whisper_tpu.models.silero import SileroVAD

    opts = ort.SessionOptions()
    opts.inter_op_num_threads = 1
    opts.intra_op_num_threads = 1
    opts.log_severity_level = 4
    session = ort.InferenceSession(
        default_silero_path(),
        providers=["CPUExecutionProvider"],
        sess_options=opts,
    )
    windows = _windows_576(test_audio)
    ref = session.run(
        None,
        {
            "input": windows,
            "h": np.zeros((1, 1, 128), np.float32),
            "c": np.zeros((1, 1, 128), np.float32),
        },
    )[0].reshape(-1)

    ours = SileroVAD()(test_audio)
    assert ref.shape == ours.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)
