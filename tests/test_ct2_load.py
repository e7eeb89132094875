"""Round-trip test of the CTranslate2 checkpoint reader.

Serializes a miniature Whisper checkpoint in the CT2 binary format (the
same layout read_ct2_variables parses), loads it through the public
``WhisperModel(files=...)`` in-memory path, and checks the loaded model
computes the same encoder states as the source parameter tree."""

import io
import json
import struct

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


from faster_whisper_tpu.testing import (  # noqa: E402
    serialize_ct2,
    serialize_ct2_int8,
)


def _write_string(buf, s):
    raw = s.encode("utf-8")
    buf.write(struct.pack("<H", len(raw) + 1))
    buf.write(raw)
    buf.write(b"\x00")


def _write_var(buf, name, arr):
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    _write_string(buf, name)
    buf.write(struct.pack("<B", arr.ndim))
    for d in arr.shape:
        buf.write(struct.pack("<I", d))
    buf.write(struct.pack("<B", 0))  # dtype tag 0 = float32
    buf.write(struct.pack("<I", arr.nbytes))
    buf.write(arr.tobytes())



def test_ct2_roundtrip_in_memory():
    from faster_whisper_tpu.models import model as M
    from faster_whisper_tpu.models.config import tiny_test_config
    from faster_whisper_tpu.models.load import random_params
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.transcribe import WhisperModel

    cfg = tiny_test_config()
    params = random_params(cfg, dtype="float32")
    blob = serialize_ct2(params, cfg)

    ct2_config = json.dumps(
        {"attention_heads": cfg.n_text_head, "alignment_heads": [[1, 0], [1, 1]]}
    ).encode()

    tok_buffer = build_synthetic_tokenizer().to_str().encode()

    model = WhisperModel(
        "in-memory-test",
        compute_type="float32",
        files={
            "model.bin": blob,
            "config.json": ct2_config,
            "tokenizer.json": tok_buffer,
        },
    )
    assert model.model.config.n_audio_layer == cfg.n_audio_layer
    assert model.model.config.n_vocab == cfg.n_vocab
    assert model.model.config.alignment_heads == ((1, 0), (1, 1))

    # loaded weights must reproduce the source model's encoder states
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 80, 3000), dtype=np.float32)
    )
    want = np.asarray(M.encode(params, cfg, mel))
    got = np.asarray(model.model.encode(mel))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_ct2_parser_dtype_validation():
    from faster_whisper_tpu.models.load import read_ct2_variables

    buf = io.BytesIO()
    buf.write(struct.pack("<I", 6))
    _write_string(buf, "WhisperSpec")
    buf.write(struct.pack("<I", 3))
    buf.write(struct.pack("<I", 1))
    _write_var(buf, "some/variable", np.arange(6, dtype=np.float32).reshape(2, 3))
    out = read_ct2_variables(buf.getvalue())
    np.testing.assert_array_equal(
        out["some/variable"], np.arange(6, dtype=np.float32).reshape(2, 3)
    )


def _write_var_typed(buf, name, arr, tag):
    arr = np.ascontiguousarray(arr)
    _write_string(buf, name)
    buf.write(struct.pack("<B", arr.ndim))
    for d in arr.shape:
        buf.write(struct.pack("<I", d))
    buf.write(struct.pack("<B", tag))
    buf.write(struct.pack("<I", arr.nbytes))
    buf.write(arr.tobytes())


def test_ct2_int8_weights_dequantize():
    """int8 CT2 checkpoints store weight (int8) + weight_scale
    (per-output-channel f32); the loader must dequantize them
    (reference ships such models for compute_type=int8)."""
    from faster_whisper_tpu.models.load import read_ct2_variables

    rng = np.random.default_rng(0)
    w = rng.standard_normal((6, 4)).astype(np.float32)
    # CT2 convention: weight_scale = 127 / amax (a multiplier), so
    # dequantization is q / scale — what models/load.py::get implements.
    scale = 127.0 / np.abs(w).max(axis=1)
    q = np.clip(np.round(w * scale[:, None]), -127, 127).astype(np.int8)

    buf = io.BytesIO()
    buf.write(struct.pack("<I", 6))
    _write_string(buf, "WhisperSpec")
    buf.write(struct.pack("<I", 3))
    buf.write(struct.pack("<I", 2))
    _write_var_typed(buf, "encoder/layer_0/ffn/linear_0/weight", q, 1)
    _write_var_typed(buf, "encoder/layer_0/ffn/linear_0/weight_scale", scale, 0)
    out = read_ct2_variables(buf.getvalue())

    got_q = out["encoder/layer_0/ffn/linear_0/weight"]
    assert got_q.dtype == np.int8
    deq = got_q.astype(np.float32) / out[
        "encoder/layer_0/ffn/linear_0/weight_scale"
    ].astype(np.float32).reshape(-1, 1)
    np.testing.assert_allclose(deq, w, atol=np.abs(w).max() / 127.0 + 1e-6)


def test_ct2_f16_and_bf16_variables():
    from faster_whisper_tpu.models.load import read_ct2_variables

    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 5)).astype(np.float32)

    buf = io.BytesIO()
    buf.write(struct.pack("<I", 6))
    _write_string(buf, "WhisperSpec")
    buf.write(struct.pack("<I", 3))
    buf.write(struct.pack("<I", 2))
    _write_var_typed(buf, "a/weight", w.astype(np.float16), 4)
    bf16_bits = (w.view(np.uint32) >> 16).astype("<u2")
    _write_var_typed(buf, "b/weight", bf16_bits, 5)
    out = read_ct2_variables(buf.getvalue())

    np.testing.assert_allclose(out["a/weight"].astype(np.float32), w, atol=2e-3)
    np.testing.assert_allclose(out["b/weight"], 
                               (bf16_bits.astype(np.uint32) << 16).view(np.float32))


def test_ct2_int8_dir_roundtrip_full():
    """A COMPLETE int8 CT2 checkpoint (every linear as weight +
    weight_scale, the form the hub ships for compute_type=int8) must load
    through the public WhisperModel path with compute_type='int8' and
    both reproduce the source encoder within int8 tolerance and run a
    transcription end to end — the first thing a downloaded int8
    model.bin hits (reference: faster_whisper/transcribe.py:689-698 with
    compute_type='int8')."""
    from faster_whisper_tpu.models import model as M
    from faster_whisper_tpu.models.config import tiny_test_config
    from faster_whisper_tpu.models.load import random_params
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.transcribe import WhisperModel

    cfg = tiny_test_config()
    params = random_params(cfg, dtype="float32")
    blob = serialize_ct2_int8(params, cfg)

    ct2_config = json.dumps(
        {"attention_heads": cfg.n_text_head, "alignment_heads": [[1, 0], [1, 1]]}
    ).encode()
    model = WhisperModel(
        "in-memory-int8-test",
        compute_type="int8",
        files={
            "model.bin": blob,
            "config.json": ct2_config,
            "tokenizer.json": build_synthetic_tokenizer().to_str().encode(),
        },
    )

    # engine must be int8-quantized (W8A8), not dequantized-to-float
    from faster_whisper_tpu.ops.quant import QuantizedLinear

    assert isinstance(
        model.model.params["decoder"]["layers"]["mlp"]["w1"], QuantizedLinear
    )

    # encoder states: source f32 tree vs load(int8 dir)+requantize —
    # two int8 roundtrips of error, bounded loosely
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, cfg.n_mels, 3000), dtype=np.float32)
    )
    want = np.asarray(M.encode(params, cfg, mel), np.float32)
    got = np.asarray(model.model.encode(mel), np.float32)
    denom = np.maximum(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / denom < 0.08, (
        np.abs(got - want).max(), denom
    )

    # end-to-end transcribe smoke on the loaded int8 model
    audio = np.random.default_rng(2).standard_normal(16000 * 3).astype(np.float32) * 0.1
    segments, _ = model.transcribe(audio, language="en", beam_size=2, max_new_tokens=8)
    for s in segments:
        assert s.end >= s.start
