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


def serialize_ct2(params, config) -> bytes:
    """Inverse of models/load.py::load_ct2_model for f32 checkpoints."""
    v = {}
    enc = jax.tree.map(np.asarray, params["encoder"])
    dec = jax.tree.map(np.asarray, params["decoder"])

    v["encoder/conv1/weight"] = enc["conv1_w"].transpose(2, 1, 0)
    v["encoder/conv1/bias"] = enc["conv1_b"]
    v["encoder/conv2/weight"] = enc["conv2_w"].transpose(2, 1, 0)
    v["encoder/conv2/bias"] = enc["conv2_b"]
    v["encoder/position_encodings"] = enc["pos_embed"]
    v["encoder/layer_norm/gamma"] = enc["ln_post_g"]
    v["encoder/layer_norm/beta"] = enc["ln_post_b"]

    L = enc["layers"]
    for i in range(config.n_audio_layer):
        a = {k: val[i] for k, val in L["attn"].items()}
        m = {k: val[i] for k, val in L["mlp"].items()}
        base = f"encoder/layer_{i}"
        v[f"{base}/self_attention/layer_norm/gamma"] = L["ln1_g"][i]
        v[f"{base}/self_attention/layer_norm/beta"] = L["ln1_b"][i]
        v[f"{base}/self_attention/linear_0/weight"] = np.concatenate(
            [a["wq"].T, a["wk"].T, a["wv"].T], axis=0
        )
        v[f"{base}/self_attention/linear_0/bias"] = np.concatenate(
            [a["bq"], np.zeros_like(a["bq"]), a["bv"]]
        )
        v[f"{base}/self_attention/linear_1/weight"] = a["wo"].T
        v[f"{base}/self_attention/linear_1/bias"] = a["bo"]
        v[f"{base}/ffn/layer_norm/gamma"] = L["ln2_g"][i]
        v[f"{base}/ffn/layer_norm/beta"] = L["ln2_b"][i]
        v[f"{base}/ffn/linear_0/weight"] = m["w1"].T
        v[f"{base}/ffn/linear_0/bias"] = m["b1"]
        v[f"{base}/ffn/linear_1/weight"] = m["w2"].T
        v[f"{base}/ffn/linear_1/bias"] = m["b2"]

    v["decoder/embeddings/weight"] = dec["token_embed"]
    v["decoder/position_encodings"] = dec["pos_embed"]
    v["decoder/layer_norm/gamma"] = dec["ln_g"]
    v["decoder/layer_norm/beta"] = dec["ln_b"]

    L = dec["layers"]
    for i in range(config.n_text_layer):
        sa = {k: val[i] for k, val in L["self_attn"].items()}
        ca = {k: val[i] for k, val in L["cross_attn"].items()}
        m = {k: val[i] for k, val in L["mlp"].items()}
        base = f"decoder/layer_{i}"
        v[f"{base}/self_attention/layer_norm/gamma"] = L["ln1_g"][i]
        v[f"{base}/self_attention/layer_norm/beta"] = L["ln1_b"][i]
        v[f"{base}/self_attention/linear_0/weight"] = np.concatenate(
            [sa["wq"].T, sa["wk"].T, sa["wv"].T], axis=0
        )
        v[f"{base}/self_attention/linear_0/bias"] = np.concatenate(
            [sa["bq"], np.zeros_like(sa["bq"]), sa["bv"]]
        )
        v[f"{base}/self_attention/linear_1/weight"] = sa["wo"].T
        v[f"{base}/self_attention/linear_1/bias"] = sa["bo"]
        v[f"{base}/attention/layer_norm/gamma"] = L["ln2_g"][i]
        v[f"{base}/attention/layer_norm/beta"] = L["ln2_b"][i]
        v[f"{base}/attention/linear_0/weight"] = ca["wq"].T
        v[f"{base}/attention/linear_0/bias"] = ca["bq"]
        v[f"{base}/attention/linear_1/weight"] = np.concatenate(
            [ca["wk"].T, ca["wv"].T], axis=0
        )
        v[f"{base}/attention/linear_1/bias"] = np.concatenate(
            [np.zeros_like(ca["bv"]), ca["bv"]]
        )
        v[f"{base}/attention/linear_2/weight"] = ca["wo"].T
        v[f"{base}/attention/linear_2/bias"] = ca["bo"]
        v[f"{base}/ffn/layer_norm/gamma"] = L["ln3_g"][i]
        v[f"{base}/ffn/layer_norm/beta"] = L["ln3_b"][i]
        v[f"{base}/ffn/linear_0/weight"] = m["w1"].T
        v[f"{base}/ffn/linear_0/bias"] = m["b1"]
        v[f"{base}/ffn/linear_1/weight"] = m["w2"].T
        v[f"{base}/ffn/linear_1/bias"] = m["b2"]

    buf = io.BytesIO()
    buf.write(struct.pack("<I", 6))  # binary version
    _write_string(buf, "WhisperSpec")
    buf.write(struct.pack("<I", 3))  # revision
    buf.write(struct.pack("<I", len(v)))
    for name, arr in v.items():
        _write_var(buf, name, arr)
    return buf.getvalue()


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
