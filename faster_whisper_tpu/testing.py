"""Hermetic test/bench helpers.

This environment has no network egress, so the real Whisper vocabularies
(tokenizer.json from the HF Hub) may be unavailable.  ``build_synthetic_tokenizer``
constructs a real ``tokenizers.Tokenizer`` with the exact Whisper
special-token *layout* (eot, sot, 100 language tokens, translate/transcribe,
sot_lm, sot_prev, no_speech, no_timestamps, then 1501 timestamp tokens) over
a byte-level base vocabulary, so every decode-policy code path — suppress
sets, timestamp rules, prompts, word splitting — can be exercised without
downloads.  Token *ids* differ from the production vocabulary; behavior
does not.
"""

from typing import Optional

from faster_whisper_tpu.tokenizer import _LANGUAGE_CODES


def build_synthetic_tokenizer(n_timestamps: int = 1501, base_vocab: int = 256):
    """Build a byte-level tokenizer with the Whisper special-token layout.

    Base vocabulary: the 256 GPT-2 byte symbols (so any text round-trips),
    optionally padded with unused filler entries up to ``base_vocab`` (use
    base_vocab=50257 to reproduce the production large-v3 vocabulary size of
    51866 — important for honest logits-matmul benchmarking), followed by
    the Whisper specials in canonical order.
    """
    from tokenizers import AddedToken, Tokenizer, decoders, pre_tokenizers
    from tokenizers.models import BPE

    byte_alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(byte_alphabet))}
    for i in range(256, base_vocab):
        vocab[f"<unused{i}>"] = i

    tok = Tokenizer(BPE(vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()

    specials = ["<|endoftext|>", "<|startoftranscript|>"]
    specials += ["<|%s|>" % code for code in _LANGUAGE_CODES]
    specials += [
        "<|translate|>",
        "<|transcribe|>",
        "<|startoflm|>",
        "<|startofprev|>",
        "<|nospeech|>",
        "<|notimestamps|>",
    ]
    specials += ["<|%.2f|>" % (0.02 * i) for i in range(n_timestamps)]

    tok.add_special_tokens(
        [AddedToken(s, special=True, normalized=False) for s in specials]
    )
    return tok


def synthetic_vocab_size(n_timestamps: int = 1501, base_vocab: int = 256) -> int:
    return base_vocab + 2 + len(_LANGUAGE_CODES) + 6 + n_timestamps


def build_test_model(seed: int = 0, dtype: str = "float32"):
    """A complete WhisperModel over the micro config + synthetic tokenizer.

    Text output is meaningless (random weights) but every pipeline stage —
    features, encoder, generation, fallback, timestamps, VAD, batching —
    runs exactly as it would with production weights.
    """
    from faster_whisper_tpu.models.config import tiny_test_config
    from faster_whisper_tpu.models.load import random_params
    from faster_whisper_tpu.transcribe import WhisperModel

    config = tiny_test_config()
    params = random_params(config, seed=seed, dtype=dtype)
    return WhisperModel.from_parts(params, config, build_synthetic_tokenizer())


# ---------------------------------------------------------------------------
# CT2 checkpoint serializer (test/validate tooling)
# ---------------------------------------------------------------------------


def _ct2_write_string(buf, s):
    import struct

    raw = s.encode("utf-8")
    buf.write(struct.pack("<H", len(raw) + 1))
    buf.write(raw)
    buf.write(b"\x00")


_CT2_DTYPE_TAGS = {"float32": 0, "int8": 1}


def _ct2_write_var(buf, name, arr):
    import struct

    import numpy as np

    arr = np.ascontiguousarray(arr)
    tag = _CT2_DTYPE_TAGS[arr.dtype.name]
    _ct2_write_string(buf, name)
    buf.write(struct.pack("<B", arr.ndim))
    for d in arr.shape:
        buf.write(struct.pack("<I", d))
    buf.write(struct.pack("<B", tag))
    buf.write(struct.pack("<I", arr.nbytes))
    buf.write(arr.tobytes())


def _ct2_variables(params, config) -> dict:
    """Whisper param tree -> CT2 variable dict (inverse of
    models/load.py::load_ct2_model's name mapping)."""
    import jax
    import numpy as np

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

    return v


def _ct2_serialize(v: dict) -> bytes:
    import io
    import struct

    buf = io.BytesIO()
    buf.write(struct.pack("<I", 6))  # binary version
    _ct2_write_string(buf, "WhisperSpec")
    buf.write(struct.pack("<I", 3))  # revision
    buf.write(struct.pack("<I", len(v)))
    for name, arr in v.items():
        _ct2_write_var(buf, name, arr)
    return buf.getvalue()


def serialize_ct2(params, config) -> bytes:
    """Inverse of models/load.py::load_ct2_model for f32 checkpoints."""
    import numpy as np

    return _ct2_serialize(
        {k: np.asarray(a, np.float32) for k, a in _ct2_variables(params, config).items()}
    )


def serialize_ct2_int8(params, config) -> bytes:
    """An int8 CT2 checkpoint, as the reference hub ships for
    compute_type=int8: every transformer linear weight stored as int8
    with a per-output-row ``weight_scale`` multiplier
    (scale = 127 / amax, dequantization q / scale — the convention
    models/load.py::get implements); convs, embeddings, positions, and
    layernorms stay float32."""
    import numpy as np

    out = {}
    for name, arr in _ct2_variables(params, config).items():
        arr = np.asarray(arr, np.float32)
        if name.endswith("/weight") and ("linear_" in name) and arr.ndim == 2:
            amax = np.maximum(np.abs(arr).max(axis=1), 1e-10)
            scale = 127.0 / amax
            q = np.clip(np.round(arr * scale[:, None]), -127, 127).astype(np.int8)
            out[name] = q
            out[name + "_scale"] = scale.astype(np.float32)
        else:
            out[name] = arr
    return _ct2_serialize(out)
