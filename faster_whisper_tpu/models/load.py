"""Weight loading: HF safetensors, CTranslate2 model.bin, and random init.

The reference consumes CT2 model directories fetched from the Hub
(reference: faster_whisper/utils.py:91-97, transcribe.py:689-698).  We read
the same directories (model.bin + config.json + preprocessor_config.json +
tokenizer.json) *and* native HF Whisper checkpoints (model.safetensors),
mapping either into our stacked-layer pytree:

  encoder:
    conv1_w (3, n_mels, d)  conv1_b (d,)
    conv2_w (3, d, d)       conv2_b (d,)
    pos_embed (1500, d)                      # fixed sinusoids
    layers: ln1_g/ln1_b (L, d)
            attn: wq/wk/wv/wo (L, d, d), bq/bv/bo (L, d)
            ln2_g/ln2_b (L, d)
            mlp: w1 (L, d, 4d), b1 (L, 4d), w2 (L, 4d, d), b2 (L, d)
    ln_post_g/ln_post_b (d,)
  decoder:
    token_embed (V, d)      pos_embed (448, d)   # learned
    layers: ln1 + self_attn, ln2 + cross_attn, ln3 + mlp (same shapes)
    ln_g/ln_b (d,)

All matmul weights are stored (in, out) so forward passes are plain
``x @ w`` (torch Linear stores (out, in); we transpose at load).
"""

import json
import os
import struct

from typing import Dict, Optional, Tuple

import numpy as np

from faster_whisper_tpu.models.config import CONFIGS, WhisperConfig, config_from_dims


# ---------------------------------------------------------------------------
# Random initialization (tests, benchmarks; no-network environments)
# ---------------------------------------------------------------------------


def param_shapes(config: WhisperConfig):
    """Pytree of (shape, kind) describing the full parameter structure;
    kind is 'w' (random-normal), 'zero', 'one', or 'sinusoid'."""
    d = config.n_audio_state
    dd = config.n_text_state
    Le, Ld = config.n_audio_layer, config.n_text_layer

    def attn(L, dim):
        return {
            "wq": ((L, dim, dim), "w"),
            "bq": ((L, dim), "zero"),
            "wk": ((L, dim, dim), "w"),
            "wv": ((L, dim, dim), "w"),
            "bv": ((L, dim), "zero"),
            "wo": ((L, dim, dim), "w"),
            "bo": ((L, dim), "zero"),
        }

    def mlp(L, dim):
        return {
            "w1": ((L, dim, 4 * dim), "w"),
            "b1": ((L, 4 * dim), "zero"),
            "w2": ((L, 4 * dim, dim), "w"),
            "b2": ((L, dim), "zero"),
        }

    return {
        "encoder": {
            "conv1_w": ((3, config.n_mels, d), "w"),
            "conv1_b": ((d,), "zero"),
            "conv2_w": ((3, d, d), "w"),
            "conv2_b": ((d,), "zero"),
            "pos_embed": ((config.n_audio_ctx, d), "sinusoid"),
            "layers": {
                "ln1_g": ((Le, d), "one"),
                "ln1_b": ((Le, d), "zero"),
                "attn": attn(Le, d),
                "ln2_g": ((Le, d), "one"),
                "ln2_b": ((Le, d), "zero"),
                "mlp": mlp(Le, d),
            },
            "ln_post_g": ((d,), "one"),
            "ln_post_b": ((d,), "zero"),
        },
        "decoder": {
            "token_embed": ((config.n_vocab, dd), "w"),
            "pos_embed": ((config.n_text_ctx, dd), "w"),
            "layers": {
                "ln1_g": ((Ld, dd), "one"),
                "ln1_b": ((Ld, dd), "zero"),
                "self_attn": attn(Ld, dd),
                "ln2_g": ((Ld, dd), "one"),
                "ln2_b": ((Ld, dd), "zero"),
                "cross_attn": attn(Ld, dd),
                "ln3_g": ((Ld, dd), "one"),
                "ln3_b": ((Ld, dd), "zero"),
                "mlp": mlp(Ld, dd),
            },
            "ln_g": ((dd,), "one"),
            "ln_b": ((dd,), "zero"),
        },
    }


def _is_shape_leaf(x):
    return (
        isinstance(x, tuple)
        and len(x) == 2
        and isinstance(x[0], tuple)
        and isinstance(x[1], str)
    )


def random_params_device(config: WhisperConfig, seed: int = 0, dtype="bfloat16"):
    """On-device random init — fast for large models (no host RNG loop).

    All random leaves are carved out of ONE flat jax.random.normal buffer:
    a single threefry op plus slices/reshapes keeps the HLO tiny, which
    matters on backends where compilation is expensive (a per-leaf fold_in
    program took ~8 minutes to compile through the axon relay)."""
    import jax
    import jax.numpy as jnp

    from faster_whisper_tpu.models.model import sinusoids
    from faster_whisper_tpu.utils import enable_compilation_cache

    # The init program below is the first compile of a fresh process in
    # bench/precompile flows, which build params BEFORE WhisperModel
    # enables the cache — enable it here so the init program is cached
    # too (measured ~10 s of cold start otherwise).
    enable_compilation_cache()

    shapes = param_shapes(config)
    leaves, treedef = jax.tree.flatten(shapes, is_leaf=_is_shape_leaf)

    total_w = sum(
        int(np.prod(shape)) for shape, kind in leaves if kind == "w"
    )

    @jax.jit
    def init(key):
        flat = jax.random.normal(key, (total_w,), jnp.float32) * 0.02
        out = []
        off = 0
        for shape, kind in leaves:
            n = int(np.prod(shape))
            if kind == "w":
                out.append(
                    jax.lax.dynamic_slice_in_dim(flat, off, n).reshape(shape).astype(dtype)
                )
                off += n
            elif kind == "one":
                out.append(jnp.ones(shape, dtype))
            else:  # zero / sinusoid (overwritten below)
                out.append(jnp.zeros(shape, dtype))
        return out

    arrs = init(jax.random.PRNGKey(seed))
    params = jax.tree.unflatten(treedef, arrs)
    params["encoder"]["pos_embed"] = jnp.asarray(
        sinusoids(config.n_audio_ctx, config.n_audio_state), dtype=dtype
    )
    return params


def abstract_params(config: WhisperConfig, dtype="bfloat16"):
    """Pytree of ShapeDtypeStruct (for AOT lowering / sharding planning)."""
    import jax

    shapes = param_shapes(config)
    return jax.tree.map(
        lambda leaf: jax.ShapeDtypeStruct(leaf[0], dtype),
        shapes,
        is_leaf=_is_shape_leaf,
    )


def random_params(config: WhisperConfig, seed: int = 0, dtype="bfloat16"):
    """Random-normal weights with the exact production structure."""
    import jax

    rng = np.random.default_rng(seed)
    d = config.n_audio_state
    dd = config.n_text_state
    scale = 0.02

    def w(*shape):
        return rng.standard_normal(shape, dtype=np.float32) * scale

    def zeros(*shape):
        return np.zeros(shape, dtype=np.float32)

    def attn_block(L, dim):
        return {
            "wq": w(L, dim, dim),
            "bq": zeros(L, dim),
            "wk": w(L, dim, dim),
            "wv": w(L, dim, dim),
            "bv": zeros(L, dim),
            "wo": w(L, dim, dim),
            "bo": zeros(L, dim),
        }

    def mlp_block(L, dim):
        return {
            "w1": w(L, dim, 4 * dim),
            "b1": zeros(L, 4 * dim),
            "w2": w(L, 4 * dim, dim),
            "b2": zeros(L, dim),
        }

    from faster_whisper_tpu.models.model import sinusoids

    Le, Ld = config.n_audio_layer, config.n_text_layer
    params = {
        "encoder": {
            "conv1_w": w(3, config.n_mels, d),
            "conv1_b": zeros(d),
            "conv2_w": w(3, d, d),
            "conv2_b": zeros(d),
            "pos_embed": sinusoids(config.n_audio_ctx, d).astype(np.float32),
            "layers": {
                "ln1_g": np.ones((Le, d), np.float32),
                "ln1_b": zeros(Le, d),
                "attn": attn_block(Le, d),
                "ln2_g": np.ones((Le, d), np.float32),
                "ln2_b": zeros(Le, d),
                "mlp": mlp_block(Le, d),
            },
            "ln_post_g": np.ones(d, np.float32),
            "ln_post_b": zeros(d),
        },
        "decoder": {
            "token_embed": w(config.n_vocab, dd),
            "pos_embed": w(config.n_text_ctx, dd),
            "layers": {
                "ln1_g": np.ones((Ld, dd), np.float32),
                "ln1_b": zeros(Ld, dd),
                "self_attn": attn_block(Ld, dd),
                "ln2_g": np.ones((Ld, dd), np.float32),
                "ln2_b": zeros(Ld, dd),
                "cross_attn": attn_block(Ld, dd),
                "ln3_g": np.ones((Ld, dd), np.float32),
                "ln3_b": zeros(Ld, dd),
                "mlp": mlp_block(Ld, dd),
            },
            "ln_g": np.ones(dd, np.float32),
            "ln_b": zeros(dd),
        },
    }

    jdtype = dtype
    return jax.tree.map(lambda a: jax.numpy.asarray(a, dtype=jdtype), params)


# ---------------------------------------------------------------------------
# HF safetensors checkpoints
# ---------------------------------------------------------------------------


def _stack(arrs):
    return np.stack(arrs, axis=0)


def load_hf_safetensors(model_dir: str, dtype="bfloat16"):
    """Load a transformers-format Whisper checkpoint
    (model.safetensors + config.json)."""
    import jax
    from safetensors.numpy import load_file

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)

    config = config_from_dims(
        n_mels=hf_cfg["num_mel_bins"],
        n_audio_state=hf_cfg["d_model"],
        n_audio_head=hf_cfg["encoder_attention_heads"],
        n_audio_layer=hf_cfg["encoder_layers"],
        n_text_state=hf_cfg["d_model"],
        n_text_head=hf_cfg["decoder_attention_heads"],
        n_text_layer=hf_cfg["decoder_layers"],
        n_vocab=hf_cfg["vocab_size"],
        name=os.path.basename(model_dir.rstrip("/")),
        alignment_heads=_hf_alignment_heads(model_dir, hf_cfg),
    )

    tensors = {}
    for fname in sorted(os.listdir(model_dir)):
        if fname.endswith(".safetensors"):
            tensors.update(load_file(os.path.join(model_dir, fname)))

    prefix = "model." if any(k.startswith("model.") for k in tensors) else ""

    def t(name):
        return tensors[prefix + name]

    def lin_w(name):
        return t(name + ".weight").T  # (out, in) -> (in, out)

    def enc_layer_key(i, rest):
        return f"encoder.layers.{i}.{rest}"

    def dec_layer_key(i, rest):
        return f"decoder.layers.{i}.{rest}"

    def attn_params(keyfn, layer_range, attn_name):
        return {
            "wq": _stack([lin_w(keyfn(i, f"{attn_name}.q_proj")) for i in layer_range]),
            "bq": _stack(
                [t(keyfn(i, f"{attn_name}.q_proj.bias")) for i in layer_range]
            ),
            "wk": _stack([lin_w(keyfn(i, f"{attn_name}.k_proj")) for i in layer_range]),
            "wv": _stack([lin_w(keyfn(i, f"{attn_name}.v_proj")) for i in layer_range]),
            "bv": _stack(
                [t(keyfn(i, f"{attn_name}.v_proj.bias")) for i in layer_range]
            ),
            "wo": _stack(
                [lin_w(keyfn(i, f"{attn_name}.out_proj")) for i in layer_range]
            ),
            "bo": _stack(
                [t(keyfn(i, f"{attn_name}.out_proj.bias")) for i in layer_range]
            ),
        }

    def ln_params(keyfn, layer_range, ln_name):
        g = _stack([t(keyfn(i, f"{ln_name}.weight")) for i in layer_range])
        b = _stack([t(keyfn(i, f"{ln_name}.bias")) for i in layer_range])
        return g, b

    def mlp_params(keyfn, layer_range):
        return {
            "w1": _stack([lin_w(keyfn(i, "fc1")) for i in layer_range]),
            "b1": _stack([t(keyfn(i, "fc1.bias")) for i in layer_range]),
            "w2": _stack([lin_w(keyfn(i, "fc2")) for i in layer_range]),
            "b2": _stack([t(keyfn(i, "fc2.bias")) for i in layer_range]),
        }

    Le = range(config.n_audio_layer)
    Ld = range(config.n_text_layer)

    e_ln1_g, e_ln1_b = ln_params(enc_layer_key, Le, "self_attn_layer_norm")
    e_ln2_g, e_ln2_b = ln_params(enc_layer_key, Le, "final_layer_norm")
    d_ln1_g, d_ln1_b = ln_params(dec_layer_key, Ld, "self_attn_layer_norm")
    d_ln2_g, d_ln2_b = ln_params(dec_layer_key, Ld, "encoder_attn_layer_norm")
    d_ln3_g, d_ln3_b = ln_params(dec_layer_key, Ld, "final_layer_norm")

    params = {
        "encoder": {
            # torch Conv1d weight (out, in, k) -> (k, in, out)
            "conv1_w": t("encoder.conv1.weight").transpose(2, 1, 0),
            "conv1_b": t("encoder.conv1.bias"),
            "conv2_w": t("encoder.conv2.weight").transpose(2, 1, 0),
            "conv2_b": t("encoder.conv2.bias"),
            "pos_embed": t("encoder.embed_positions.weight"),
            "layers": {
                "ln1_g": e_ln1_g,
                "ln1_b": e_ln1_b,
                "attn": attn_params(enc_layer_key, Le, "self_attn"),
                "ln2_g": e_ln2_g,
                "ln2_b": e_ln2_b,
                "mlp": mlp_params(enc_layer_key, Le),
            },
            "ln_post_g": t("encoder.layer_norm.weight"),
            "ln_post_b": t("encoder.layer_norm.bias"),
        },
        "decoder": {
            "token_embed": t("decoder.embed_tokens.weight"),
            "pos_embed": t("decoder.embed_positions.weight"),
            "layers": {
                "ln1_g": d_ln1_g,
                "ln1_b": d_ln1_b,
                "self_attn": attn_params(dec_layer_key, Ld, "self_attn"),
                "ln2_g": d_ln2_g,
                "ln2_b": d_ln2_b,
                "cross_attn": attn_params(dec_layer_key, Ld, "encoder_attn"),
                "ln3_g": d_ln3_g,
                "ln3_b": d_ln3_b,
                "mlp": mlp_params(dec_layer_key, Ld),
            },
            "ln_g": t("decoder.layer_norm.weight"),
            "ln_b": t("decoder.layer_norm.bias"),
        },
    }

    import jax

    params = jax.tree.map(
        lambda a: jax.numpy.asarray(np.asarray(a), dtype=dtype), params
    )
    return params, config


def _hf_alignment_heads(model_dir, hf_cfg):
    gen_path = os.path.join(model_dir, "generation_config.json")
    if os.path.exists(gen_path):
        try:
            with open(gen_path) as f:
                gen = json.load(f)
            heads = gen.get("alignment_heads")
            if heads:
                return tuple(tuple(h) for h in heads)
        except (json.JSONDecodeError, OSError):
            pass
    return ()


# ---------------------------------------------------------------------------
# CTranslate2 model.bin
# ---------------------------------------------------------------------------

_CT2_DTYPES = {
    0: np.dtype(np.float32),
    1: np.dtype(np.int8),
    2: np.dtype(np.int16),
    3: np.dtype(np.int32),
    4: np.dtype(np.float16),
    5: np.dtype("<u2"),  # bfloat16 stored as raw uint16
}


def read_ct2_variables(path_or_bytes) -> Dict[str, np.ndarray]:
    """Parse a CTranslate2 model.bin (path, bytes, or file-like) into
    {name: ndarray}.

    Binary layout (CTranslate2 model serialization): uint32 binary_version,
    C-string spec name (uint16 length incl. NUL), uint32 spec revision,
    uint32 variable count, then per variable: name (same string encoding),
    uint8 rank, uint32 dims, uint8 dtype tag (itemsize in old versions),
    uint32 payload byte count, raw payload.  The payload size field lets us
    validate the dtype interpretation and recover for old files.
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    elif hasattr(path_or_bytes, "read"):
        data = path_or_bytes.read()
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()

    off = 0

    def u32():
        nonlocal off
        (v,) = struct.unpack_from("<I", data, off)
        off += 4
        return v

    def u16():
        nonlocal off
        (v,) = struct.unpack_from("<H", data, off)
        off += 2
        return v

    def u8():
        nonlocal off
        v = data[off]
        off += 1
        return v

    def cstr():
        nonlocal off
        n = u16()
        s = data[off : off + n - 1].decode("utf-8")
        off += n
        return s

    binary_version = u32()
    if binary_version > 10:
        raise ValueError(
            f"unsupported CTranslate2 binary version {binary_version}"
        )
    spec_name = cstr()
    revision = u32()
    num_vars = u32()

    variables: Dict[str, np.ndarray] = {}
    for _ in range(num_vars):
        name = cstr()
        rank = u8()
        dims = [u32() for _ in range(rank)]
        tag = u8()
        nbytes = u32()
        count = int(np.prod(dims)) if dims else 1

        dtype = _CT2_DTYPES.get(tag)
        if dtype is None or count * dtype.itemsize != nbytes:
            # Old format: the tag byte is the item size.
            itemsize = tag
            if count * itemsize != nbytes:
                raise ValueError(
                    f"cannot infer dtype for CT2 variable {name!r}: "
                    f"tag={tag} dims={dims} nbytes={nbytes}"
                )
            dtype = {4: np.dtype(np.float32), 1: np.dtype(np.int8)}.get(itemsize)
            if dtype is None:
                raise ValueError(f"unsupported CT2 item size {itemsize} for {name!r}")

        arr = np.frombuffer(data, dtype=dtype, count=count, offset=off).reshape(dims)
        if tag == 5:
            # bfloat16 payload: widen to f32 via bit shift.
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        off += nbytes
        variables[name] = arr

    variables["__spec__"] = np.array([spec_name], dtype=object)
    variables["__revision__"] = np.array([revision])
    return variables


def load_ct2_model(model_dir: str, dtype="bfloat16", files: Optional[dict] = None):
    """Load a CTranslate2-converted Whisper directory (model.bin + config.json),
    or in-memory file contents via ``files`` (name -> bytes/file-like,
    the reference's ``files=`` loading mode, transcribe.py:662-676).

    CT2 fuses self-attention QKV into one linear (linear_0: (3d, d)) and
    cross-attention KV into linear_1: (2d, d); we split them back out.
    int8 CT2 checkpoints carry per-output-channel weight_scale vectors:
    those are dequantized here (the int8 *compute* path quantizes again on
    device, see ops/quant.py).
    """
    import jax

    files = files or {}
    if "config.json" in files:
        blob = files["config.json"]
        if hasattr(blob, "read"):
            blob = blob.read()
        ct2_cfg = json.loads(blob)
    else:
        with open(os.path.join(model_dir, "config.json")) as f:
            ct2_cfg = json.load(f)

    model_bin = files.get("model.bin", os.path.join(model_dir, "model.bin"))
    variables = read_ct2_variables(model_bin)
    variables.pop("__spec__", None)
    variables.pop("__revision__", None)

    def get(name):
        arr = variables[name]
        scale_name = name.rsplit("/", 1)[0] + "/weight_scale"
        if arr.dtype == np.int8 and scale_name in variables:
            scale = variables[scale_name].astype(np.float32)
            arr = arr.astype(np.float32) / scale.reshape(-1, *([1] * (arr.ndim - 1)))
        elif arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        return arr

    def lin_w(name):
        return get(name + "/weight").T

    def has(name):
        return name in variables

    # Infer layer counts from variable names.
    def count_layers(prefix):
        i = 0
        while has(f"{prefix}/layer_{i}/self_attention/layer_norm/gamma") or has(
            f"{prefix}/layer_{i}/self_attention/layer_norm/weight"
        ):
            i += 1
        return i

    n_enc = count_layers("encoder")
    n_dec = count_layers("decoder")

    def ln(name):
        for g_key, b_key in (("gamma", "beta"), ("weight", "bias")):
            if has(f"{name}/{g_key}"):
                return get(f"{name}/{g_key}"), get(f"{name}/{b_key}")
        raise KeyError(name)

    conv1_w = get("encoder/conv1/weight")  # (d, n_mels, 3)
    d_model = conv1_w.shape[0]
    n_mels = conv1_w.shape[1]
    token_embed = get("decoder/embeddings/weight")
    n_vocab = token_embed.shape[0]
    pos_embed_dec = get("decoder/position_encodings")

    def enc_attn(i):
        base = f"encoder/layer_{i}/self_attention"
        qkv_w = get(f"{base}/linear_0/weight")  # (3d, d)
        qkv_b = get(f"{base}/linear_0/bias")
        wq, wk, wv = np.split(qkv_w, 3, axis=0)
        bq, _bk, bv = np.split(qkv_b, 3, axis=0)
        return {
            "wq": wq.T,
            "bq": bq,
            "wk": wk.T,
            "wv": wv.T,
            "bv": bv,
            "wo": lin_w(f"{base}/linear_1"),
            "bo": get(f"{base}/linear_1/bias"),
        }

    def dec_self_attn(i):
        base = f"decoder/layer_{i}/self_attention"
        qkv_w = get(f"{base}/linear_0/weight")
        qkv_b = get(f"{base}/linear_0/bias")
        wq, wk, wv = np.split(qkv_w, 3, axis=0)
        bq, _bk, bv = np.split(qkv_b, 3, axis=0)
        return {
            "wq": wq.T,
            "bq": bq,
            "wk": wk.T,
            "wv": wv.T,
            "bv": bv,
            "wo": lin_w(f"{base}/linear_1"),
            "bo": get(f"{base}/linear_1/bias"),
        }

    def dec_cross_attn(i):
        base = f"decoder/layer_{i}/attention"
        kv_w = get(f"{base}/linear_1/weight")  # (2d, d)
        kv_b = get(f"{base}/linear_1/bias")
        wk, wv = np.split(kv_w, 2, axis=0)
        _bk, bv = np.split(kv_b, 2, axis=0)
        return {
            "wq": lin_w(f"{base}/linear_0"),
            "bq": get(f"{base}/linear_0/bias"),
            "wk": wk.T,
            "wv": wv.T,
            "bv": bv,
            "wo": lin_w(f"{base}/linear_2"),
            "bo": get(f"{base}/linear_2/bias"),
        }

    def mlp(prefix, i):
        base = f"{prefix}/layer_{i}/ffn"
        return {
            "w1": lin_w(f"{base}/linear_0"),
            "b1": get(f"{base}/linear_0/bias"),
            "w2": lin_w(f"{base}/linear_1"),
            "b2": get(f"{base}/linear_1/bias"),
        }

    def stack_dicts(dicts):
        return {k: _stack([d[k] for d in dicts]) for k in dicts[0]}

    def stack_lns(pairs):
        return _stack([p[0] for p in pairs]), _stack([p[1] for p in pairs])

    e_ln1 = stack_lns([ln(f"encoder/layer_{i}/self_attention/layer_norm") for i in range(n_enc)])
    e_ln2 = stack_lns([ln(f"encoder/layer_{i}/ffn/layer_norm") for i in range(n_enc)])
    d_ln1 = stack_lns([ln(f"decoder/layer_{i}/self_attention/layer_norm") for i in range(n_dec)])
    d_ln2 = stack_lns([ln(f"decoder/layer_{i}/attention/layer_norm") for i in range(n_dec)])
    d_ln3 = stack_lns([ln(f"decoder/layer_{i}/ffn/layer_norm") for i in range(n_dec)])
    enc_ln_post = ln("encoder/layer_norm")
    dec_ln = ln("decoder/layer_norm")

    n_head = int(ct2_cfg.get("attention_heads", d_model // 64))
    from faster_whisper_tpu.models.model import sinusoids

    params = {
        "encoder": {
            "conv1_w": conv1_w.transpose(2, 1, 0),
            "conv1_b": get("encoder/conv1/bias"),
            "conv2_w": get("encoder/conv2/weight").transpose(2, 1, 0),
            "conv2_b": get("encoder/conv2/bias"),
            "pos_embed": (
                get("encoder/position_encodings")
                if has("encoder/position_encodings")
                else sinusoids(1500, d_model).astype(np.float32)
            ),
            "layers": {
                "ln1_g": e_ln1[0],
                "ln1_b": e_ln1[1],
                "attn": stack_dicts([enc_attn(i) for i in range(n_enc)]),
                "ln2_g": e_ln2[0],
                "ln2_b": e_ln2[1],
                "mlp": stack_dicts([mlp("encoder", i) for i in range(n_enc)]),
            },
            "ln_post_g": enc_ln_post[0],
            "ln_post_b": enc_ln_post[1],
        },
        "decoder": {
            "token_embed": token_embed,
            "pos_embed": pos_embed_dec,
            "layers": {
                "ln1_g": d_ln1[0],
                "ln1_b": d_ln1[1],
                "self_attn": stack_dicts([dec_self_attn(i) for i in range(n_dec)]),
                "ln2_g": d_ln2[0],
                "ln2_b": d_ln2[1],
                "cross_attn": stack_dicts([dec_cross_attn(i) for i in range(n_dec)]),
                "ln3_g": d_ln3[0],
                "ln3_b": d_ln3[1],
                "mlp": stack_dicts([mlp("decoder", i) for i in range(n_dec)]),
            },
            "ln_g": dec_ln[0],
            "ln_b": dec_ln[1],
        },
    }

    config = config_from_dims(
        n_mels=n_mels,
        n_audio_state=d_model,
        n_audio_head=n_head,
        n_audio_layer=n_enc,
        n_text_state=d_model,
        n_text_head=n_head,
        n_text_layer=n_dec,
        n_vocab=n_vocab,
        name=os.path.basename(model_dir.rstrip("/")),
        alignment_heads=tuple(
            tuple(h) for h in ct2_cfg.get("alignment_heads", [])
        ),
    )

    params = jax.tree.map(
        lambda a: jax.numpy.asarray(np.ascontiguousarray(a), dtype=dtype), params
    )
    return params, config


# ---------------------------------------------------------------------------
# Model resolution
# ---------------------------------------------------------------------------


def load_model(
    model_dir: str, dtype="bfloat16", files: Optional[dict] = None
) -> Tuple[dict, WhisperConfig]:
    """Load whichever checkpoint format ``model_dir`` (or ``files``) holds."""
    if files and "model.bin" in files:
        return load_ct2_model(model_dir, dtype=dtype, files=files)
    if os.path.exists(os.path.join(model_dir, "model.bin")):
        return load_ct2_model(model_dir, dtype=dtype)
    if any(f.endswith(".safetensors") for f in os.listdir(model_dir)):
        return load_hf_safetensors(model_dir, dtype=dtype)
    raise ValueError(
        f"no model.bin or *.safetensors checkpoint found in {model_dir}"
    )


def named_config(name: str) -> Optional[WhisperConfig]:
    return CONFIGS.get(name)
