"""Whisper encoder/decoder forward passes in JAX.

TPU-native replacement for the CTranslate2 Whisper engine's compute graph
(the reference drives it through ctranslate2.models.Whisper.encode /
generate / align / detect_language, reference: faster_whisper/transcribe.py:689-698,
:1391-1400, :1446-1459, :1709-1715, :1823).

Design notes (TPU-first):
  * Transformer layers are *stacked* along a leading axis and executed with
    ``lax.scan``, so a 32-layer encoder compiles as one program regardless
    of depth and XLA pipelines weight prefetch across layers.
  * All matmuls run in the param dtype (bf16 by default) with f32
    accumulation where it matters (attention scores/softmax, layernorm
    statistics, final logits).
  * Decoding uses a device-resident KV cache laid out (L, B, ctx, H, D);
    the cross-attention KV over the 1500 encoder states is computed once
    per window ("prefill") and reused every decode step.
  * Shapes are static everywhere: mel windows are always (B, n_mels, 3000),
    the decoder context is always 448; variable lengths are carried as
    integer vectors + masks, never as dynamic shapes.
"""

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.models.config import WhisperConfig
from faster_whisper_tpu.ops.attention import mha, mha_full, mha_hmajor


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def layer_norm(x: jax.Array, g: jax.Array, b: jax.Array, eps: float = 1e-5):
    """LayerNorm with f32 statistics, output in input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _dense(x, w, b=None):
    from faster_whisper_tpu.ops.quant import QuantizedLinear, int8_dense

    if isinstance(w, QuantizedLinear):
        return int8_dense(x, w, b)
    y = jnp.dot(x, w)
    if b is not None:
        y = y + b
    return y


def _split_heads(x, n_head):
    b, s, d = x.shape
    return x.reshape(b, s, n_head, d // n_head)


def _merge_heads(x):
    b, s, h, dh = x.shape
    return x.reshape(b, s, h * dh)


def _attn_qkv(p, x, n_head):
    """Project q/k/v for self-attention on x."""
    q = _split_heads(_dense(x, p["wq"], p["bq"]), n_head)
    k = _split_heads(_dense(x, p["wk"]), n_head)  # Whisper: no k bias
    v = _split_heads(_dense(x, p["wv"], p["bv"]), n_head)
    return q, k, v


def _mlp(p, x):
    h = jax.nn.gelu(_dense(x, p["w1"], p["b1"]), approximate=False)
    return _dense(h, p["w2"], p["b2"])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Fixed sinusoidal position embeddings (Whisper encoder)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1)


def _encoder_layer(x, p, n_head):
    h = layer_norm(x, p["ln1_g"], p["ln1_b"])
    q, k, v = _attn_qkv(p["attn"], h, n_head)
    x = x + _dense(_merge_heads(mha_full(q, k, v)), p["attn"]["wo"], p["attn"]["bo"])
    h = layer_norm(x, p["ln2_g"], p["ln2_b"])
    x = x + _mlp(p["mlp"], h)
    return x


@functools.partial(jax.jit, static_argnames=("config",))
def encode(params, config: WhisperConfig, mel: jax.Array) -> jax.Array:
    """Encoder forward: (B, n_mels, 3000) mel -> (B, 1500, d) states.

    Conv stem (k3 s1 + GELU, k3 s2 + GELU) then ``n_audio_layer``
    pre-norm transformer blocks executed under lax.scan.
    """
    enc = params["encoder"]
    dtype = enc["conv1_w"].dtype
    x = mel.astype(dtype).transpose(0, 2, 1)  # (B, 3000, n_mels) NWC

    dn = ("NWC", "WIO", "NWC")
    x = jax.lax.conv_general_dilated(
        x, enc["conv1_w"], (1,), [(1, 1)], dimension_numbers=dn
    )
    x = jax.nn.gelu(x + enc["conv1_b"], approximate=False)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2_w"], (2,), [(1, 1)], dimension_numbers=dn
    )
    x = jax.nn.gelu(x + enc["conv2_b"], approximate=False)  # (B, 1500, d)

    x = x + enc["pos_embed"].astype(dtype)

    def body(x, layer_params):
        return _encoder_layer(x, layer_params, config.n_audio_head), None

    x, _ = jax.lax.scan(body, x, enc["layers"])

    return layer_norm(x, enc["ln_post_g"], enc["ln_post_b"])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Device-resident decoding state.

    self_k/self_v: (L, B, H, ctx, D) — written as tokens are decoded.
    cross_k/cross_v: (L, B, H, T, D) — computed once per window.

    Both head-major so decode-attention blocks have big trailing
    (positions, D) dims (the fused attention kernels tile those onto
    VMEM; ops/beam_attention.py).
    """

    self_k: jax.Array
    self_v: jax.Array
    cross_k: jax.Array
    cross_v: jax.Array


def _decoder_layer(
    x,  # (B, S, d)
    p,  # single layer params
    n_head: int,
    self_k,  # (B, H, ctx, D) cache slice (head-major)
    self_v,
    cross_k,  # (B, H, T, D)
    cross_v,
    self_mask,  # (B, 1, S, ctx) allow-mask over cache positions
    positions,  # (B, S) absolute positions of x's tokens
):
    # --- self attention over the KV cache ---
    h = layer_norm(x, p["ln1_g"], p["ln1_b"])
    q, k_new, v_new = _attn_qkv(p["self_attn"], h, n_head)

    # Scatter this block's K/V into the cache at its absolute positions
    # (advanced indices around the sliced H axis land the (B, S) batch
    # dims up front, so the value keeps k_new's (B, S, H, D) shape).
    b_idx = jnp.arange(x.shape[0])[:, None]
    self_k = self_k.at[b_idx, :, positions].set(k_new.astype(self_k.dtype))
    self_v = self_v.at[b_idx, :, positions].set(v_new.astype(self_v.dtype))

    attn = mha_hmajor(q, self_k, self_v, mask=self_mask)
    x = x + _dense(_merge_heads(attn), p["self_attn"]["wo"], p["self_attn"]["bo"])

    # --- cross attention over encoder states (head-major cache) ---
    h = layer_norm(x, p["ln2_g"], p["ln2_b"])
    qx = _split_heads(_dense(h, p["cross_attn"]["wq"], p["cross_attn"]["bq"]), n_head)
    attn = mha_hmajor(qx, cross_k, cross_v)
    x = x + _dense(_merge_heads(attn), p["cross_attn"]["wo"], p["cross_attn"]["bo"])

    # --- mlp ---
    h = layer_norm(x, p["ln3_g"], p["ln3_b"])
    x = x + _mlp(p["mlp"], h)
    return x, (self_k, self_v)


def _decoder_stack(params, config, x, positions, self_mask, cache: KVCache):
    dec = params["decoder"]

    def body(x, scanned):
        layer_params, self_k, self_v, cross_k, cross_v = scanned
        x, (new_k, new_v) = _decoder_layer(
            x,
            layer_params,
            config.n_text_head,
            self_k,
            self_v,
            cross_k,
            cross_v,
            self_mask,
            positions,
        )
        return x, (new_k, new_v)

    x, (new_self_k, new_self_v) = jax.lax.scan(
        body,
        x,
        (dec["layers"], cache.self_k, cache.self_v, cache.cross_k, cache.cross_v),
    )
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    cache = cache._replace(self_k=new_self_k, self_v=new_self_v)
    return x, cache


def _logits(params, x):
    """Tied-embedding output projection with f32 accumulation.

    int8 param trees carry a dedicated transposed int8 copy of the table
    (ops/quant.py::quantize_params) so the per-step (d, V) stream runs at
    half the bytes on the s8 MXU path."""
    from faster_whisper_tpu.ops.quant import int8_dense

    lw = params["decoder"].get("logits_w")
    if lw is not None:
        return int8_dense(x, lw, out_dtype=jnp.float32)
    embed = params["decoder"]["token_embed"]
    return jnp.dot(x, embed.T, preferred_element_type=jnp.float32)


def init_cache(
    params, config: WhisperConfig, xa: jax.Array, dtype=None, ctx: int = None
) -> KVCache:
    """Allocate the self-attention cache and precompute cross K/V from the
    encoder states ``xa`` (B, T, d).  ``ctx`` sizes the cache (defaults to
    the model's full 448 context; generation passes a bucketed max_length
    so short decodes don't pay full-context HBM)."""
    b, t, _ = xa.shape
    h, dh = config.n_text_head, config.n_text_state // config.n_text_head
    L = config.n_text_layer
    dtype = dtype or params["decoder"]["token_embed"].dtype
    if ctx is None:
        ctx = config.n_text_ctx

    def body(_, layer_params):
        p = layer_params["cross_attn"]
        k = _split_heads(_dense(xa.astype(dtype), p["wk"]), h)
        v = _split_heads(_dense(xa.astype(dtype), p["wv"], p["bv"]), h)
        # head-major (B, H, T, D)
        return None, (k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

    _, (cross_k, cross_v) = jax.lax.scan(body, None, params["decoder"]["layers"])

    return KVCache(
        self_k=jnp.zeros((L, b, h, ctx, dh), dtype),
        self_v=jnp.zeros((L, b, h, ctx, dh), dtype),
        cross_k=cross_k,
        cross_v=cross_v,
    )


@functools.partial(jax.jit, static_argnames=("config", "ctx"))
def decoder_prefill(
    params,
    config: WhisperConfig,
    tokens: jax.Array,  # (B, P) prompt tokens, right-padded
    lengths: jax.Array,  # (B,) true prompt lengths
    xa: jax.Array,  # (B, T, d) encoder states
    gather_pos: jax.Array,  # (B, G) positions whose next-token logits to return
    ctx: int = None,
) -> Tuple[jax.Array, KVCache]:
    """Run the decoder over the (padded) prompt, filling the KV cache.

    Returns (logits at ``gather_pos``: (B, G, n_vocab) f32, cache).
    Padded positions write garbage into cache slots >= lengths[b]; those
    slots are never attended (masks are built from current length) and are
    overwritten as real tokens are generated.
    """
    dec = params["decoder"]
    b, s = tokens.shape
    dtype = dec["token_embed"].dtype

    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    x = dec["token_embed"][tokens] + dec["pos_embed"][:s][None]
    x = x.astype(dtype)

    # Causal over cache positions: query at i attends cache slots <= i.
    if ctx is None:
        ctx = config.n_text_ctx
    i = jnp.arange(s)[:, None]
    j = jnp.arange(ctx)[None, :]
    self_mask = (j <= i)[None, None]  # (1, 1, S, ctx)

    cache = init_cache(params, config, xa, dtype=dtype, ctx=ctx)
    x, cache = _decoder_stack(params, config, x, positions, self_mask, cache)

    logits = _logits(params, x)  # (B, S, V) f32
    out = jnp.take_along_axis(logits, gather_pos[:, :, None], axis=1)
    return out, cache


@functools.partial(jax.jit, static_argnames=("config",))
def decoder_step(
    params,
    config: WhisperConfig,
    token: jax.Array,  # (B,) current token ids
    pos: jax.Array,  # (B,) absolute position of `token`
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """One decode step: returns (logits (B, n_vocab) f32, updated cache)."""
    dec = params["decoder"]
    b = token.shape[0]
    dtype = dec["token_embed"].dtype

    x = dec["token_embed"][token] + dec["pos_embed"][pos]
    x = x[:, None, :].astype(dtype)  # (B, 1, d)

    ctx = cache.self_k.shape[3]
    j = jnp.arange(ctx)[None, None, None, :]
    self_mask = j <= pos[:, None, None, None]  # (B, 1, 1, ctx)

    positions = pos[:, None]
    x, cache = _decoder_stack(params, config, x, positions, self_mask, cache)
    return _logits(params, x)[:, 0], cache


# ---------------------------------------------------------------------------
# Teacher-forced pass with cross-attention weights (word-timestamp alignment)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",))
def decoder_forward_with_cross_weights(
    params,
    config: WhisperConfig,
    tokens: jax.Array,  # (B, S)
    xa: jax.Array,  # (B, T, d)
):
    """Full teacher-forced decoder pass returning per-layer cross-attention
    weights, for DTW word alignment (replaces CT2's model.align internals,
    reference: faster_whisper/transcribe.py:1709-1715).

    Returns (logits (B, S, V) f32, cross_weights (L, B, H, S, T) f32).
    """
    dec = params["decoder"]
    b, s = tokens.shape
    dtype = dec["token_embed"].dtype
    n_head = config.n_text_head

    x = dec["token_embed"][tokens] + dec["pos_embed"][:s][None]
    x = x.astype(dtype)

    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    causal = (j <= i)[None, None]

    def body(x, layer_params):
        p = layer_params
        h = layer_norm(x, p["ln1_g"], p["ln1_b"])
        q, k, v = _attn_qkv(p["self_attn"], h, n_head)
        attn = mha(q, k, v, mask=causal)
        x = x + _dense(_merge_heads(attn), p["self_attn"]["wo"], p["self_attn"]["bo"])

        h = layer_norm(x, p["ln2_g"], p["ln2_b"])
        cp = p["cross_attn"]
        qx = _split_heads(_dense(h, cp["wq"], cp["bq"]), n_head)
        kx = _split_heads(_dense(xa.astype(dtype), cp["wk"]), n_head)
        vx = _split_heads(_dense(xa.astype(dtype), cp["wv"], cp["bv"]), n_head)
        attn, weights = mha(qx, kx, vx, return_weights=True)
        x = x + _dense(_merge_heads(attn), cp["wo"], cp["bo"])

        h = layer_norm(x, p["ln3_g"], p["ln3_b"])
        x = x + _mlp(p["mlp"], h)
        return x, weights

    x, cross_weights = jax.lax.scan(body, x, dec["layers"])
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    return _logits(params, x), cross_weights
