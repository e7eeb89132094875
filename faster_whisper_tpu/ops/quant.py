"""Int8 quantization for TPU serving.

Replaces CTranslate2's int8 compute path (the reference exposes it as
``compute_type="int8"``, reference: faster_whisper/transcribe.py:650-651 and
the README int8 benchmark rows).  Scheme (W8A8, CT2-equivalent):

  * weights: symmetric per-output-channel int8, scale = max|w|/127 —
    the same layout CT2 stores in its int8 model.bin variables
    (weight + weight_scale), so converted checkpoints round-trip;
  * activations: dynamic symmetric per-row int8 at matmul time;
  * the matmul runs on the MXU's native s8 x s8 -> s32 path
    (double the bf16 throughput on v5e) and, critically for the
    memory-bound decode loop, weights stream from HBM at half the bytes.

Everything is expressed as plain XLA ops (round/clip/dot_general with
int32 accumulation) so the quantize -> dot -> rescale chain fuses.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    """An int8 weight matrix with per-output-channel scales.

    q: (..., in, out) int8, s: (..., out) f32.  Registered as a pytree
    (NamedTuple), so stacked-layer leaves scan transparently.
    """

    q: jax.Array
    s: jax.Array


def quantize_weight(w: jax.Array, axis: int = -2) -> QuantizedLinear:
    """Symmetric per-output-channel quantization of an (..., in, out)
    weight; ``axis`` is the contraction (input) dimension."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedLinear(q=q, s=jnp.squeeze(scale, axis=axis))


def int8_dense(
    x: jax.Array,  # (..., in) bf16/f32
    w: QuantizedLinear,  # q (in, out), s (out,)
    b: Optional[jax.Array] = None,
    out_dtype=None,
) -> jax.Array:
    """y = x @ dequant(w) + b with dynamic per-row activation quantization
    and an s8 x s8 -> s32 MXU matmul.  ``out_dtype`` overrides the output
    cast (the logits head wants f32 scores, not x.dtype)."""
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-10)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq,
        w.q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * w.s
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


@jax.jit
def quantize_params(params: dict) -> dict:
    """Quantize every transformer-layer matmul weight in a Whisper param
    tree to QuantizedLinear (embeddings, conv stem, and layernorms stay
    in their original dtype).  The tied output projection additionally
    gets a dedicated int8 transpose (``decoder.logits_w``): the logits
    matmul re-reads the whole (V, d) embedding every decode step, and the
    int8 copy halves that stream while the bf16 table still serves the
    (tiny, gathered) input-embedding lookups at full precision —
    matching CT2's int8 treatment of the projection.

    Jitted as ONE program: eagerly, each per-weight quantize is ~7 op
    dispatches, and on relay-compiled backends (axon) every tiny op costs
    ~0.4 s of compile that the persistent cache refuses to store (below
    its 1 s floor) — measured ~25 s of every process's cold start.  One
    fused program compiles once, caches, and dispatches once."""

    def quant_attn(p):
        return {
            "wq": quantize_weight(p["wq"]),
            "bq": p["bq"],
            "wk": quantize_weight(p["wk"]),
            "wv": quantize_weight(p["wv"]),
            "bv": p["bv"],
            "wo": quantize_weight(p["wo"]),
            "bo": p["bo"],
        }

    def quant_mlp(p):
        return {
            "w1": quantize_weight(p["w1"]),
            "b1": p["b1"],
            "w2": quantize_weight(p["w2"]),
            "b2": p["b2"],
        }

    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    enc_layers = dict(params["encoder"]["layers"])
    enc_layers["attn"] = quant_attn(enc_layers["attn"])
    enc_layers["mlp"] = quant_mlp(enc_layers["mlp"])
    out["encoder"] = dict(params["encoder"])
    out["encoder"]["layers"] = enc_layers

    dec_layers = dict(params["decoder"]["layers"])
    dec_layers["self_attn"] = quant_attn(dec_layers["self_attn"])
    dec_layers["cross_attn"] = quant_attn(dec_layers["cross_attn"])
    dec_layers["mlp"] = quant_mlp(dec_layers["mlp"])
    out["decoder"] = dict(params["decoder"])
    out["decoder"]["layers"] = dec_layers
    out["decoder"]["logits_w"] = quantize_weight(
        jnp.transpose(params["decoder"]["token_embed"])
    )
    return out


# ---------------------------------------------------------------------------
# int8 KV cache (decode loop)
# ---------------------------------------------------------------------------


class QuantKV(NamedTuple):
    """An int8 K or V cache with per-(position, head) symmetric scales.

    q: (..., H, D) int8, s: (..., H) f32 — storing the cache at half the
    bytes halves the decode loop's dominant HBM read (the per-step
    self/cross cache sweeps).  The int8->bf16 upcast happens inside the
    attention matmul's operand read (fused by XLA), so no dequantized
    copy is ever materialized.
    """

    q: jax.Array
    s: jax.Array


def quantize_kv(x: jax.Array) -> QuantKV:
    """Quantize a (..., H, D) K/V tensor over the head dim D."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.maximum(amax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return QuantKV(q=q, s=s)
