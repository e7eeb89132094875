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

import functools

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    """An int8 weight matrix with per-output-channel (or group-wise)
    scales.

    q: (..., in, out) int8; s: (..., out) f32 per-output-channel, or
    (..., in/G, out) f32 for group-wise scales over in-dim groups of G
    (``s.ndim == q.ndim`` marks the group-wise form).  Registered as a
    pytree (NamedTuple), so stacked-layer leaves scan transparently.
    """

    q: jax.Array
    s: jax.Array


def quantize_weight(
    w: jax.Array, axis: int = -2, qmax: int = 127,
    group_size: Optional[int] = None,
) -> QuantizedLinear:
    """Symmetric per-output-channel quantization of an (..., in, out)
    weight; ``axis`` is the contraction (input) dimension.  ``qmax=7``
    produces 4-bit-range values (still stored int8 — the packed int4
    copy is materialized inside the decode program, see
    generation/generate.py::_pack_int4_weights).

    ``group_size=G`` quantizes with one scale per (in-dim group of G,
    output channel) instead of per output channel: at 4-bit range a
    single outlier in a column costs the whole column its resolution,
    and group-wise scales bound that loss to one G-row group (the
    standard W4 mitigation; CT2 has no 4-bit type to compare against).
    Requires ``axis=-2`` (the layout every Whisper matmul here uses).
    """
    wf = w.astype(jnp.float32)
    if group_size is None:
        amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
        scale = jnp.maximum(amax / float(qmax), 1e-10)
        q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(jnp.int8)
        return QuantizedLinear(q=q, s=jnp.squeeze(scale, axis=axis))

    assert axis in (-2, wf.ndim - 2), "group-wise scales assume (..., in, out)"
    d_in, d_out = wf.shape[-2], wf.shape[-1]
    assert d_in % group_size == 0, (d_in, group_size)
    n_g = d_in // group_size
    wg = wf.reshape(*wf.shape[:-2], n_g, group_size, d_out)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)  # (..., nG, 1, out)
    scale = jnp.maximum(amax / float(qmax), 1e-10)
    q = jnp.clip(jnp.round(wg / scale), -qmax, qmax).astype(jnp.int8)
    return QuantizedLinear(
        q=q.reshape(wf.shape), s=jnp.squeeze(scale, axis=-2)
    )


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

    if w.s.ndim == w.q.ndim:
        # group-wise scales: batch the s8 x s8 dot over the in-dim
        # groups, rescale each group's int32 partial by its own scale,
        # then reduce over groups in f32.  Dense sites always see a
        # single layer's (in, out) matrix (stacked-layer leaves are
        # sliced before the dense).
        assert w.q.ndim == 2, w.q.shape
        n_g = w.s.shape[-2]
        d_in, d_out = w.q.shape[-2], w.q.shape[-1]
        g = d_in // n_g
        xg = xq.reshape(*xq.shape[:-1], n_g, g)
        qg = w.q.reshape(n_g, g, d_out)
        acc = jax.lax.dot_general(
            xg,
            qg,
            dimension_numbers=(((xg.ndim - 1,), (1,)), ((xg.ndim - 2,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (nG, ..., out)
        s = w.s.reshape(n_g, *([1] * (acc.ndim - 2)), d_out)
        y = jnp.sum(acc.astype(jnp.float32) * s, axis=0) * sx
    else:
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


def _quantize_params(
    params: dict, dec_qmax: int, group_size: Optional[int] = None
) -> dict:
    """Quantize every transformer-layer matmul weight in a Whisper param
    tree to QuantizedLinear (embeddings, conv stem, and layernorms stay
    in their original dtype).  The tied output projection additionally
    gets a dedicated int8 transpose (``decoder.logits_w``): the logits
    matmul re-reads the whole (V, d) embedding every decode step, and the
    int8 copy halves that stream while the bf16 table still serves the
    (tiny, gathered) input-embedding lookups at full precision —
    matching CT2's int8 treatment of the projection.

    ``dec_qmax=7`` quantizes the DECODER matmuls and the logits head at
    4-bit range for ``compute_type="int4"``; the encoder always stays at
    int8 range — encode is MXU-compute-bound, so narrower storage buys
    nothing there while the decode loop is weight-stream-bound."""

    def qw(w, qmax):
        # group-wise scales apply only to the 4-bit-range weights (the
        # encoder stays at int8 range, where per-channel is enough)
        gs = group_size if qmax < 127 else None
        return quantize_weight(w, qmax=qmax, group_size=gs)

    def quant_attn(p, qmax):
        return {
            "wq": qw(p["wq"], qmax),
            "bq": p["bq"],
            "wk": qw(p["wk"], qmax),
            "wv": qw(p["wv"], qmax),
            "bv": p["bv"],
            "wo": qw(p["wo"], qmax),
            "bo": p["bo"],
        }

    def quant_mlp(p, qmax):
        return {
            "w1": qw(p["w1"], qmax),
            "b1": p["b1"],
            "w2": qw(p["w2"], qmax),
            "b2": p["b2"],
        }

    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    enc_layers = dict(params["encoder"]["layers"])
    enc_layers["attn"] = quant_attn(enc_layers["attn"], 127)
    enc_layers["mlp"] = quant_mlp(enc_layers["mlp"], 127)
    out["encoder"] = dict(params["encoder"])
    out["encoder"]["layers"] = enc_layers

    dec_layers = dict(params["decoder"]["layers"])
    dec_layers["self_attn"] = quant_attn(dec_layers["self_attn"], dec_qmax)
    dec_layers["cross_attn"] = quant_attn(dec_layers["cross_attn"], dec_qmax)
    dec_layers["mlp"] = quant_mlp(dec_layers["mlp"], dec_qmax)
    out["decoder"] = dict(params["decoder"])
    out["decoder"]["layers"] = dec_layers
    out["decoder"]["logits_w"] = qw(
        jnp.transpose(params["decoder"]["token_embed"]), dec_qmax
    )
    return out


@jax.jit
def quantize_params(params: dict) -> dict:
    """int8 (W8A8) quantization of a Whisper param tree — see
    ``_quantize_params``.

    Jitted as ONE program: eagerly, each per-weight quantize is ~7 op
    dispatches, and on relay-compiled backends (axon) every tiny op costs
    ~0.4 s of compile that the persistent cache refuses to store (below
    its 1 s floor) — measured ~25 s of every process's cold start.  One
    fused program compiles once, caches, and dispatches once."""
    return _quantize_params(params, 127)


@functools.partial(jax.jit, static_argnames=("group_size",))
def quantize_params_int4(params: dict, group_size=None) -> dict:
    """``compute_type="int4"``: decoder matmuls + logits head at 4-bit
    range (values in [-7, 7], int8 storage — S4 cannot cross the jit
    dispatch boundary on all runtimes), encoder at int8 range.  The
    decode program converts the decoder weights to packed int4 HBM
    temps once per call (generation/generate.py::_pack_int4_weights)
    so every decode step streams half the weight bytes.

    ``group_size`` (e.g. 64/128) selects group-wise scales over in-dim
    groups for the 4-bit weights — the fallback scheme if per-channel
    int4 costs WER when real weights can be evaluated (4-bit accuracy is
    unvalidatable offline; see quantize_weight)."""
    return _quantize_params(params, 7, group_size)


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


def quantize_kv(x: jax.Array, qmax: int = 127) -> QuantKV:
    """Quantize a (..., H, D) K/V tensor over the head dim D.  ``qmax=7``
    gives 4-bit-range values for the packed-int4 cross cache."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.maximum(amax / float(qmax), 1e-10)
    q = jnp.clip(jnp.round(xf / s[..., None]), -qmax, qmax).astype(jnp.int8)
    return QuantKV(q=q, s=s)
