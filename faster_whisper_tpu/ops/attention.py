"""Multi-head attention for TPU.

The XLA path below is already MXU-friendly (two batched matmuls with an
f32-accumulated softmax between), and it is the production path for every
shape this model runs: measured on v5e at the encoder's shapes (B=8,
H=20, S=1500, D=64), XLA's lowering beats the stock Pallas flash kernel
~2.6x (see _flash_enabled), so the flash route stays opt-in via
FWT_FLASH=1 and would only pay off at much longer sequences than Whisper
ever produces.

Replaces the attention kernels inside CTranslate2's C++ engine
(reference consumes them via ctranslate2.models.Whisper.encode/generate,
reference: faster_whisper/transcribe.py:689-698, :1446).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def mha(
    q: jax.Array,  # (B, S, H, D)
    k: jax.Array,  # (B, T, H, D)
    v: jax.Array,  # (B, T, H, D)
    mask: Optional[jax.Array] = None,  # broadcastable to (B, H, S, T), bool
    return_weights: bool = False,
):
    """Scaled dot-product attention.

    Scores accumulate in f32 and softmax runs in f32 regardless of input
    dtype; the output matmul stays in the input dtype (bf16 on the hot
    path).  ``mask`` is True where attention is allowed.
    """
    d = q.shape[-1]
    scale = d ** -0.5

    scores = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale

    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))

    weights = jax.nn.softmax(scores, axis=-1)

    out = jnp.einsum(
        "bhst,bthd->bshd", weights.astype(v.dtype), v
    )

    if return_weights:
        return out, weights
    return out


def mha_hmajor(
    q: jax.Array,  # (B, S, H, D)
    k: jax.Array,  # (B, H, T, D) head-major (decoder KV-cache layout)
    v: jax.Array,  # (B, H, T, D)
    mask: Optional[jax.Array] = None,  # broadcastable to (B, H, S, T), bool
):
    """Scaled dot-product attention over a head-major K/V cache.

    Same math as ``mha``; the K/V operands keep the decoder cache's
    (B, H, T, D) layout (models/model.py::KVCache) so no transpose is
    materialized on the prefill path.
    """
    d = q.shape[-1]
    scale = d ** -0.5
    scores = jnp.einsum(
        "bshd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bshd", weights.astype(v.dtype), v)


def _flash_enabled() -> bool:
    # Opt-in (FWT_FLASH=1).  Measured on v5e at the encoder's shapes
    # (B=8, H=20, S=1500, D=64): XLA's plain path runs ~5 ms/layer vs ~13
    # ms/layer for the stock Pallas flash kernel — XLA's own attention
    # lowering already avoids the naive 3-pass score materialization at
    # these sizes, so the fused kernel only pays off at much longer S.
    import os

    if os.environ.get("FWT_FLASH") != "1":
        return False
    return jax.default_backend() in ("tpu", "axon")


def mha_full(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Unmasked full MHA (encoder self-attention), (B, S, H, D) layout.

    Production path: the plain XLA attention above (measured ~5 ms/layer
    at the encoder's B=8, H=20, S=1500, D=64 on v5e).  With FWT_FLASH=1
    it routes long sequences to the stock Pallas flash kernel instead —
    measured ~13 ms/layer at the same shapes, i.e. SLOWER here (XLA
    already avoids materializing the (S, S) scores naively), kept only
    as an escape hatch for future much-longer-S experiments.
    """
    s = q.shape[1]
    if _flash_enabled() and s >= 1024 and k.shape[1] == s:
        return _mha_flash_full(q, k, v)
    return mha(q, k, v)


def _mha_flash_full(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, s, h, d = q.shape
    pad = (-s) % 512
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if pad:
        cfg = ((0, 0), (0, 0), (0, pad), (0, 0))
        qt, kt, vt = jnp.pad(qt, cfg), jnp.pad(kt, cfg), jnp.pad(vt, cfg)
        # Padded keys must not enter the real rows' softmax.
        seg = jnp.broadcast_to(
            (jnp.arange(s + pad) < s).astype(jnp.int32)[None], (b, s + pad)
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None

    out = flash_attention(
        qt, kt, vt, segment_ids=segment_ids, sm_scale=float(d) ** -0.5
    )
    return out[:, :, :s].transpose(0, 2, 1, 3)


def causal_mask(s: int, dtype=jnp.bool_) -> jax.Array:
    """(1, 1, S, S) lower-triangular allow-mask."""
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    return (j <= i)[None, None].astype(dtype)


def length_mask(lengths: jax.Array, t: int) -> jax.Array:
    """(B, 1, 1, T) allow-mask of positions < lengths[b]."""
    j = jnp.arange(t)[None, :]
    return (j < lengths[:, None])[:, None, None, :]
