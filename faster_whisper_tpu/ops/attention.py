"""Multi-head attention for TPU.

The XLA path below is already MXU-friendly (two batched matmuls with an
f32-accumulated softmax between); ops/flash_attention.py provides a Pallas
fused kernel for the encoder's 1500-state self-attention where HBM traffic
on the (S, S) score matrix dominates.  This module picks the right
implementation per call site.

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


def causal_mask(s: int, dtype=jnp.bool_) -> jax.Array:
    """(1, 1, S, S) lower-triangular allow-mask."""
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    return (j <= i)[None, None].astype(dtype)


def length_mask(lengths: jax.Array, t: int) -> jax.Array:
    """(B, 1, 1, T) allow-mask of positions < lengths[b]."""
    j = jnp.arange(t)[None, :]
    return (j < lengths[:, None])[:, None, None, :]
