"""Multi-head attention for TPU.

Two production paths, selected by shape (see ``mha_full``):

* Encoder self-attention (S >= 1024): the Pallas flash kernel with
  512-wide blocks, DEFAULT ON for TPU backends (``FWT_FLASH=0``
  disables).  Measured numbers live in benchmarks/README.md
  ("Decode-loop profilers" table, profile_encoder_attn.py row); at
  encoder shapes the 512-block flash kernel beats the plain XLA
  lowering ~1.8x.  The library-default flash block sizes lose — block
  sizing is the whole story.
* Everything else (decoder cross/self at short S, CPU tests): the plain
  XLA path below — two batched matmuls with an f32 softmax between,
  already MXU-friendly at those shapes.

Perf claims here are pointers only; the single source of truth for
measured numbers is benchmarks/README.md.

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
    # Default ON for TPU backends (FWT_FLASH=0 disables).  Measured on
    # v5e at the encoder's shapes (B=8, H=20, S=1500, D=64),
    # benchmarks/profile_encoder_attn.py:
    #   XLA plain path            5.33 ms/layer (materializes (S,S) f32)
    #   flash, 512x512 blocks     2.96 ms/layer  <- production
    #   flash, library defaults  ~13 ms/layer (the round-1 measurement
    #                             that kept this path off — block sizing
    #                             was the whole story)
    #   splash (vmapped/batch)   15.1 ms/layer
    import os

    if os.environ.get("FWT_FLASH", "1") == "0":
        return False
    return jax.default_backend() in ("tpu", "axon")


def mha_full(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Unmasked full MHA (encoder self-attention), (B, S, H, D) layout.

    Production path on TPU for S >= 1024: the Pallas flash kernel with
    512-wide blocks (2.96 ms/layer vs XLA's 5.33 at encoder shapes — see
    _flash_enabled).  Elsewhere (CPU tests, short S) the plain XLA
    attention above.
    """
    s = q.shape[1]
    if _flash_enabled() and s >= 1024 and k.shape[1] == s:
        return _mha_flash_full(q, k, v)
    return mha(q, k, v)


_FLASH_BLOCK = 512


def _mha_flash_full(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, s, h, d = q.shape
    pad = (-s) % _FLASH_BLOCK
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

    blk = min(_FLASH_BLOCK, s + pad)
    block_sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk,
    )
    out = flash_attention(
        qt, kt, vt, segment_ids=segment_ids, sm_scale=float(d) ** -0.5,
        block_sizes=block_sizes,
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
