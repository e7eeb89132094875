"""Anatomy of the fused kernel's per-pallas_call overhead.

profile_self_kernel.py shows ~78 us per 1-layer call of which only ~25
us is the cache DMA.  This script times stripped variants at the same
shapes to locate the rest:

  full      : production kernel (append + attend, 5 aliased outputs,
              2 scalar-prefetch operands)
  no-append : attention only — same inputs, ONE output, no aliasing
  no-scalar : no-append variant with layer/pos baked as constants
              (plain grid, no PrefetchScalarGridSpec)

If no-append collapses toward the DMA floor, the overhead is the
aliased-output flush machinery; if only no-scalar does, it is the
scalar-prefetch path; if neither, it is fixed pallas_call launch cost
and only fewer calls (a megakernel) can remove it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from faster_whisper_tpu.ops.beam_attention import (
    _head_block,
    _kernel_quant,
    beam_attend_append,
)
from faster_whisper_tpu.ops.quant import QuantKV

B, H, K, CTX, D, L = 8, 20, 5, 192, 64, 32
STEPS = 64
dtype = jnp.bfloat16
_NEG_INF = -1e30


def _attend_only_kernel(
    layer_ref, pos_ref,
    q_ref, kq_ref, ks_ref, vq_ref, vs_ref, anc_ref,
    attn_ref, *, d_scale,
):
    b = pl.program_id(0)
    pos = pos_ref[b]
    hb, k, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    ctx = kq_ref.shape[4]
    qf = q_ref[0].astype(jnp.float32) * d_scale
    q_s = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0, 1e-10)
    q_i8 = jnp.clip(jnp.round(qf / q_s), -127, 127).astype(jnp.int8)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (k, ctx), 0)
    c_ids2 = jax.lax.broadcasted_iota(jnp.int32, (k, ctx), 1)
    anc = anc_ref[0]
    allow = c_ids2 <= pos
    scores_j = []
    for j in range(k):
        s_j = jax.lax.dot_general(
            q_i8, kq_ref[0, 0, :, j],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * q_s
        s_j = s_j * ks_ref[0, 0, :, j][:, None].astype(jnp.float32)
        s_j = jnp.where(((anc == j) & allow)[None], s_j, _NEG_INF)
        scores_j.append(s_j)
    m = scores_j[0].max(axis=-1, keepdims=True)
    for s_j in scores_j[1:]:
        m = jnp.maximum(m, s_j.max(axis=-1, keepdims=True))
    exps = [jnp.exp(s_j - m) for s_j in scores_j]
    denom = exps[0].sum(axis=-1, keepdims=True)
    for e_j in exps[1:]:
        denom = denom + e_j.sum(axis=-1, keepdims=True)
    attn = jnp.zeros((hb, k, d), jnp.float32)
    for j in range(k):
        p_j = exps[j] / denom
        p_j = p_j * vs_ref[0, 0, :, j][:, None].astype(jnp.float32)
        p_s = jnp.maximum(jnp.max(p_j, axis=-1, keepdims=True) / 127.0, 1e-10)
        p_i8 = jnp.round(p_j / p_s).astype(jnp.int8)
        attn = attn + jax.lax.dot_general(
            p_i8, vq_ref[0, 0, :, j],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * p_s
    attn_ref[0] = attn.astype(attn_ref.dtype)


def attend_only(layer, pos_row, q, self_k, self_v, anc):
    b, h, k, d = q.shape
    ctx = self_k.q.shape[4]
    hb = _head_block(h, k, ctx)
    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))

    def im_bhk(bi, hi, lref, pref):
        return (bi, hi, 0, 0)

    def im_cache(bi, hi, lref, pref):
        return (lref[0], bi, hi, 0, 0, 0)

    def im_scale(bi, hi, lref, pref):
        return (lref[0], bi, hi, 0, 0)

    def im_anc(bi, hi, lref, pref):
        return (bi, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h // hb),
        in_specs=[
            pl.BlockSpec((1, hb, k, d), im_bhk),
            pl.BlockSpec((1, 1, hb, k, ctx, d), im_cache),
            pl.BlockSpec((1, 1, hb, k, ctx), im_scale),
            pl.BlockSpec((1, 1, hb, k, ctx, d), im_cache),
            pl.BlockSpec((1, 1, hb, k, ctx), im_scale),
            pl.BlockSpec((1, k, ctx), im_anc),
        ],
        out_specs=pl.BlockSpec((1, hb, k, d), im_bhk),
    )
    return pl.pallas_call(
        functools.partial(_attend_only_kernel, d_scale=d ** -0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, k, d), q.dtype),
    )(layer_arr, pos_row.astype(jnp.int32), q, self_k.q, self_k.s,
      self_v.q, self_v.s, anc)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(out))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, K, D)), dtype)
    kn = jnp.asarray(rng.standard_normal((B, H, K, D)), dtype)
    vn = jnp.asarray(rng.standard_normal((B, H, K, D)), dtype)
    sk = QuantKV(
        jnp.asarray(rng.integers(-127, 128, (L, B, H, K, CTX, D)), jnp.int8),
        jnp.asarray(rng.random((L, B, H, K, CTX)) + 0.5, jnp.bfloat16),
    )
    sv = QuantKV(
        jnp.asarray(rng.integers(-127, 128, (L, B, H, K, CTX, D)), jnp.int8),
        jnp.asarray(rng.random((L, B, H, K, CTX)) + 0.5, jnp.bfloat16),
    )
    anc = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, CTX)
    )
    pos = jnp.full((B,), 120, jnp.int32)

    def full_sweep(q, sk, sv):
        def body(i, carry):
            q, sk, sv, acc = carry

            def layer(l, c):
                sk, sv, acc = c
                a, sk, sv = beam_attend_append(l, pos, q, kn, vn, sk, sv, anc)
                return sk, sv, acc + jnp.sum(a.astype(jnp.float32))

            sk, sv, acc = jax.lax.fori_loop(0, L, layer, (sk, sv, acc))
            return (q * (1 + 1e-6 * acc)).astype(dtype), sk, sv, acc

        return jax.lax.fori_loop(0, STEPS, body, (q, sk, sv, jnp.float32(0)))[3]

    def attend_sweep(q, sk, sv):
        def body(i, carry):
            q, acc = carry

            def layer(l, acc):
                a = attend_only(l, pos, q, sk, sv, anc)
                return acc + jnp.sum(a.astype(jnp.float32))

            acc = jax.lax.fori_loop(0, L, layer, acc)
            return (q * (1 + 1e-6 * acc)).astype(dtype), acc

        return jax.lax.fori_loop(0, STEPS, body, (q, jnp.float32(0)))[1]

    t = timeit(jax.jit(full_sweep), q, sk, sv)
    print(f"full (append+attend, aliased): {t/STEPS*1e3:6.2f} ms/32-layer-step")
    t = timeit(jax.jit(attend_sweep), q, sk, sv)
    print(f"attend-only (1 output)       : {t/STEPS*1e3:6.2f} ms/32-layer-step")


if __name__ == "__main__":
    main()
