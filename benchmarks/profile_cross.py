"""Isolate decode cross-attention: XLA einsum vs the Pallas kernel.

Times a 32-layer sweep of cross-attention ONLY (no weights, no MLP) at
bench shapes, to locate the gap between the measured cost and the int8
cache-read floor (~983 MB/step -> ~1.2 ms at v5e HBM speed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()  # may re-exec before jax boots

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.ops.beam_attention import cross_attend
from faster_whisper_tpu.ops.quant import QuantKV

B, H, K, T, D, L = 8, 20, 5, 1500, 64, 32
STEPS = 64
dtype = jnp.bfloat16


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
    ckq = jnp.asarray(
        rng.integers(-127, 128, (L, B, H, T, D)), jnp.int8
    )
    cvq = jnp.asarray(rng.integers(-127, 128, (L, B, H, T, D)), jnp.int8)
    cks = jnp.asarray(rng.random((L, B, H, 1, T)) + 0.5, jnp.bfloat16)
    cvs = jnp.asarray(rng.random((L, B, H, 1, T)) + 0.5, jnp.bfloat16)
    ck = QuantKV(ckq, cks)
    cv = QuantKV(cvq, cvs)
    scale = D ** -0.5

    def xla_sweep(q0, ckq, cks, cvq, cvs):
        def body(i, carry):
            q, acc = carry
            k = jax.lax.dynamic_index_in_dim(ckq, i, 0, keepdims=False)
            v = jax.lax.dynamic_index_in_dim(cvq, i, 0, keepdims=False)
            ks = jax.lax.dynamic_index_in_dim(cks, i, 0, keepdims=False)
            vs = jax.lax.dynamic_index_in_dim(cvs, i, 0, keepdims=False)
            k, v = k.astype(dtype), v.astype(dtype)
            qx = jnp.swapaxes(q, 1, 2)  # (B, K, H, D)
            s = jnp.einsum(
                "bkhd,bhtd->bkht", qx, k, preferred_element_type=jnp.float32
            ) * scale
            s = s * jnp.swapaxes(ks, 1, 2)
            w = jax.nn.softmax(s, axis=-1)
            w = (w * jnp.swapaxes(vs, 1, 2)).astype(dtype)
            a = jnp.einsum("bkht,bhtd->bkhd", w, v)
            return q, acc + jnp.sum(a.astype(jnp.float32))

        def step(s, carry):
            q, acc = carry
            _, acc = jax.lax.fori_loop(0, L, body, (q, acc))
            return (q * (1.0 + 1e-6 * acc)).astype(dtype), acc  # defeat hoisting

        _, acc = jax.lax.fori_loop(0, STEPS, step, (q0, jnp.float32(0)))
        return acc

    def ker_sweep(q0, ck, cv):
        def body(i, carry):
            q, acc = carry
            a = cross_attend(i, q, ck, cv)
            return q, acc + jnp.sum(a.astype(jnp.float32))

        def step(s, carry):
            q, acc = carry
            _, acc = jax.lax.fori_loop(0, L, body, (q, acc))
            return (q * (1.0 + 1e-6 * acc)).astype(dtype), acc

        _, acc = jax.lax.fori_loop(0, STEPS, step, (q0, jnp.float32(0)))
        return acc

    def xla_s8_sweep(q0, ckq, cks, cvq, cvs):
        """XLA path with NATIVE s8 MXU dots: q (and the post-softmax
        weights) are dynamically quantized per row so the cache is
        consumed as int8 directly — no bf16 upcast of the (B,H,T,D)
        slices on the critical path."""

        def body(i, carry):
            q, acc = carry
            k = jax.lax.dynamic_index_in_dim(ckq, i, 0, keepdims=False)
            v = jax.lax.dynamic_index_in_dim(cvq, i, 0, keepdims=False)
            ks = jax.lax.dynamic_index_in_dim(cks, i, 0, keepdims=False)
            vs = jax.lax.dynamic_index_in_dim(cvs, i, 0, keepdims=False)
            qx = jnp.swapaxes(q, 1, 2).astype(jnp.float32) * scale  # (B,K,H,D)
            q_s = jnp.maximum(
                jnp.max(jnp.abs(qx), axis=-1, keepdims=True) / 127.0, 1e-10
            )
            q_i8 = jnp.clip(jnp.round(qx / q_s), -127, 127).astype(jnp.int8)
            s = jnp.einsum(
                "bkhd,bhtd->bkht", q_i8, k, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * q_s
            s = s * jnp.swapaxes(ks, 1, 2)
            w = jax.nn.softmax(s, axis=-1)
            w = w * jnp.swapaxes(vs, 1, 2)
            w_s = jnp.maximum(
                jnp.max(jnp.abs(w), axis=-1, keepdims=True) / 127.0, 1e-10
            )
            w_i8 = jnp.round(w / w_s).astype(jnp.int8)
            a = jnp.einsum(
                "bkht,bhtd->bkhd", w_i8, v, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * w_s
            return q, acc + jnp.sum(a)

        def step(s, carry):
            q, acc = carry
            _, acc = jax.lax.fori_loop(0, L, body, (q, acc))
            return (q * (1.0 + 1e-6 * acc)).astype(dtype), acc

        _, acc = jax.lax.fori_loop(0, STEPS, step, (q0, jnp.float32(0)))
        return acc

    def xla_bf16s_sweep(q0, ckq, cks, cvq, cvs):
        """Evidence probe for the floor note (NOT production: bf16 score
        accumulation can flip beam decisions): keep the (B,K,H,T)
        attention-score tensor in bf16 end-to-end, halving the softmax
        round-trip traffic.  The delta vs xla_sweep measures how much of
        the 1.9 ms/step is materialized-softmax bytes rather than cache
        reads."""

        def body(i, carry):
            q, acc = carry
            k = jax.lax.dynamic_index_in_dim(ckq, i, 0, keepdims=False)
            v = jax.lax.dynamic_index_in_dim(cvq, i, 0, keepdims=False)
            ks = jax.lax.dynamic_index_in_dim(cks, i, 0, keepdims=False)
            vs = jax.lax.dynamic_index_in_dim(cvs, i, 0, keepdims=False)
            k, v = k.astype(dtype), v.astype(dtype)
            qx = jnp.swapaxes(q, 1, 2)
            s = jnp.einsum(
                "bkhd,bhtd->bkht", qx, k, preferred_element_type=dtype
            ) * jnp.bfloat16(scale)
            s = s * jnp.swapaxes(ks, 1, 2)
            w = jax.nn.softmax(s, axis=-1)  # bf16 in, bf16 out
            w = (w * jnp.swapaxes(vs, 1, 2)).astype(dtype)
            a = jnp.einsum("bkht,bhtd->bkhd", w, v)
            return q, acc + jnp.sum(a.astype(jnp.float32))

        def step(s, carry):
            q, acc = carry
            _, acc = jax.lax.fori_loop(0, L, body, (q, acc))
            return (q * (1.0 + 1e-6 * acc)).astype(dtype), acc

        _, acc = jax.lax.fori_loop(0, STEPS, step, (q0, jnp.float32(0)))
        return acc

    t = timeit(jax.jit(xla_sweep), q, ckq, cks, cvq, cvs)
    print(f"xla-cross     : {t*1e3:8.1f} ms -> {t/STEPS*1e3:6.2f} ms/step")
    t = timeit(jax.jit(xla_bf16s_sweep), q, ckq, cks, cvq, cvs)
    print(f"xla-bf16-sm   : {t*1e3:8.1f} ms -> {t/STEPS*1e3:6.2f} ms/step")
    t = timeit(jax.jit(xla_s8_sweep), q, ckq, cks, cvq, cvs)
    print(f"xla-s8-cross  : {t*1e3:8.1f} ms -> {t/STEPS*1e3:6.2f} ms/step")
    t = timeit(jax.jit(ker_sweep), q, ck, cv)
    print(f"pallas-cross  : {t*1e3:8.1f} ms -> {t/STEPS*1e3:6.2f} ms/step")


if __name__ == "__main__":
    main()
