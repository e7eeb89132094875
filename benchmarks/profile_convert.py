"""Isolate WHY the cache-attention reads are slow: convert
materialization vs loop overhead vs dtype of the dot.

Variants on the cross-cache QK read ((B,H,T,D) layout, per-(b,h) dots):
  A. int8 cache, astype(bf16) then einsum      (production today)
  B. bf16 cache, einsum directly               (2x bytes, no convert)
  C. int8 cache, int8 query -> int32 MXU dot   (no convert at all)
  D. variant A at L=32 (loop-overhead scaling check)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 16


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(out))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main():
    rng = np.random.default_rng(0)
    B, K, H, Dh, T = 8, 5, 20, 64, 1500
    q = jnp.asarray(rng.standard_normal((B, K, H, Dh)), jnp.bfloat16)
    q8 = jnp.asarray(rng.integers(-127, 127, (B, K, H, Dh), dtype=np.int8))

    def make(L, dtype):
        if dtype == np.int8:
            return jnp.asarray(
                rng.integers(-127, 127, (L, B, H, T, Dh), dtype=np.int8)
            )
        return jnp.asarray(
            rng.standard_normal((L, B, H, T, Dh)).astype(np.float32),
            jnp.bfloat16,
        )

    def loop(L, fn, init):
        def run(cache, q):
            def body(i, acc):
                ck = jax.lax.dynamic_index_in_dim(cache, i, 0, keepdims=False)
                return acc + fn(ck, q)
            return jax.lax.fori_loop(0, L, body, init)
        return jax.jit(run)

    def qk_bf16(ck, q):
        sc = jnp.einsum("bkhd,bhtd->bkht", q, ck.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return jnp.sum(sc, axis=(2, 3))

    def qk_native(ck, q):
        sc = jnp.einsum("bkhd,bhtd->bkht", q, ck,
                        preferred_element_type=jnp.float32)
        return jnp.sum(sc, axis=(2, 3))

    def qk_int8(ck, q8):
        sc = jax.lax.dot_general(
            q8, ck,
            (((3,), (3,)), ((0, 2), (0, 1))),  # contract d; batch (b, h)
            preferred_element_type=jnp.int32,
        )  # (B, H, K, T)
        return jnp.sum(sc, axis=(1, 3)).astype(jnp.float32)

    L = 8
    c8 = make(L, np.int8)
    cb = make(L, np.float32)
    gb8 = c8.size / 1e9
    gbb = cb.size * 2 / 1e9

    t = timeit(loop(L, qk_bf16, jnp.zeros((B, K), jnp.float32)), c8, q)
    print(f"A int8 + astype->einsum (L=8): {t*1e3:.2f} ms -> {gb8/t:.0f} GB/s")
    t = timeit(loop(L, qk_native, jnp.zeros((B, K), jnp.float32)), cb, q)
    print(f"B bf16 einsum           (L=8): {t*1e3:.2f} ms -> {gbb/t:.0f} GB/s")
    t = timeit(loop(L, qk_int8, jnp.zeros((B, K), jnp.float32)), c8, q8)
    print(f"C int8 x int8 dot       (L=8): {t*1e3:.2f} ms -> {gb8/t:.0f} GB/s")

    L = 32
    c8_32 = make(L, np.int8)
    gb = c8_32.size / 1e9
    t = timeit(loop(L, qk_bf16, jnp.zeros((B, K), jnp.float32)), c8_32, q)
    print(f"D int8 + astype->einsum (L=32): {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")
    t = timeit(loop(L, qk_int8, jnp.zeros((B, K), jnp.float32)), c8_32, q8)
    print(f"E int8 x int8 dot       (L=32): {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")


if __name__ == "__main__":
    main()
