"""A/B: attention-cache layouts for the decode step's einsum reads.

Current production layouts put heads AFTER the sequence axis
((B, ctx, H, D) / (B, T, H, D)), which makes the QK contraction a
transposed read of the cache.  These variants put heads first
((B, H, ctx, D)) so the per-(b, h) dot streams contiguously.
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
    B, K, CTX, H, Dh = 8, 5, 192, 20, 64
    L_self, L_cross, T = 8, 8, 1500
    q = jnp.asarray(rng.standard_normal((B, K, H, Dh)), jnp.bfloat16)

    # ---- beam-cache QK variants ----
    c_old = jnp.asarray(
        rng.integers(-127, 127, (L_self, B, K, CTX, H, Dh), dtype=np.int8)
    )
    c_new = jnp.asarray(np.moveaxis(np.asarray(c_old), 4, 2))  # (L,B,H,K,CTX,D)

    @jax.jit
    def qk_old(cache, q):
        def body(i, acc):
            sk = jax.lax.dynamic_index_in_dim(cache, i, 0, keepdims=False)
            sc = jnp.einsum("bkhd,bjchd->bkhjc", q, sk.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(sc, axis=(2, 3, 4))
        return jax.lax.fori_loop(0, L_self, body, jnp.zeros((B, K), jnp.float32))

    @jax.jit
    def qk_new(cache, q):
        def body(i, acc):
            sk = jax.lax.dynamic_index_in_dim(cache, i, 0, keepdims=False)
            sc = jnp.einsum("bkhd,bhjcd->bkhjc", q, sk.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(sc, axis=(2, 3, 4))
        return jax.lax.fori_loop(0, L_self, body, jnp.zeros((B, K), jnp.float32))

    gb = c_old.size / 1e9
    t = timeit(qk_old, c_old, q)
    print(f"self QK  (B,K,CTX,H,D): {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")
    t = timeit(qk_new, c_new, q)
    print(f"self QK  (B,H,K,CTX,D): {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")

    # ---- PV variants (weights (B,K,H,J,CTX) f32-ish bf16) ----
    w_attn = jnp.asarray(
        rng.standard_normal((B, K, H, K, CTX)), jnp.bfloat16
    )

    @jax.jit
    def pv_old(cache, w):
        def body(i, acc):
            sv = jax.lax.dynamic_index_in_dim(cache, i, 0, keepdims=False)
            at = jnp.einsum("bkhjc,bjchd->bkhd", w, sv.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(at, axis=(2, 3))
        return jax.lax.fori_loop(0, L_self, body, jnp.zeros((B, K), jnp.float32))

    @jax.jit
    def pv_new(cache, w):
        def body(i, acc):
            sv = jax.lax.dynamic_index_in_dim(cache, i, 0, keepdims=False)
            at = jnp.einsum("bkhjc,bhjcd->bkhd", w, sv.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(at, axis=(2, 3))
        return jax.lax.fori_loop(0, L_self, body, jnp.zeros((B, K), jnp.float32))

    t = timeit(pv_old, c_old, w_attn)
    print(f"self PV  (B,K,CTX,H,D): {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")
    t = timeit(pv_new, c_new, w_attn)
    print(f"self PV  (B,H,K,CTX,D): {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")

    # ---- cross-cache QK variants ----
    cc_old = jnp.asarray(
        rng.integers(-127, 127, (L_cross, B, T, H, Dh), dtype=np.int8)
    )
    cc_new = jnp.asarray(np.moveaxis(np.asarray(cc_old), 3, 2))  # (L,B,H,T,D)

    @jax.jit
    def xqk_old(cache, q):
        def body(i, acc):
            ck = jax.lax.dynamic_index_in_dim(cache, i, 0, keepdims=False)
            sc = jnp.einsum("bkhd,bthd->bkht", q, ck.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(sc, axis=(2, 3))
        return jax.lax.fori_loop(0, L_cross, body, jnp.zeros((B, K), jnp.float32))

    @jax.jit
    def xqk_new(cache, q):
        def body(i, acc):
            ck = jax.lax.dynamic_index_in_dim(cache, i, 0, keepdims=False)
            sc = jnp.einsum("bkhd,bhtd->bkht", q, ck.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(sc, axis=(2, 3))
        return jax.lax.fori_loop(0, L_cross, body, jnp.zeros((B, K), jnp.float32))

    gb = cc_old.size / 1e9
    t = timeit(xqk_old, cc_old, q)
    print(f"cross QK (B,T,H,D): {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")
    t = timeit(xqk_new, cc_new, q)
    print(f"cross QK (B,H,T,D): {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")

    # ---- cross PV variants ----
    w_x = jnp.asarray(rng.standard_normal((B, K, H, T)), jnp.bfloat16)

    @jax.jit
    def xpv_old(cache, w):
        def body(i, acc):
            cv = jax.lax.dynamic_index_in_dim(cache, i, 0, keepdims=False)
            at = jnp.einsum("bkht,bthd->bkhd", w, cv.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(at, axis=(2, 3))
        return jax.lax.fori_loop(0, L_cross, body, jnp.zeros((B, K), jnp.float32))

    @jax.jit
    def xpv_new(cache, w):
        def body(i, acc):
            cv = jax.lax.dynamic_index_in_dim(cache, i, 0, keepdims=False)
            at = jnp.einsum("bkht,bhtd->bkhd", w, cv.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(at, axis=(2, 3))
        return jax.lax.fori_loop(0, L_cross, body, jnp.zeros((B, K), jnp.float32))

    t = timeit(xpv_old, cc_old, w_x)
    print(f"cross PV (B,T,H,D): {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")
    t = timeit(xpv_new, cc_new, w_x)
    print(f"cross PV (B,H,T,D): {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")


if __name__ == "__main__":
    main()
