"""HBM bandwidth reality check on the attached chip.

Measures achievable HBM read bandwidth for the access patterns the decode
step actually uses:

  1. plain streaming reduce over a large contiguous bf16 array,
  2. int8 streaming reduce,
  3. skinny GEMM chain (40 x 1280 @ 1280 x 5120, int8 weights) — the
     decode step's weight-streaming pattern,
  4. the beam cache read pattern: (L, B, K, ctx, H, D) int8 gather+einsum.

If (1) is near spec but (3)/(4) are far below, the step is not
bandwidth-bound but layout/fusion-bound and restructuring pays; if (1)
itself is low, the per-step floor is real.
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

    # 1. contiguous bf16 stream (1 GB)
    big = jnp.asarray(rng.standard_normal((512, 1024, 1024)), jnp.bfloat16)
    f = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))
    t = timeit(f, big)
    gb = big.size * 2 / 1e9
    print(f"bf16 stream reduce: {gb:.2f} GB in {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")

    # 2. int8 stream
    big8 = jnp.asarray(
        rng.integers(-127, 127, (1024, 1024, 1024), dtype=np.int8)
    )
    f8 = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))
    t = timeit(f8, big8)
    gb = big8.size / 1e9
    print(f"int8 stream reduce: {gb:.2f} GB in {t*1e3:.2f} ms -> {gb/t:.0f} GB/s")

    # 3. skinny GEMM chain over int8 weights (decode weight pattern):
    # 64 layers of (40, 5120) @ (5120, 5120)-int8 ~ 1.7 GB of weight reads
    NL, R, D = 64, 40, 5120
    w8 = jnp.asarray(rng.integers(-127, 127, (NL, D, D), dtype=np.int8))
    ws = jnp.asarray(rng.standard_normal((NL, D)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((R, D)), jnp.bfloat16)

    @jax.jit
    def chain(w8, ws, x):
        def body(i, x):
            w = jax.lax.dynamic_index_in_dim(w8, i, 0, keepdims=False)
            s = jax.lax.dynamic_index_in_dim(ws, i, 0, keepdims=False)
            y = jnp.dot(x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            return (y * s).astype(jnp.bfloat16) * jnp.bfloat16(1e-2)

        return jax.lax.fori_loop(0, NL, body, x)

    t = timeit(chain, w8, ws, x0)
    gb = w8.size / 1e9
    print(f"skinny int8 GEMM chain: {gb:.2f} GB weights in {t*1e3:.2f} ms "
          f"-> {gb/t:.0f} GB/s")

    # 4. beam-cache einsum pattern: (B,J,ctx,H,D) int8 -> bkhjc scores
    B, K, CTX, H, Dh, L = 8, 5, 192, 20, 64, 8
    cache8 = jnp.asarray(
        rng.integers(-127, 127, (L, B, K, CTX, H, Dh), dtype=np.int8)
    )
    q = jnp.asarray(rng.standard_normal((B, K, H, Dh)), jnp.bfloat16)

    @jax.jit
    def cache_read(cache8, q):
        def body(i, acc):
            sk = jax.lax.dynamic_index_in_dim(cache8, i, 0, keepdims=False)
            sc = jnp.einsum(
                "bkhd,bjchd->bkhjc", q, sk.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return acc + jnp.sum(sc, axis=(2, 3, 4))

        return jax.lax.fori_loop(0, L, body, jnp.zeros((B, K), jnp.float32))

    t = timeit(cache_read, cache8, q)
    gb = cache8.size / 1e9
    print(f"beam-cache int8 einsum: {gb:.2f} GB in {t*1e3:.2f} ms "
          f"-> {gb/t:.0f} GB/s")

    # 5. cross-cache einsum pattern: (B,T,H,D) int8, T=1500
    T = 1500
    cc8 = jnp.asarray(
        rng.integers(-127, 127, (32, B, T, H, Dh), dtype=np.int8)
    )

    @jax.jit
    def cross_read(cc8, q):
        def body(i, acc):
            ck = jax.lax.dynamic_index_in_dim(cc8, i, 0, keepdims=False)
            sc = jnp.einsum(
                "bkhd,bthd->bkht", q, ck.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return acc + jnp.sum(sc, axis=(2, 3))

        return jax.lax.fori_loop(0, 32, body, jnp.zeros((B, K), jnp.float32))

    t = timeit(cross_read, cc8, q)
    gb = cc8.size / 1e9
    print(f"cross-cache int8 einsum: {gb:.2f} GB in {t*1e3:.2f} ms "
          f"-> {gb/t:.0f} GB/s")


if __name__ == "__main__":
    main()
