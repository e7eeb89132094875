"""Isolate the fused append+attend self-attention kernel.

A 32-layer x STEPS sweep of beam_attend_append alone at bench shapes
(large-v3: B=8, H=20, K=5, ctx=192, int8 cache), at several write
positions.  The kernel fetches the FULL ctx cache block regardless of
``pos``; if its cost is flat in pos, a ctx-blocked variant that stops
fetching past the valid prefix (Mosaic dedups repeated block indices)
has ~(1 - avg_valid_fraction) of this number to win.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.ops.beam_attention import beam_attend_append
from faster_whisper_tpu.ops.quant import QuantKV

B, H, K, CTX, D, L = 8, 20, 5, 192, 64, 32
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

    def sweep(q, sk, sv, pos):
        def body(i, carry):
            q, sk, sv, acc = carry

            def layer(l, c):
                sk, sv, acc = c
                a, sk, sv = beam_attend_append(
                    l, pos, q, kn, vn, sk, sv, anc
                )
                return sk, sv, acc + jnp.sum(a.astype(jnp.float32))

            sk, sv, acc = jax.lax.fori_loop(0, L, layer, (sk, sv, acc))
            return (q * (1 + 1e-6 * acc)).astype(dtype), sk, sv, acc

        out = jax.lax.fori_loop(0, STEPS, body, (q, sk, sv, jnp.float32(0)))
        return out[3]

    jitted = jax.jit(sweep)
    for pos_val in (8, 64, 120, 184):
        pos = jnp.full((B,), pos_val, jnp.int32)
        t = timeit(jitted, q, sk, sv, pos)
        print(
            f"pos={pos_val:4d}: {t*1e3:8.1f} ms -> "
            f"{t/STEPS*1e3:6.2f} ms/32-layer-step"
        )


if __name__ == "__main__":
    main()
