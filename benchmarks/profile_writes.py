"""Isolate the decode-step KV-cache *write* cost: scatter vs DUS.

profile_step2.py attributed 8.8 ms of the 14.5 ms step to `selfwrite` —
the per-layer `.at[i, b_idx, k_idx, pos].set(...)` scatters (pos varies
per batch row because prompt lengths differ).  This harness times the
same write+read pattern with three strategies:

  scatter   : current production form — advanced-index scatter at
              per-(B,K) positions.
  dus       : lax.dynamic_update_slice at a uniform slot (layer i,
              slot = step) — legal once prompts are right-aligned so all
              rows write the same cache slot each step.
  dus-ctx2  : same but cache laid out (L, ctx, B, K, H, D) so the
              updated block is contiguous.

Each variant runs STEPS steps x L layers inside one jit, writes K and V
(int8 + scales) and reads the layer's full cache slice into a reduction
(the attention read that the real step does anyway), so deltas are
write-lowering cost only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.models.config import CONFIGS

B, K, CTX, STEPS = 8, 5, 192, 64
MODEL = os.environ.get("PROF_MODEL", "large-v3")


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


def build(config, mode):
    L = config.n_text_layer
    H = config.n_text_head
    D = config.n_text_state // H

    def loop(kq_cache, ks_cache, vq_cache, vs_cache, k_new, ks_new, pos):
        b_idx = jnp.arange(B)[:, None]
        k_idx = jnp.arange(K)[None, :]

        def step(s, carry):
            kq, ks, vq, vs, acc = carry

            def layer(i, carry):
                kq, ks, vq, vs, acc = carry
                if mode == "scatter":
                    p = pos + s
                    kq = kq.at[i, b_idx, k_idx, p].set(k_new)
                    ks = ks.at[i, b_idx, k_idx, p].set(ks_new)
                    vq = vq.at[i, b_idx, k_idx, p].set(k_new)
                    vs = vs.at[i, b_idx, k_idx, p].set(ks_new)
                    sk = jax.lax.dynamic_index_in_dim(kq, i, 0, keepdims=False)
                    sv = jax.lax.dynamic_index_in_dim(vq, i, 0, keepdims=False)
                elif mode == "dus":
                    upd_q = k_new[None, :, :, None]  # (1,B,K,1,H,D)
                    upd_s = ks_new[None, :, :, None]
                    kq = jax.lax.dynamic_update_slice(kq, upd_q, (i, 0, 0, s, 0, 0))
                    ks = jax.lax.dynamic_update_slice(ks, upd_s, (i, 0, 0, s, 0))
                    vq = jax.lax.dynamic_update_slice(vq, upd_q, (i, 0, 0, s, 0, 0))
                    vs = jax.lax.dynamic_update_slice(vs, upd_s, (i, 0, 0, s, 0))
                    sk = jax.lax.dynamic_index_in_dim(kq, i, 0, keepdims=False)
                    sv = jax.lax.dynamic_index_in_dim(vq, i, 0, keepdims=False)
                else:  # dus-ctx2: cache (L, ctx, B, K, H, D)
                    upd_q = k_new[None, None]  # (1,1,B,K,H,D)
                    upd_s = ks_new[None, None]
                    kq = jax.lax.dynamic_update_slice(kq, upd_q, (i, s, 0, 0, 0, 0))
                    ks = jax.lax.dynamic_update_slice(ks, upd_s, (i, s, 0, 0, 0))
                    vq = jax.lax.dynamic_update_slice(vq, upd_q, (i, s, 0, 0, 0, 0))
                    vs = jax.lax.dynamic_update_slice(vs, upd_s, (i, s, 0, 0, 0))
                    sk = jax.lax.dynamic_index_in_dim(kq, i, 0, keepdims=False)
                    sv = jax.lax.dynamic_index_in_dim(vq, i, 0, keepdims=False)
                acc = acc + jnp.sum(sk.astype(jnp.float32)) + jnp.sum(
                    sv.astype(jnp.float32)
                )
                return kq, ks, vq, vs, acc

            return jax.lax.fori_loop(0, L, layer, (kq, ks, vq, vs, acc))

        _, _, _, _, acc = jax.lax.fori_loop(
            0, STEPS, step, (kq_cache, ks_cache, vq_cache, vs_cache, jnp.float32(0))
        )
        return acc

    return jax.jit(loop)


def main():
    config = CONFIGS[MODEL]
    L = config.n_text_layer
    H = config.n_text_head
    D = config.n_text_state // H
    rng = np.random.default_rng(0)

    k_new = jnp.asarray(
        rng.integers(-127, 127, (B, K, H, D)), jnp.int8
    )
    ks_new = jnp.asarray(rng.standard_normal((B, K, H)), jnp.float32)
    pos = jnp.asarray(rng.integers(4, 32, (B, K)), jnp.int32)

    for mode in ("scatter", "dus", "dus-ctx2"):
        if mode == "dus-ctx2":
            shape_q = (L, CTX, B, K, H, D)
            shape_s = (L, CTX, B, K, H)
        else:
            shape_q = (L, B, K, CTX, H, D)
            shape_s = (L, B, K, CTX, H)
        fn = build(config, mode)
        args = (
            jnp.zeros(shape_q, jnp.int8),
            jnp.zeros(shape_s, jnp.float32),
            jnp.zeros(shape_q, jnp.int8),
            jnp.zeros(shape_s, jnp.float32),
            k_new,
            ks_new,
            pos,
        )
        t = timeit(fn, *args)
        print(
            f"{mode:10s}: {t*1e3:8.1f} ms total -> {t/STEPS*1e3:6.2f} ms/step",
            flush=True,
        )


if __name__ == "__main__":
    main()
