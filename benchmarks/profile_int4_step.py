#!/usr/bin/env python
"""Probe 2: int4 at the production decode-step access patterns.

(a) stacked decoder-layer weights (L, d, d) streamed by dynamic_index
    inside a fori_loop (the production ``take`` pattern in
    generation/generate.py::_gen_decoder_step) — int8 arguments vs an
    int4 temp converted once at program entry;
(b) the cross-attention einsum pair over a (L, B, H, T, D) K/V cache —
    int8 QuantKV vs int4 storage (upcast to bf16 fused into the dot);
(c) the logits head (V, d) int8 vs int4.

These three are ~1.7 GB of the step's ~2.5 GB HBM stream; if S4 halves
their read the step marginal drops from 6.56 ms toward ~4.2 ms.
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


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def bench(fn, *args, reps=20):
    fn(*args)
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    L, d, rows, steps = 32, 1280, 40, 16
    B, K, H, T, D = 8, 5, 20, 1500, 64
    V = 51866

    # (a) stacked weights in a step loop ---------------------------------
    w = jnp.asarray(rng.integers(-8, 8, (L, d, d), dtype=np.int8))
    x0 = jnp.asarray(rng.random((rows, d), np.float32), jnp.bfloat16)

    def loop(to4):
        def f(x, w_all):
            if to4:
                w_all = jax.lax.optimization_barrier(w_all.astype(jnp.int4))

            def step(_, x):
                def body(i, x):
                    wi = jax.lax.dynamic_index_in_dim(w_all, i, 0, False)
                    xf = x.astype(jnp.float32)
                    s = jnp.maximum(
                        jnp.max(jnp.abs(xf), -1, keepdims=True) / 127.0, 1e-10
                    )
                    xq = jnp.round(xf / s).astype(jnp.int8)
                    acc = jax.lax.dot_general(
                        xq, wi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    return (acc.astype(jnp.float32) * s * 1e-3).astype(
                        jnp.bfloat16
                    )

                return jax.lax.fori_loop(0, L, body, x)

            return jax.lax.fori_loop(0, steps, step, x)

        return jax.jit(f)

    t8 = bench(loop(False), x0, w)
    t4 = bench(loop(True), x0, w)
    per8, per4 = t8 / steps * 1e3, t4 / steps * 1e3
    gb = L * d * d / 1e9
    print(
        f"(a) stacked weights: s8 {per8:.2f} ms/step ({gb/per8*1e3:.0f} GB/s)"
        f"  s4 {per4:.2f} ms/step ({gb/2/per4*1e3:.0f} GB/s packed)"
        f"  speedup {per8/per4:.2f}x"
    )

    # (b) cross-attention einsum pair ------------------------------------
    ck = jnp.asarray(rng.integers(-8, 8, (L, B, H, T, D), dtype=np.int8))
    cv = jnp.asarray(rng.integers(-8, 8, (L, B, H, T, D), dtype=np.int8))
    qx = jnp.asarray(rng.random((B, K, H, D), np.float32), jnp.bfloat16)

    def cross(to4):
        def f(q, ck, cv):
            if to4:
                ck = jax.lax.optimization_barrier(ck.astype(jnp.int4))
                cv = jax.lax.optimization_barrier(cv.astype(jnp.int4))

            def step(_, q):
                def body(i, q):
                    k = jax.lax.dynamic_index_in_dim(ck, i, 0, False).astype(
                        jnp.bfloat16
                    )
                    v = jax.lax.dynamic_index_in_dim(cv, i, 0, False).astype(
                        jnp.bfloat16
                    )
                    s = jnp.einsum(
                        "bkhd,bhtd->bkht", q, k,
                        preferred_element_type=jnp.float32,
                    )
                    wgt = jax.nn.softmax(s * 0.125, axis=-1).astype(jnp.bfloat16)
                    o = jnp.einsum("bkht,bhtd->bkhd", wgt, v)
                    return (q + o * 1e-3).astype(jnp.bfloat16)

                return jax.lax.fori_loop(0, L, body, q)

            return jax.lax.fori_loop(0, steps, step, q)

        return jax.jit(f)

    t8 = bench(cross(False), qx, ck, cv)
    t4 = bench(cross(True), qx, ck, cv)
    per8, per4 = t8 / steps * 1e3, t4 / steps * 1e3
    gb = 2 * L * B * H * T * D / 1e9
    print(
        f"(b) cross K/V attend: s8 {per8:.2f} ms/step ({gb/per8*1e3:.0f} GB/s)"
        f"  s4 {per4:.2f} ms/step ({gb/2/per4*1e3:.0f} GB/s packed)"
        f"  speedup {per8/per4:.2f}x"
    )

    # (c) logits head ------------------------------------------------------
    wl = jnp.asarray(rng.integers(-8, 8, (d, V), dtype=np.int8))
    xl = jnp.asarray(rng.random((rows, d), np.float32), jnp.bfloat16)

    def logits(to4):
        def f(x, w):
            if to4:
                w = jax.lax.optimization_barrier(w.astype(jnp.int4))

            def step(_, acc):
                xf = (x + acc[:, :d] * 1e-6).astype(jnp.float32)
                s = jnp.maximum(
                    jnp.max(jnp.abs(xf), -1, keepdims=True) / 127.0, 1e-10
                )
                xq = jnp.round(xf / s).astype(jnp.int8)
                out = jax.lax.dot_general(
                    xq, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                return out

            return jax.lax.fori_loop(0, steps, step, jnp.zeros((rows, V)))

        return jax.jit(f)

    t8 = bench(logits(False), xl, wl)
    t4 = bench(logits(True), xl, wl)
    per8, per4 = t8 / steps * 1e3, t4 / steps * 1e3
    gb = d * V / 1e9
    print(
        f"(c) logits head: s8 {per8:.2f} ms/step ({gb/per8*1e3:.0f} GB/s)"
        f"  s4 {per4:.2f} ms/step ({gb/2/per4*1e3:.0f} GB/s packed)"
        f"  speedup {per8/per4:.2f}x"
    )


if __name__ == "__main__":
    main()
