"""Mosaic micro-costs that gate the decoder megakernel design.

The roadmap's decoder-layer megakernel (PARITY.md) must reconcile two
layouts inside one kernel: projections produce activations as
(B*K, H*D) MXU-flat rows, while the attention math wants head-major
(H, K, D) blocks.  The two candidate bridges are (a) per-head lane-slice
dots — 20 small (K, 64) x (ctx, 64)^T dots instead of one H-batched
dot_general — and (b) an explicit in-kernel relayout.  This measures (a)
against the batched baseline at bench shapes; if per-head dots are close
to batched, the megakernel can keep activations flat and slice lanes per
head, avoiding relayouts entirely.

  batched : scores via one dot_general batching over H (the production
            kernel's shape), J-slot loop as in _kernel_quant
  perhead : same math, H unrolled into 20 lane-slice dots per J slot
            (100 small dots per grid step)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, K, CTX, D, L = 8, 20, 5, 192, 64, 32
STEPS = 64
_NEG_INF = -1e30


def _batched_kernel(layer_ref, q_ref, kq_ref, out_ref):
    # q (1, H, K, D) bf16; kq (1, H, K, CTX, D) int8: one dot per J slot
    hb, k, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    ctx = kq_ref.shape[4]
    qf = q_ref[0].astype(jnp.float32)
    q_s = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0, 1e-10)
    q_i8 = jnp.clip(jnp.round(qf / q_s), -127, 127).astype(jnp.int8)
    acc = jnp.zeros((hb, k, ctx), jnp.float32)
    for j in range(k):
        s_j = jax.lax.dot_general(
            q_i8, kq_ref[0, 0, :, j],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * q_s
        acc = acc + s_j
    out_ref[0] = jnp.sum(acc, axis=-1)


def _perhead_kernel(layer_ref, q_ref, kq_ref, out_ref):
    # q (1, K, H*D) bf16 flat rows; kq (1, H, K, CTX, D) int8.
    # Scores computed per (j, h) with lane-slice dots.
    k = q_ref.shape[1]
    h_total = kq_ref.shape[2]
    ctx, d = kq_ref.shape[4], kq_ref.shape[5]
    qf = q_ref[0].astype(jnp.float32)  # (K, H*D)
    q_s = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0, 1e-10)
    q_i8 = jnp.clip(jnp.round(qf / q_s), -127, 127).astype(jnp.int8)
    out = jnp.zeros((k,), jnp.float32)
    for j in range(k):
        for h in range(h_total):
            q_h = q_i8[:, h * d:(h + 1) * d]  # (K, D) lane slice
            s = jax.lax.dot_general(
                q_h, kq_ref[0, 0, h, j],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # (K, CTX)
            out = out + jnp.sum(s, axis=-1) * q_s[:, 0]
    out_ref[0] = out


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
    q_hkd = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.bfloat16)
    q_flat = jnp.asarray(rng.standard_normal((B, K, H * D)), jnp.bfloat16)
    kq = jnp.asarray(
        rng.integers(-127, 128, (L, B, H, K, CTX, D)), jnp.int8
    )

    def im_q(bi, lref):
        return (bi, 0, 0, 0)

    def im_cache(bi, lref):
        return (lref[0], bi, 0, 0, 0, 0)

    def call_batched(layer, q, kq):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, K, D), im_q),
                pl.BlockSpec((1, 1, H, K, CTX, D), im_cache),
            ],
            out_specs=pl.BlockSpec((1, K), lambda bi, lref: (bi, 0)),
        )
        return pl.pallas_call(
            _batched_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
        )(jnp.reshape(layer.astype(jnp.int32), (1,)), q, kq)

    def call_perhead(layer, q, kq):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, K, H * D), lambda bi, lref: (bi, 0, 0)),
                pl.BlockSpec((1, 1, H, K, CTX, D), im_cache),
            ],
            out_specs=pl.BlockSpec((1, K), lambda bi, lref: (bi, 0)),
        )
        return pl.pallas_call(
            _perhead_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
        )(jnp.reshape(layer.astype(jnp.int32), (1,)), q, kq)

    def sweep(call, q):
        def f(q, kq):
            def body(i, carry):
                q, acc = carry

                def layer(l, a):
                    return a + jnp.sum(call(l, q, kq))

                acc = jax.lax.fori_loop(0, L, layer, acc)
                return (q * (1 + 1e-6 * acc)).astype(q.dtype), acc

            return jax.lax.fori_loop(0, STEPS, body, (q, jnp.float32(0)))[1]

        return timeit(jax.jit(f), q, kq)

    t = sweep(call_batched, q_hkd)
    print(f"batched H-dot : {t/STEPS*1e3:6.2f} ms/32-layer-step")
    t = sweep(call_perhead, q_flat)
    print(f"per-head dots : {t/STEPS*1e3:6.2f} ms/32-layer-step")


if __name__ == "__main__":
    main()
