"""Feasibility probe for the whole-decoder megakernel (roadmap item 2).

One pallas_call per decode step, grid (L, B) with b fastest:
  * per-(l, b) int8 self/cross cache blocks via BlockSpec pipelining,
  * per-layer int8 weights (~23 MB for large-v3) streamed by manual
    double-buffered DMA from ANY-space inputs, issue spread across the
    B grid steps of the previous layer,
  * activations carried in VMEM scratch across grid steps,
  * all eight per-layer matmuls on the s8 MXU (batched-over-heads
    layouts, no in-kernel transposes).

This skeleton runs the real DMA pattern and the real matmul shapes but
fake attention math (no append, no masks) — it answers, before the real
kernel is built: does Mosaic lower it, and is the per-step wall-clock at
the ~3 ms DMA bound that motivates the design?
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

L, B, H, K, D, CTX, T = 32, 8, 20, 5, 64, 192, 1500
DM = H * D  # 1280
FF = 4 * DM  # 5120
STEPS = int(os.environ.get("STEPS", "64"))

# weight matrices per layer: name -> (rows, cols) of the int8 array
WSHAPES = {
    "wq": (DM, DM), "wk": (DM, DM), "wv": (DM, DM), "wo": (DM, DM),
    "cwq": (DM, DM), "cwo": (DM, DM), "w1": (DM, FF), "w2": (FF, DM),
}
WNAMES = list(WSHAPES)


def kernel(pos_ref,  # scalar prefetch (B,)
           x_in_ref,  # (1, K, DM) bf16
           sk_ref, sv_ref,  # (1, 1, H, K, CTX, D) int8
           ck_ref, cv_ref,  # (1, 1, H, T, D) int8
           *refs):
    n_w = len(WNAMES)
    w_hbm = refs[:n_w]  # (L, rows, cols) int8, ANY space
    x_out_ref = refs[n_w]
    xs = refs[n_w + 1]
    wbufs = refs[n_w + 2:n_w + 2 + n_w]
    sems = refs[-1]

    l, b = pl.program_id(0), pl.program_id(1)
    n_l, n_b = pl.num_programs(0), pl.num_programs(1)
    par = l % 2
    nxt = (l + 1) % 2

    # ---- weight DMA: issue next layer's matrix m at b-step m % B ----
    l_next = jnp.minimum(l + 1, n_l - 1)
    for m, name in enumerate(WNAMES):
        @pl.when((b == m % n_b) & (l + 1 < n_l))
        def _():
            pltpu.make_async_copy(
                w_hbm[m].at[l_next], wbufs[m].at[nxt], sems.at[nxt, m]
            ).start()

    # prologue: layer 0's weights are DMA'd at (0, 0) and waited inline
    @pl.when((l == 0) & (b == 0))
    def _():
        for m in range(n_w):
            pltpu.make_async_copy(
                w_hbm[m].at[0], wbufs[m].at[0], sems.at[0, m]
            ).start()

    # wait for this layer's weights once per layer
    @pl.when(b == 0)
    def _():
        for m in range(n_w):
            pltpu.make_async_copy(
                w_hbm[m].at[l], wbufs[m].at[par], sems.at[par, m]
            ).wait()

    # ---- fake layer compute at real shapes ----
    x = jnp.where(l == 0, x_in_ref[0], xs[...])  # (K, DM) bf16

    def dense(h, wbuf, rows, cols):
        hf = h.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0,
                         1e-10)
        hq = jnp.clip(jnp.round(hf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            hq, wbuf[par],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * sx * 2e-4

    q = dense(x, wbufs[0], DM, DM)
    kn = dense(x, wbufs[1], DM, DM)
    vn = dense(x, wbufs[2], DM, DM)
    # fake "attention": reduce the cache blocks so they must be read
    # (all intermediates rank >= 2 — Mosaic rejects rank-1 layouts here)
    s_term = (
        jnp.sum(sk_ref[0, 0].astype(jnp.float32), axis=(0, 2))
        + jnp.sum(sv_ref[0, 0].astype(jnp.float32), axis=(0, 2))
    )  # (K, D)
    s_term = jnp.sum(s_term, axis=-1, keepdims=True)  # (K, 1)
    attn = q + kn * 1e-3 + vn * 1e-3 + s_term * 1e-6
    x = x + dense(attn.astype(jnp.bfloat16), wbufs[3], DM, DM).astype(x.dtype)

    qx = dense(x, wbufs[4], DM, DM)
    c_term = (
        jnp.sum(ck_ref[0, 0].astype(jnp.float32), axis=0)
        + jnp.sum(cv_ref[0, 0].astype(jnp.float32), axis=0)
    )  # (T, D)
    c_term = jnp.mean(c_term, axis=0, keepdims=True)  # (1, D)
    c_term = jnp.mean(c_term, axis=1, keepdims=True)  # (1, 1)
    cattn = qx + c_term * 1e-6
    x = x + dense(cattn.astype(jnp.bfloat16), wbufs[5], DM, DM).astype(x.dtype)

    h1 = dense(x, wbufs[6], DM, FF)
    h1 = jax.nn.gelu(h1, approximate=True)  # erf(c) has no Pallas lowering
    x = x + dense(h1.astype(jnp.bfloat16), wbufs[7], FF, DM).astype(x.dtype)

    xs[...] = x
    x_out_ref[0] = x.astype(x_out_ref.dtype)


def build():
    def im_x(l, b, pref):
        return (b, 0, 0)

    def im_self(l, b, pref):
        return (l, b, 0, 0, 0, 0)

    def im_cross(l, b, pref):
        return (l, b, 0, 0, 0)

    def im_any(l, b, pref):
        return (0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, K, DM), im_x),
        pl.BlockSpec((1, 1, H, K, CTX, D), im_self),
        pl.BlockSpec((1, 1, H, K, CTX, D), im_self),
        pl.BlockSpec((1, 1, H, T, D), im_cross),
        pl.BlockSpec((1, 1, H, T, D), im_cross),
    ] + [
        pl.BlockSpec(memory_space=pl.ANY) for _ in WNAMES
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, K, DM), im_x),
        scratch_shapes=[
            pltpu.VMEM((K, DM), jnp.bfloat16),
        ] + [
            pltpu.VMEM((2,) + WSHAPES[n], jnp.int8) for n in WNAMES
        ] + [
            pltpu.SemaphoreType.DMA((2, len(WNAMES))),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, DM), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )


def main():
    rng = np.random.default_rng(0)
    pos = jnp.full((B,), 7, jnp.int32)
    x = jnp.asarray(rng.standard_normal((B, K, DM)), jnp.bfloat16)
    sk = jnp.asarray(rng.integers(-127, 127, (L, B, H, K, CTX, D)), jnp.int8)
    sv = jnp.asarray(rng.integers(-127, 127, (L, B, H, K, CTX, D)), jnp.int8)
    ck = jnp.asarray(rng.integers(-127, 127, (L, B, H, T, D)), jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 127, (L, B, H, T, D)), jnp.int8)
    ws = [jnp.asarray(rng.integers(-127, 127, (L,) + WSHAPES[n]), jnp.int8)
          for n in WNAMES]

    call = build()

    @jax.jit
    def run(x, sk, sv, ck, cv, *ws):
        def body(i, acc):
            out = call(pos, x, sk, sv, ck, cv, *ws)
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))

    t0 = time.perf_counter()
    out = run(x, sk, sv, ck, cv, *ws)
    float(out)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, sk, sv, ck, cv, *ws))
        best = min(best, time.perf_counter() - t0)
    gb = (sk.nbytes + sv.nbytes + ck.nbytes + cv.nbytes
          + sum(w.nbytes for w in ws)) / 1e9
    print(f"mega-skeleton: {best/STEPS*1e3:6.2f} ms/step "
          f"({gb:.2f} GB/step -> {gb/ (best/STEPS):.0f} GB/s effective)")


if __name__ == "__main__":
    main()
