"""Encoder self-attention kernel shootout at Whisper large-v3 shapes.

XLA's lowering materializes the (S, S) f32 scores (~2.9 GB/layer of HBM
traffic at B=8); flash/splash kernels keep the softmax in VMEM.  This
measures one full 32-layer encoder's worth of attention for each
candidate.
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

B, H, S, D, L = 8, 20, 1500, 64, 32
dtype = jnp.bfloat16


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from faster_whisper_tpu.ops.attention import mha

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype)

    @jax.jit
    def xla_l(q, k, v):
        def body(i, acc):
            o = mha(q * (1 + 1e-9 * acc), k, v)
            return acc + jnp.sum(o.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, L, body, jnp.float32(0))

    t = timeit(xla_l, q, k, v)
    print(f"xla mha        : {t*1e3:7.1f} ms -> {t/L*1e3:6.2f} ms/layer")

    # stock flash kernel
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    pad = (-S) % 512
    seg = jnp.broadcast_to(
        (jnp.arange(S + pad) < S).astype(jnp.int32)[None], (B, S + pad)
    )

    def make_flash(block_sizes):
        @jax.jit
        def flash_l(q, k, v):
            qt = jnp.pad(
                q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, pad), (0, 0))
            )
            kt = jnp.pad(
                k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, pad), (0, 0))
            )
            vt = jnp.pad(
                v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, pad), (0, 0))
            )

            def body(i, acc):
                o = flash_attention(
                    qt * (1 + 1e-9 * acc), kt, vt,
                    segment_ids=SegmentIds(q=seg, kv=seg),
                    sm_scale=D ** -0.5,
                    block_sizes=block_sizes,
                )
                return acc + jnp.sum(o.astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, L, body, jnp.float32(0))

        return flash_l

    sp = S + pad
    for bq, bkv in ((512, 512), (1024, 512), (512, 1024)):
        bs = BlockSizes(
            block_q=min(bq, sp), block_k_major=min(bkv, sp),
            block_k=min(bkv, sp), block_b=1,
            block_q_major_dkv=min(bq, sp), block_k_major_dkv=min(bkv, sp),
            block_k_dkv=min(bkv, sp), block_q_dkv=min(bq, sp),
            block_k_major_dq=min(bkv, sp), block_k_dq=min(bkv, sp),
            block_q_dq=min(bq, sp),
        )
        try:
            t = timeit(make_flash(bs), q, k, v)
            print(f"flash {bq}x{bkv} : {t*1e3:7.1f} ms -> {t/L*1e3:6.2f} ms/layer")
        except Exception as e:
            print(f"flash {bq}x{bkv} failed: {type(e).__name__}: {str(e)[:120]}")

    # splash attention
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sak,
            splash_attention_mask as sam,
        )

        mask = sam.MultiHeadMask(
            [sam.FullMask((S + pad, S + pad)) for _ in range(H)]
        )
        kernel = sak.make_splash_mha(
            mask=mask, head_shards=1, q_seq_shards=1
        )
        seg1 = (jnp.arange(S + pad) < S).astype(jnp.int32)
        from jax.experimental.pallas.ops.tpu.splash_attention.splash_attention_kernel import SegmentIds as SplashSeg

        @jax.jit
        def splash_l(q, k, v):
            qt = jnp.pad(
                q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, pad), (0, 0))
            )
            kt = jnp.pad(
                k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, pad), (0, 0))
            )
            vt = jnp.pad(
                v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, pad), (0, 0))
            )

            def one(qb, kb, vb):
                return kernel(
                    qb * (D ** -0.5), kb, vb,
                    segment_ids=SplashSeg(q=seg1, kv=seg1),
                )

            def body(i, acc):
                o = jax.vmap(one)(qt * (1 + 1e-9 * acc), kt, vt)
                return acc + jnp.sum(o.astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, L, body, jnp.float32(0))

        t = timeit(splash_l, q, k, v)
        print(f"splash         : {t*1e3:7.1f} ms -> {t/L*1e3:6.2f} ms/layer")
    except Exception as e:
        print(f"splash failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
