"""Cost probe for in-kernel head split/merge strategies (megakernel design).

The megakernel computes projections as one (K, DM) x (DM, DM) MXU dot,
but the attention math needs q as (H, K, D).  A plain
``reshape(K, H, D).transpose(1, 0, 2)`` does not lower (Mosaic internal
error), so the candidates are:

  presplit   : q enters the kernel already (H, K, D) — lower bound,
               measures just the attention dots.
  slicestack : q enters flat (K, DM); per-head 64-wide lane slices are
               stacked into (H, K, D) (odd heads start mid-register),
               and the output side accumulates per-head row-sliced
               dots against the flat (DM, DM) weight — no merges.
  pad128     : like slicestack but q enters (K, H*128) (projection
               weights column-padded so every head starts 128-aligned).

Each variant runs the attention dots + softmax at large-v3 decode
shapes; a scratch accumulator carries across grid steps so nothing is
hoisted or dead-code-eliminated.
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

H, K, D, CTX = 20, 5, 64, 192
DM = H * D
ITERS = 256


def kernel(x_ref, kc_ref, w_ref, o_ref, acc_ref, *, mode):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # perturb x by the carried accumulator so each iteration depends on
    # the previous one (defeats hoisting)
    fb = acc_ref[0, 0, 0]

    if mode == "presplit":
        q = x_ref[...].astype(jnp.float32) + fb  # (H, K, D)
    elif mode == "slicestack":
        xf = x_ref[...].astype(jnp.float32) + fb  # (K, DM)
        q = jnp.stack(
            [xf[:, h * D:(h + 1) * D] for h in range(H)], axis=0
        )  # (H, K, D)
    else:  # pad128
        xf = x_ref[...].astype(jnp.float32) + fb  # (K, H*128)
        q = jnp.stack(
            [xf[:, h * 128:h * 128 + D] for h in range(H)], axis=0
        )

    s = jax.lax.dot_general(
        q.astype(jnp.bfloat16), kc_ref[...],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, K, CTX)
    p = jax.nn.softmax(s, axis=-1)
    a = jax.lax.dot_general(
        p.astype(jnp.bfloat16), kc_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, K, D)

    # output side: accumulate per-head row-sliced dots against the flat
    # (DM, DM) int8 weight — the megakernel's wo path (no merges)
    out = jnp.zeros((K, DM), jnp.float32)
    for h in range(H):
        a_h = a[h]  # (K, D) major-dim slice, free
        a_s = jnp.maximum(
            jnp.max(jnp.abs(a_h), axis=-1, keepdims=True) / 127.0, 1e-10
        )
        a_i8 = jnp.clip(jnp.round(a_h / a_s), -127, 127).astype(jnp.int8)
        out = out + jax.lax.dot_general(
            a_i8, w_ref[h * D:(h + 1) * D, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * a_s

    acc_ref[...] = acc_ref[...] + out[None] * 1e-6

    @pl.when(i == ITERS - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def build(mode, xshape):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ITERS,),
        in_specs=[
            pl.BlockSpec(xshape, lambda i: (0,) * len(xshape)),
            pl.BlockSpec((H, CTX, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((DM, DM), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, DM), lambda i: (0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((1, K, DM), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, K, DM), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.standard_normal((H, CTX, D)), jnp.bfloat16)
    w = jnp.asarray(rng.integers(-127, 127, (DM, DM)), jnp.int8)
    shapes = {
        "presplit": (H, K, D),
        "slicestack": (K, DM),
        "pad128": (K, H * 128),
    }
    for mode, xshape in shapes.items():
        x = jnp.asarray(rng.standard_normal(xshape), jnp.bfloat16)
        try:
            call = jax.jit(build(mode, xshape))
            call(x, kc, w).block_until_ready()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            call(x, kc, w).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"{mode}: {best / ITERS * 1e6:7.2f} us/iter")


if __name__ == "__main__":
    main()
