"""Pallas kernel: beam-search KV-cache reorder.

NOTE: the production beam search (generation/generate.py) no longer
physically reorders the cache at all — it carries a (B, K, ctx) ancestry
table and masks attention across beam slots, which removes this traffic
entirely.  This op remains for engines that need a physical reorder
(e.g. exporting a compacted cache) and as a tested reference kernel.

After each beam-search step every beam's KV cache must be re-parented:
``new_cache[b, k] = cache[b, parent[b, k]]``.  Both obvious XLA spellings
are bandwidth-disasters on TPU for (L, B, K, ctx, H, D) caches:

  * ``take_along_axis``  -> Mosaic lowers the non-minor-axis gather to an
    elementwise loop (+23 ms/step measured on v5e for large-v3 B=8 K=5);
  * one-hot einsum       -> dense K x K contraction reads the cache K times.

This kernel streams each (K, ctx*H*D) tile through VMEM once and writes the
permuted rows back: 1 read + 1 write of the cache, the floor for any
reorder.  The parent table arrives via scalar prefetch (SMEM) so row
indices are known before the DMAs issue.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reorder_kernel(perm_ref, in_ref, out_ref):
    # grid: (G, B) over a (G, B, K, M) view; perm_ref: (B, K) in SMEM
    b = pl.program_id(1)
    k = out_ref.shape[2]
    for i in range(k):
        j = perm_ref[b, i]
        out_ref[0, 0, i, :] = in_ref[0, 0, j, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def reorder_beam_cache(
    cache: jax.Array,  # (G, B, K, ...) — G is any leading grouping (e.g. L)
    parent: jax.Array,  # (B, K) int32 parent beam per new beam
    interpret: bool = False,
) -> jax.Array:
    """Returns cache[b, k] <- cache[b, parent[b, k]] along the K axis."""
    g, b, k = cache.shape[:3]
    tail = int(np.prod(cache.shape[3:]))
    view = cache.reshape(g, b, k, tail)

    out = pl.pallas_call(
        _reorder_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g, b),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, k, tail),
                    lambda i, j, perm: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, k, tail),
                lambda i, j, perm: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(view.shape, view.dtype),
        interpret=interpret,
    )(parent.astype(jnp.int32), view)

    return out.reshape(cache.shape)


def _pallas_available() -> bool:
    # Opt-in (FWT_PALLAS_REORDER=1): on tunneled/remote-compile TPU
    # environments Mosaic kernel compiles can take minutes or fail on
    # missing topology env vars, and the einsum fallback is within ~1.5x
    # at beam widths <= 5.  Direct TPU deployments should enable it.
    import os

    if os.environ.get("FWT_PALLAS_REORDER") != "1":
        return False
    return jax.default_backend() in ("tpu", "axon")


def reorder_cache(
    cache: jax.Array, parent: jax.Array, filled=None, chunk: int = 64
) -> jax.Array:
    """Reorder a (G, B, K, ctx, ...) cache along K by ``parent``.

    When ``filled`` (the number of written context positions) is given, only
    ceil(filled / chunk) position-chunks are touched, under a dynamic-trip
    fori_loop: early decode steps reorder a fraction of the cache instead
    of all of ctx, which matters because reorder traffic is the dominant
    beam-search overhead (~22 ms/step at large-v3 B=8 K=5 for the full
    cache).  Falls back to a full one-hot einsum when ``filled`` is None.
    """
    if _pallas_available():
        return reorder_beam_cache(cache, parent)

    k = cache.shape[2]
    perm = jax.nn.one_hot(parent, k, dtype=cache.dtype)  # (B, Knew, Kold)

    # precision='highest': the contraction is a 0/1 permutation — on TPU the
    # MXU's default bf16 multiply would round the cache values themselves.
    if filled is None:
        return jnp.einsum("bkj,gbj...->gbk...", perm, cache, precision="highest")

    ctx = cache.shape[3]
    n_chunks = -(-ctx // chunk)

    def do_chunk(i, c):
        start = i * chunk
        sl = jax.lax.dynamic_slice_in_dim(c, start, chunk, axis=3)
        new = jnp.einsum("bkj,gbj...->gbk...", perm, sl, precision="highest")
        return jax.lax.dynamic_update_slice_in_dim(c, new, start, axis=3)

    n_active = jnp.minimum(-(-(filled) // chunk), n_chunks)
    return jax.lax.fori_loop(0, n_active, do_chunk, cache)
