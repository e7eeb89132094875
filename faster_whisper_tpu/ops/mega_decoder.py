"""Whole-decoder decode-step megakernel: all layers in ONE pallas_call.

TPU-native replacement for the decode loop's per-layer kernel cascade
(the reference runs its whole decode inside CTranslate2's fused C++ loop,
reference: faster_whisper/transcribe.py:1446-1459; our per-layer
formulation is ops/beam_attention.py + XLA glue).

Why one kernel: the profiled per-layer step costs 6.56 ms against a
~2.9 ms HBM floor, and the gap is per-``pallas_call`` launch overhead
(~50 us x 32 self-attend calls, flat in block sizes — see
benchmarks/README.md profile rows) plus XLA cross-attention running
above its read floor.  A single call per step with grid ``(L, B)``
removes every launch boundary and keeps the HBM pipe saturated:
the feasibility skeleton (benchmarks/profile_mega_skeleton.py) moves
the step's full 2.35 GB at 856 GB/s effective — 2.74 ms/step.

Design (per grid step ``(l, b)``, b fastest):

  * the per-(layer, row) int8 self/cross KV-cache blocks arrive by
    ordinary BlockSpec pipelining, exactly like the per-layer kernels;
    the self-cache append writes back through aliased outputs (an
    8-slot ctx window + whole scale rows — ops/beam_attention.py's
    scheme, unchanged);
  * the ~23 MB of per-layer int8 weights stream by MANUAL double-
    buffered DMA from ANY-space inputs: matrix ``m`` of layer ``l+1``
    is issued at grid step ``(l, b == m % B)``, so the fetch spreads
    across the whole previous layer and hides under its cache DMA;
    one wait per layer at ``b == 0``;
  * the residual activation ``x`` for every row is carried in a VMEM
    scratch across the whole grid — it never touches HBM between
    layers;
  * all eight per-layer matmuls run on the s8 MXU with dynamic per-row
    activation quantization (the exact ``ops.quant.int8_dense`` math);
  * head split/merge: ``reshape(K, H, D)`` does not lower in Mosaic,
    so projections are split into heads by 64-wide static lane slices
    stacked to ``(H, K, D)`` (~0.02 us — benchmarks/profile_mega_heads
    .py) and attention outputs are merged by ACCUMULATING per-head
    row-sliced dots against the flat output weight — no merge relayout
    and bitwise-identical to quantizing the merged row;
  * gelu is exact-erf via the Abramowitz-Stegun 7.1.26 rational
    approximation (max abs error 1.5e-7, far below bf16 resolution) —
    Mosaic has no erf lowering.

Attention math and cache layouts are ops/beam_attention.py's, head-tile
= all heads: ancestry-virtualized beam re-parenting with the new
token's score/weight patched in as an explicit "own" term, per-(head,
row) s8 quantization of q and the softmax weights so the int8 cache
blocks are never upcast, joint softmax across the K beam slots.

Embedding lookups, the final layernorm, and the logits head stay in
XLA (generation/generate.py) — they are single well-fused ops with no
launch-count problem.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from faster_whisper_tpu.ops.quant import QuantKV, QuantizedLinear

_WIN = 8  # ctx write-window (Mosaic sublane alignment) — ops/beam_attention.py
_NEG_INF = -1e30
_LN_EPS = 1e-5

# packed per-layer vector table: row names -> row index (see pack_mega)
_ROWS = (
    "ln1_g", "ln1_b", "ln2_g", "ln2_b", "ln3_g", "ln3_b",
    "s_wq", "b_q", "s_wk", "s_wv", "b_v", "s_wo", "b_o",
    "s_cwq", "b_cq", "s_cwo", "b_co",
    "s_w1", "b_1", "s_w2", "b_2",
)
_R = {n: i for i, n in enumerate(_ROWS)}
_NV = len(_ROWS)

# weight matrices streamed by manual DMA, in kernel-argument order
_WNAMES = ("wq", "wk", "wv", "wo", "cwq", "cwo", "w1", "w2")


def _ablated(section: str) -> bool:
    """TEMPORARY compile-time bisect hook: FWT_MEGA_ABLATE lists kernel
    sections to stub out (comma-separated).  Diagnostic only."""
    import os

    return section in os.environ.get("FWT_MEGA_ABLATE", "").split(",")


class MegaWeights(NamedTuple):
    """Decoder weights repacked for the megakernel.

    ``wq..w2``: the stacked (L, in, out) int8 matrices (shared with the
    quantized param tree — no copies).  ``vecs``: (L, NV, FF) f32 — all
    per-layer vectors (layernorm gains/biases, matmul biases, int8
    weight scales) packed row-wise and lane-padded to FF, fetched as
    one small block per layer.
    """

    wq: jax.Array
    wk: jax.Array
    wv: jax.Array
    wo: jax.Array
    cwq: jax.Array
    cwo: jax.Array
    w1: jax.Array
    w2: jax.Array
    vecs: jax.Array


def mega_supported(params) -> bool:
    """The megakernel serves int8 weight trees (QuantizedLinear leaves)."""
    sa = params["decoder"]["layers"]["self_attn"]
    return isinstance(sa["wq"], QuantizedLinear)


def pack_mega(params) -> MegaWeights:
    """Build MegaWeights from a quantized param tree.

    Pure jnp (traceable); callers hoist it outside the decode loop so
    XLA materializes the packed table once per generate call.
    """
    lay = params["decoder"]["layers"]
    sa, ca, mlp = lay["self_attn"], lay["cross_attn"], lay["mlp"]
    ff = mlp["w1"].q.shape[-1]

    def row(a):  # (L, n) -> (L, FF) f32, zero-padded on lanes
        a = a.astype(jnp.float32)
        pad = ff - a.shape[-1]
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a

    vecs = jnp.stack(
        [
            row(lay["ln1_g"]), row(lay["ln1_b"]),
            row(lay["ln2_g"]), row(lay["ln2_b"]),
            row(lay["ln3_g"]), row(lay["ln3_b"]),
            row(sa["wq"].s), row(sa["bq"]),
            row(sa["wk"].s), row(sa["wv"].s), row(sa["bv"]),
            row(sa["wo"].s), row(sa["bo"]),
            row(ca["wq"].s), row(ca["bq"]),
            row(ca["wo"].s), row(ca["bo"]),
            row(mlp["w1"].s), row(mlp["b1"]),
            row(mlp["w2"].s), row(mlp["b2"]),
        ],
        axis=1,
    )  # (L, NV, FF)
    return MegaWeights(
        wq=sa["wq"].q, wk=sa["wk"].q, wv=sa["wv"].q, wo=sa["wo"].q,
        cwq=ca["wq"].q, cwo=ca["wo"].q, w1=mlp["w1"].q, w2=mlp["w2"].q,
        vecs=vecs,
    )


def _erf(z):
    """Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7); f32 in/out."""
    p = 0.3275911
    a1, a2 = 0.254829592, -0.284496736
    a3, a4, a5 = 1.421413741, -1.453152027, 1.061405429
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + p * az)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-az * az))


def mega_decode_layers_xla(
    x0: jax.Array,  # (B, K, DM)
    pos_row: jax.Array,  # (B,) int32
    anc: jax.Array,  # (B, K, ctx) int32
    self_k: QuantKV,
    self_v: QuantKV,
    cross_k: QuantKV,
    cross_v: QuantKV,
    mega: MegaWeights,
    *,
    n_head: int,
):
    """Pure-XLA mirror of the megakernel's EXACT math (s8 activation
    quantization of q and the softmax weights included), used as the
    bit-tight parity oracle on CPU — the beam_attend_append_xla pattern.
    Not a production path."""
    b, k, dm = x0.shape
    L = self_k.q.shape[0]
    ctx = self_k.q.shape[4]
    H = n_head
    D = dm // H
    d_scale = D ** -0.5
    dtype = x0.dtype
    ff = mega.w1.shape[2]

    def vrow(li, name, width):
        return mega.vecs[li, _R[name]: _R[name] + 1, :width]  # (1, w)

    def ln(li, x, g, bb):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) * (xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
        return (y * vrow(li, g, dm)[None] + vrow(li, bb, dm)[None]).astype(
            dtype
        )

    def quant_rows(hf):
        sx = jnp.maximum(
            jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0, 1e-10
        )
        hq = jnp.clip(jnp.round(hf / sx), -127, 127).astype(jnp.int8)
        return hq, sx

    def dense(li, h, w, sname, bname, out_w):
        hq, sx = quant_rows(h.astype(jnp.float32))
        acc = jax.lax.dot_general(
            hq, w[li],
            dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * sx * vrow(li, sname, out_w)[None]
        if bname is not None:
            y = y + vrow(li, bname, out_w)[None]
        return y  # (B, K, out_w) f32

    def split(y):  # (B, K, DM) -> (B, H, K, D)
        return y.reshape(b, k, H, D).transpose(0, 2, 1, 3)

    kq, ks, vq, vs = self_k.q, self_k.s, self_v.q, self_v.s
    b_idx = jnp.arange(b)[:, None]
    k_slot = jnp.arange(k)[None, :]
    c_pos = jnp.arange(ctx)
    x = x0

    for li in range(L):
        pos = pos_row  # (B,)
        h1 = ln(li, x, "ln1_g", "ln1_b")
        qf = split(dense(li, h1, mega.wq, "s_wq", "b_q", dm)) * d_scale
        kn = split(dense(li, h1, mega.wk, "s_wk", None, dm))
        vn = split(dense(li, h1, mega.wv, "s_wv", "b_v", dm))

        ks_new = jnp.maximum(jnp.max(jnp.abs(kn), axis=-1) / 127.0, 1e-10)
        vs_new = jnp.maximum(jnp.max(jnp.abs(vn), axis=-1) / 127.0, 1e-10)
        knq = jnp.clip(jnp.round(kn / ks_new[..., None]), -127, 127)
        vnq = jnp.clip(jnp.round(vn / vs_new[..., None]), -127, 127)
        knd = knq * ks_new[..., None]
        vnd = vnq * vs_new[..., None]

        # cache append at column pos (kn: (B, H, K, D) -> cache
        # (L, B, H, K, ctx, D); scales (..., K) -> (L, B, H, K, ctx))
        colv = (c_pos[None, None, None, :, None] == pos[:, None, None, None, None])
        cols = (c_pos[None, None, None, :] == pos[:, None, None, None])
        kq = kq.at[li].set(
            jnp.where(colv, knq[..., None, :].astype(jnp.int8), kq[li])
        )
        vq = vq.at[li].set(
            jnp.where(colv, vnq[..., None, :].astype(jnp.int8), vq[li])
        )
        ks = ks.at[li].set(
            jnp.where(cols, ks_new[..., None].astype(ks.dtype), ks[li])
        )
        vs = vs.at[li].set(
            jnp.where(cols, vs_new[..., None].astype(vs.dtype), vs[li])
        )

        # merged-slot attention, mirroring the kernel op-for-op: single
        # QK/PV dots over the joint (K*ctx) axis, one softmax, own-column
        # patch, ancestry+causal mask (post-append cache reads are
        # equivalent — the own patch and the mask cover every column the
        # append touched)
        f = k * ctx
        own = jnp.sum(qf * knd, axis=-1, keepdims=True)  # (B, H, K, 1)
        f_pos = jnp.arange(f)
        own_m = (
            f_pos[None, None, :]
            == k_slot[..., None] * ctx + pos[:, None, None]
        )[:, None]  # (B, 1, K, F)
        sel = anc[:, :, None, :] == jnp.arange(k)[None, None, :, None]
        allow = c_pos[None, None, None, :] <= pos[:, None, None, None]
        mask_m = (sel & allow).reshape(b, k, f)[:, None]  # (B, 1, K, F)

        q_i8, q_s = quant_rows(qf)
        kc = kq[li].reshape(b, H, f, D)
        vc = vq[li].reshape(b, H, f, D)
        ks_fl = ks[li].reshape(b, H, f).astype(jnp.float32)
        vs_fl = vs[li].reshape(b, H, f).astype(jnp.float32)
        scores = jax.lax.dot_general(
            q_i8, kc,
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * q_s  # (B, H, K, F)
        scores = scores * ks_fl[:, :, None, :]
        scores = jnp.where(own_m, own, scores)
        scores = jnp.where(mask_m, scores, _NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        p_own = jnp.sum(jnp.where(own_m, p, 0.0), axis=-1, keepdims=True)
        p = jnp.where(own_m, 0.0, p)
        p = p * vs_fl[:, :, None, :]
        p_s = jnp.maximum(
            jnp.max(p, axis=-1, keepdims=True) / 127.0, 1e-10
        )
        p_i8 = jnp.round(p / p_s).astype(jnp.int8)
        attn = jax.lax.dot_general(
            p_i8, vc,
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * p_s
        attn = attn + p_own * vnd

        merged = attn.transpose(0, 2, 1, 3).reshape(b, k, dm)
        x = x + dense(li, merged, mega.wo, "s_wo", "b_o", dm).astype(dtype)

        h2 = ln(li, x, "ln2_g", "ln2_b")
        qx = split(dense(li, h2, mega.cwq, "s_cwq", "b_cq", dm)) * d_scale
        qx_i8, qx_s = quant_rows(qx)
        cs = jax.lax.dot_general(
            qx_i8, cross_k.q[li],
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * qx_s  # (B, H, K, T)
        cs = cs * cross_k.s[li].astype(jnp.float32)  # (B, H, 1, T)
        cm = jnp.max(cs, axis=-1, keepdims=True)
        ce = jnp.exp(cs - cm)
        cp = ce / jnp.sum(ce, axis=-1, keepdims=True)
        cp = cp * cross_v.s[li].astype(jnp.float32)
        cp_s = jnp.maximum(
            jnp.max(cp, axis=-1, keepdims=True) / 127.0, 1e-10
        )
        cp_i8 = jnp.round(cp / cp_s).astype(jnp.int8)
        cattn = jax.lax.dot_general(
            cp_i8, cross_v.q[li],
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * cp_s
        merged = cattn.transpose(0, 2, 1, 3).reshape(b, k, dm)
        x = x + dense(li, merged, mega.cwo, "s_cwo", "b_co", dm).astype(dtype)

        h3 = ln(li, x, "ln3_g", "ln3_b")
        hm = dense(li, h3, mega.w1, "s_w1", "b_1", ff)
        hm = 0.5 * hm * (1.0 + _erf(hm * (2.0 ** -0.5)))
        x = x + dense(li, hm.astype(dtype), mega.w2, "s_w2", "b_2", dm).astype(
            dtype
        )

    return x, QuantKV(kq, ks), QuantKV(vq, vs)


def _kernel(
    # scalar prefetch
    pos_ref,  # (B,) int32 — per-row write position
    # blocked inputs
    x0_ref,  # (1, K, DM) dtype — embedded step tokens
    mask_ref,  # (1, K, K*CTX) int8 — ancestry+causal mask (XLA-built)
    vecs_ref,  # (1, NV, FF) f32 — packed per-layer vectors
    kq_ref,  # (1, 1, H, K, CTX, D) int8 — self-K cache block
    ks_ref,  # (1, 1, H, K*CTX) bf16/f32 scales, slot-major flat
    vq_ref,
    vs_ref,
    ckq_ref,  # (1, 1, H, T, D) int8 — cross-K cache block
    cks_ref,  # (1, 1, H, 1, T) bf16/f32
    cvq_ref,
    cvs_ref,
    # ANY-space weight stacks, (L, in, out) int8, _WNAMES order
    *refs,
    n_head: int,
    d_head: int,
):
    w_hbm = refs[: len(_WNAMES)]
    (x_out_ref, kqo_ref, kso_ref, vqo_ref, vso_ref) = refs[
        len(_WNAMES): len(_WNAMES) + 5
    ]
    xs = refs[len(_WNAMES) + 5]  # (B, K, DM) dtype scratch
    wbufs = refs[len(_WNAMES) + 6: len(_WNAMES) + 6 + len(_WNAMES)]
    sems = refs[-1]  # DMA sems (2, n_w)

    l, b = pl.program_id(0), pl.program_id(1)
    n_l, n_b = pl.num_programs(0), pl.num_programs(1)
    par = jax.lax.rem(l, 2)
    nxt = jax.lax.rem(l + 1, 2)
    n_w = len(_WNAMES)

    H, D = n_head, d_head
    k = x0_ref.shape[1]
    dm = x0_ref.shape[2]
    ctx = kq_ref.shape[4]
    dtype = x0_ref.dtype
    d_scale = D ** -0.5

    # ---- weight DMA: issue matrix m of layer l+1 at b-step m % B ----
    l_next = jnp.minimum(l + 1, n_l - 1)
    for m in range(n_w):
        @pl.when((b == m % n_b) & (l + 1 < n_l))
        def _(m=m):
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

    pos = pos_ref[b]
    win = (pos // _WIN) * _WIN

    vec = vecs_ref[0]  # (NV, FF)

    def vrow(name, width):
        return vec[_R[name]: _R[name] + 1, :width]  # (1, width) f32

    def ln(x, g, bb):
        """f32-statistics layernorm, output in x's dtype (models.model)."""
        if _ablated("ln"):
            return x
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) * (xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
        return (y * vrow(g, dm) + vrow(bb, dm)).astype(dtype)

    def quant_rows(hf):
        """Per-row symmetric int8 (ops.quant.int8_dense's activation path)."""
        sx = jnp.maximum(
            jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0, 1e-10
        )
        hq = jnp.clip(jnp.round(hf / sx), -127, 127).astype(jnp.int8)
        return hq, sx

    def dense(h, wi, sname, bname, out_w):
        """y = h @ dequant(W_l) (+ b): s8 MXU dot vs the current weight
        buffer, rescaled by the packed per-channel scales."""
        hq, sx = quant_rows(h.astype(jnp.float32))
        acc = jax.lax.dot_general(
            hq, wbufs[wi][par],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if _ablated("vrow"):
            return acc.astype(jnp.float32) * sx * 2e-4
        y = acc.astype(jnp.float32) * sx * vrow(sname, out_w)
        if bname is not None:
            y = y + vrow(bname, out_w)
        return y  # (K, out_w) f32

    def split_heads(y):  # (K, DM) f32 -> (H, K, D) via static lane slices
        if _ablated("split"):
            return jnp.broadcast_to(y[None, :, :D], (H, k, D)) * 1.0
        return jnp.stack(
            [y[:, h * D: (h + 1) * D] for h in range(H)], axis=0
        )

    def merge_dense(attn, wi, sname, bname):
        """(H, K, D) f32 -> (K, DM): accumulate per-head row-sliced s8
        dots; a shared per-row scale makes this bitwise the int8_dense
        of the merged row."""
        m1 = jnp.max(jnp.abs(attn), axis=2, keepdims=True)  # (H, K, 1)
        a_s = jnp.maximum(
            jnp.max(m1, axis=0, keepdims=True) / 127.0, 1e-10
        )  # (1, K, 1)
        acc = jnp.zeros((k, dm), jnp.int32)
        for h in range(H):
            a_i8 = jnp.clip(
                jnp.round(attn[h] / a_s[0]), -127, 127
            ).astype(jnp.int8)
            acc = acc + jax.lax.dot_general(
                a_i8, wbufs[wi][par, h * D: (h + 1) * D, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        return acc.astype(jnp.float32) * a_s[0] * vrow(sname, dm) + vrow(
            bname, dm
        )

    # ---- residual stream: VMEM-resident across the whole grid ----
    if _ablated("xs"):
        x = x0_ref[0]
    else:
        x = jnp.where(l == 0, x0_ref[0], xs[b])  # (K, DM) dtype

    # ================= self attention (append + attend) =================
    h1 = ln(x, "ln1_g", "ln1_b")
    qf = split_heads(dense(h1, 0, "s_wq", "b_q", dm)) * d_scale  # (H, K, D)
    kn = split_heads(dense(h1, 1, "s_wk", None, dm))
    vn = split_heads(dense(h1, 2, "s_wv", "b_v", dm))

    # quantize this step's K/V; dequantized copies feed the "own" term
    ks_new = jnp.maximum(jnp.max(jnp.abs(kn), axis=-1) / 127.0, 1e-10)
    vs_new = jnp.maximum(jnp.max(jnp.abs(vn), axis=-1) / 127.0, 1e-10)
    knq = jnp.clip(jnp.round(kn / ks_new[..., None]), -127, 127)
    vnq = jnp.clip(jnp.round(vn / vs_new[..., None]), -127, 127)
    knd = knq * ks_new[..., None]
    vnd = vnq * vs_new[..., None]

    # cache append (aliased outputs): 8-slot value window + whole flat
    # scale rows (column j*ctx + pos of slot j gets its new scale)
    f = k * ctx  # merged slot-position axis, f = j*ctx + c
    if _ablated("append"):
        kqo_ref[0, 0] = knq.astype(jnp.int8)[:, :, None, :] * jnp.ones(
            (1, 1, _WIN, 1), jnp.int8
        )
        vqo_ref[0, 0] = vnq.astype(jnp.int8)[:, :, None, :] * jnp.ones(
            (1, 1, _WIN, 1), jnp.int8
        )
    else:
        wc = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, _WIN, 1), 2
        ) == (pos - win)
        kqo_ref[0, 0] = jnp.where(
            wc, knq[:, :, None, :],
            kq_ref[0, 0, :, :, pl.ds(win, _WIN), :].astype(jnp.float32),
        ).astype(jnp.int8)
        vqo_ref[0, 0] = jnp.where(
            wc, vnq[:, :, None, :],
            vq_ref[0, 0, :, :, pl.ds(win, _WIN), :].astype(jnp.float32),
        ).astype(jnp.int8)
    f_ids = jax.lax.broadcasted_iota(jnp.int32, (1, f), 1)
    f_div = f_ids // ctx  # slot of column f
    f_rem = f_ids - f_div * ctx  # ctx position of column f
    ks_old = ks_ref[0, 0].astype(jnp.float32)  # (H, F) pre-append scales
    vs_old = vs_ref[0, 0].astype(jnp.float32)
    ks_wr, vs_wr = ks_old, vs_old
    if not _ablated("scaleappend"):
        for j in range(k):
            hitj = (f_div == j) & (f_rem == pos)  # column j*ctx+pos
            ks_wr = jnp.where(hitj, ks_new[:, j: j + 1], ks_wr)
            vs_wr = jnp.where(hitj, vs_new[:, j: j + 1], vs_wr)
    kso_ref[0, 0] = ks_wr.astype(kso_ref.dtype)
    vso_ref[0, 0] = vs_wr.astype(vso_ref.dtype)

    # Ancestry-masked attention over the K beam slots, MERGED across
    # slots: the (H, K, ctx, D) cache block is viewed as (H, K*ctx, D)
    # (a free retiling — ctx is sublane-aligned), so QK/PV are single
    # batched dots and the softmax runs once over the joint axis.  The
    # per-slot unrolled form measures ~600x slower in-kernel
    # (benchmarks/profile_mega_heads.py merged probe).  The new token
    # enters as a patched "own" column; the ancestry+causal mask arrives
    # precomputed (mask_ref, built per step in XLA from anc/pos).
    own = jnp.sum(qf * knd, axis=-1, keepdims=True)  # (H, K, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, f), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, f), 1)
    own_m = (col_ids == row_ids * ctx + pos)[None]  # (1, K, F)
    allow_m = (mask_ref[0] != 0)[None]  # (1, K, F)

    if _ablated("self"):
        attn = qf + knd * 1e-6 + vnd * 1e-6
    else:
        q_i8, q_s = quant_rows(qf)
        kc = kq_ref[0, 0].reshape(H, f, D)  # free view: merge (K, ctx)
        vc = vq_ref[0, 0].reshape(H, f, D)
        scores = jax.lax.dot_general(
            q_i8, kc,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * q_s  # (H, K, F)
        scores = scores * ks_old[:, None, :]
        scores = jnp.where(own_m, own, scores)
        scores = jnp.where(allow_m, scores, _NEG_INF)

        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (H, K, F)
        p_own = jnp.sum(jnp.where(own_m, p, 0.0), axis=-1, keepdims=True)
        p = jnp.where(own_m, 0.0, p)
        p = p * vs_old[:, None, :]
        p_s = jnp.maximum(
            jnp.max(p, axis=-1, keepdims=True) / 127.0, 1e-10
        )
        p_i8 = jnp.round(p / p_s).astype(jnp.int8)
        attn = jax.lax.dot_general(
            p_i8, vc,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * p_s
        attn = attn + p_own * vnd

    if _ablated("merge"):
        x = x + (
            attn.sum(axis=0).sum(axis=-1, keepdims=True) * 1e-6
        ).astype(dtype)
    else:
        x = x + merge_dense(attn, 3, "s_wo", "b_o").astype(dtype)

    # ======================= cross attention ===========================
    h2 = ln(x, "ln2_g", "ln2_b")
    qx = split_heads(dense(h2, 4, "s_cwq", "b_cq", dm)) * d_scale
    if _ablated("cross"):
        ct1 = jnp.sum(
            ckq_ref[0, 0].astype(jnp.float32), axis=1, keepdims=True
        )  # (H, 1, D) — keeps the cache read
        ct2 = jnp.sum(
            cvq_ref[0, 0].astype(jnp.float32), axis=1, keepdims=True
        )
        cattn = qx + (ct1 + ct2) * 1e-9
    else:
        qx_i8, qx_s = quant_rows(qx)
        cs = jax.lax.dot_general(
            qx_i8, ckq_ref[0, 0],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * qx_s  # (H, K, T)
        cs = cs * cks_ref[0, 0].astype(jnp.float32)  # K-scales (H, 1, T)
        cm = jnp.max(cs, axis=-1, keepdims=True)
        ce = jnp.exp(cs - cm)
        cp = ce / jnp.sum(ce, axis=-1, keepdims=True)
        cp = cp * cvs_ref[0, 0].astype(jnp.float32)  # V-scales folded in
        cp_s = jnp.maximum(
            jnp.max(cp, axis=-1, keepdims=True) / 127.0, 1e-10
        )
        cp_i8 = jnp.round(cp / cp_s).astype(jnp.int8)
        cattn = jax.lax.dot_general(
            cp_i8, cvq_ref[0, 0],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * cp_s  # (H, K, D)

    if _ablated("merge"):
        x = x + (
            cattn.sum(axis=0).sum(axis=-1, keepdims=True) * 1e-6
        ).astype(dtype)
    else:
        x = x + merge_dense(cattn, 5, "s_cwo", "b_co").astype(dtype)

    # ============================= MLP =================================
    h3 = ln(x, "ln3_g", "ln3_b")
    ff = wbufs[6].shape[2]
    hm = dense(h3, 6, "s_w1", "b_1", ff)  # (K, FF) f32
    if not _ablated("gelu"):
        hm = 0.5 * hm * (1.0 + _erf(hm * (2.0 ** -0.5)))  # exact gelu
    x = x + dense(hm.astype(dtype), 7, "s_w2", "b_2", dm).astype(dtype)

    xs[b] = x
    x_out_ref[0] = x  # final flush (l == L-1) is the layer stack's output


def mega_decode_layers(
    x0: jax.Array,  # (B, K, DM) — embedded step tokens
    pos_row: jax.Array,  # (B,) int32
    anc: jax.Array,  # (B, K, ctx) int32
    self_k: QuantKV,  # q (L, B, H, K, ctx, D) int8, s (L, B, H, K, ctx)
    self_v: QuantKV,
    cross_k: QuantKV,  # q (L, B, H, T, D) int8, s (L, B, H, 1, T)
    cross_v: QuantKV,
    mega: MegaWeights,
    *,
    n_head: int,
    interpret: bool = False,
):
    """Run every decoder layer for one decode step in a single
    pallas_call.  Returns (x (B, K, DM) — pre-final-layernorm residual
    stream, new self_k, new self_v); the caches are updated in place
    (aliased) at column ``pos_row[b]``.
    """
    b, k, dm = x0.shape
    L = self_k.q.shape[0]
    ctx = self_k.q.shape[4]
    t = cross_k.q.shape[3]
    d = dm // n_head
    f = k * ctx
    n_w = len(_WNAMES)
    w_stacks = [getattr(mega, n) for n in _WNAMES]
    assert ctx % 8 == 0, "ctx must be sublane-aligned for the merged view"

    # self-cache scales travel slot-major FLAT through the kernel so the
    # merged-axis score/weight multiplies are single (H, F) broadcasts;
    # the reshapes are free bitcasts on the contiguous (..., K, ctx)
    # layout and the external QuantKV layout is unchanged.
    ks_flat = jnp.reshape(self_k.s, self_k.s.shape[:3] + (f,))
    vs_flat = jnp.reshape(self_v.s, self_v.s.shape[:3] + (f,))

    # ancestry + causal mask, built once per step in XLA: column
    # j*ctx + c of query beam k is attendable iff anc[b, k, c] == j and
    # c <= pos_row[b] (the kernel patches the own column's value).
    kk = jnp.arange(k, dtype=anc.dtype)
    sel = anc[:, :, None, :] == kk[None, None, :, None]  # (B, K, J, ctx)
    allow = (
        jnp.arange(ctx)[None, None, None, :]
        <= pos_row[:, None, None, None]
    )
    mask8 = (sel & allow).astype(jnp.int8).reshape(b, k, f)

    def im_x(l, bi, pref):
        return (bi, 0, 0)

    def im_mask(l, bi, pref):
        return (bi, 0, 0)

    def im_vecs(l, bi, pref):
        return (l, 0, 0)

    def im_self(l, bi, pref):
        return (l, bi, 0, 0, 0, 0)

    def im_sscale(l, bi, pref):
        return (l, bi, 0, 0)

    def im_cross(l, bi, pref):
        return (l, bi, 0, 0, 0)

    def im_cscale(l, bi, pref):
        return (l, bi, 0, 0, 0)

    def im_self_out(l, bi, pref):
        return (l, bi, 0, 0, pref[bi] // _WIN, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, b),
        in_specs=[
            pl.BlockSpec((1, k, dm), im_x),
            pl.BlockSpec((1, k, f), im_mask),
            pl.BlockSpec((1, _NV, mega.vecs.shape[2]), im_vecs),
            pl.BlockSpec((1, 1, n_head, k, ctx, d), im_self),
            pl.BlockSpec((1, 1, n_head, f), im_sscale),
            pl.BlockSpec((1, 1, n_head, k, ctx, d), im_self),
            pl.BlockSpec((1, 1, n_head, f), im_sscale),
            pl.BlockSpec((1, 1, n_head, t, d), im_cross),
            pl.BlockSpec((1, 1, n_head, 1, t), im_cscale),
            pl.BlockSpec((1, 1, n_head, t, d), im_cross),
            pl.BlockSpec((1, 1, n_head, 1, t), im_cscale),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_w,
        out_specs=[
            pl.BlockSpec((1, k, dm), im_x),
            pl.BlockSpec((1, 1, n_head, k, _WIN, d), im_self_out),
            pl.BlockSpec((1, 1, n_head, f), im_sscale),
            pl.BlockSpec((1, 1, n_head, k, _WIN, d), im_self_out),
            pl.BlockSpec((1, 1, n_head, f), im_sscale),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k, dm), x0.dtype),
        ] + [
            pltpu.VMEM((2,) + w.shape[1:], jnp.int8) for w in w_stacks
        ] + [
            pltpu.SemaphoreType.DMA((2, n_w)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, k, dm), x0.dtype),
        jax.ShapeDtypeStruct(self_k.q.shape, self_k.q.dtype),
        jax.ShapeDtypeStruct(ks_flat.shape, ks_flat.dtype),
        jax.ShapeDtypeStruct(self_v.q.shape, self_v.q.dtype),
        jax.ShapeDtypeStruct(vs_flat.shape, vs_flat.dtype),
    ]
    x, kq, ks, vq, vs = pl.pallas_call(
        functools.partial(_kernel, n_head=n_head, d_head=d),
        grid_spec=grid_spec,
        out_shape=out_shape,
        # flattened input index (incl. scalar prefetch) -> output index:
        # inputs are [pos, x0, mask, vecs, kq, ks, vq, vs, ...]
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pos_row.astype(jnp.int32), x0, mask8, mega.vecs,
        self_k.q, ks_flat, self_v.q, vs_flat,
        cross_k.q, cross_k.s, cross_v.q, cross_v.s,
        *w_stacks,
    )
    ks = jnp.reshape(ks, self_k.s.shape)
    vs = jnp.reshape(vs, self_v.s.shape)
    return x, QuantKV(kq, ks), QuantKV(vq, vs)
