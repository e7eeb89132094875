"""Parity tests for the fused beam append+attend kernel.

The Pallas kernel (interpret mode on CPU) must match the pure-XLA
reference that the CPU/mesh paths run — same writes into the cache, same
ancestry-masked attention output.  On TPU the same comparison runs
compiled (tests/test_tpu_kernels.py is the on-chip variant; this file
covers the math everywhere the suite runs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_whisper_tpu.ops.beam_attention import (
    beam_attend_append,
    beam_attend_append_xla,
)
from faster_whisper_tpu.ops.quant import QuantKV, quantize_kv


def _setup(quant, B=2, H=4, K=3, CTX=16, D=8, L=3, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, K, D)), dtype)
    k_new = jnp.asarray(rng.standard_normal((B, H, K, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B, H, K, D)), dtype)
    k_cache = jnp.asarray(rng.standard_normal((L, B, H, K, CTX, D)), dtype)
    v_cache = jnp.asarray(rng.standard_normal((L, B, H, K, CTX, D)), dtype)
    if quant:
        self_k = QuantKV(*quantize_kv(k_cache))  # s: (L, B, H, K, CTX)
        self_v = QuantKV(*quantize_kv(v_cache))
    else:
        self_k, self_v = k_cache, v_cache
    # a scrambled but valid ancestry: position c of beam k lives in some slot
    anc = jnp.asarray(rng.integers(0, K, (B, K, CTX)), jnp.int32)
    # own current position always lives in the beam's own slot
    pos = 7
    anc = anc.at[:, :, pos].set(jnp.arange(K, dtype=jnp.int32)[None, :])
    pos_row = jnp.full((B,), pos, jnp.int32)
    return q, k_new, v_new, self_k, self_v, anc, pos_row


@pytest.mark.parametrize("quant", [True, False])
def test_kernel_matches_xla_reference(quant):
    q, k_new, v_new, self_k, self_v, anc, pos_row = _setup(quant)
    layer = jnp.int32(1)

    attn_ref, sk_ref, sv_ref = beam_attend_append_xla(
        layer, pos_row, q, k_new, v_new, self_k, self_v, anc
    )
    attn_ker, sk_ker, sv_ker = beam_attend_append(
        layer, pos_row, q, k_new, v_new, self_k, self_v, anc, interpret=True
    )

    np.testing.assert_allclose(
        np.asarray(attn_ker), np.asarray(attn_ref), rtol=2e-2, atol=2e-3
    )
    if quant:
        np.testing.assert_array_equal(np.asarray(sk_ker.q), np.asarray(sk_ref.q))
        np.testing.assert_allclose(
            np.asarray(sk_ker.s), np.asarray(sk_ref.s), rtol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(sv_ker.q), np.asarray(sv_ref.q))
        np.testing.assert_allclose(
            np.asarray(sv_ker.s), np.asarray(sv_ref.s), rtol=1e-6
        )
    else:
        np.testing.assert_allclose(
            np.asarray(sk_ker), np.asarray(sk_ref), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sv_ker), np.asarray(sv_ref), rtol=1e-6
        )


@pytest.mark.parametrize("quant", [True, False])
def test_kernel_writes_only_the_target_column(quant):
    q, k_new, v_new, self_k, self_v, anc, pos_row = _setup(quant, seed=3)
    layer = jnp.int32(2)
    before_k = np.asarray(self_k.q if quant else self_k).copy()

    _, sk, _ = beam_attend_append(
        layer, pos_row, q, k_new, v_new, self_k, self_v, anc, interpret=True
    )
    after_k = np.asarray(sk.q if quant else sk)

    pos = int(pos_row[0])
    untouched = np.ones_like(before_k, bool)
    untouched[2, :, :, :, pos] = False
    np.testing.assert_array_equal(after_k[untouched], before_k[untouched])
    assert not np.array_equal(
        after_k[2, :, :, :, pos], before_k[2, :, :, :, pos]
    )


def test_xla_reference_respects_per_beam_positions():
    """The sampling path freezes finished beams at their own positions."""
    q, k_new, v_new, self_k, self_v, anc, pos_row = _setup(False, seed=5)
    B, K = q.shape[0], q.shape[2]
    pos_bk = jnp.broadcast_to(pos_row[:, None], (B, K)).at[:, 0].set(3)

    _, sk, _ = beam_attend_append_xla(
        jnp.int32(0), pos_row, q, k_new, v_new, self_k, self_v, anc,
        pos_bk=pos_bk,
    )
    after = np.asarray(sk)
    # beam 0 wrote at column 3, the others at pos_row
    expect0 = np.asarray(k_new)[:, :, 0]
    np.testing.assert_allclose(after[0, :, :, 0, 3], expect0, rtol=1e-6)


@pytest.mark.parametrize(
    "quant,t_block",
    # t_block=24 does not divide T=32: exercises the padded tail block
    [(True, None), (True, 8), (True, 24), (False, None)],
)
def test_cross_attend_matches_einsum(quant, t_block):
    from faster_whisper_tpu.ops.beam_attention import cross_attend

    rng = np.random.default_rng(7)
    L, B, H, K, T, D = 3, 2, 4, 3, 32, 8
    dt = jnp.float32
    q = jnp.asarray(rng.standard_normal((B, H, K, D)), dt)
    ck = jnp.asarray(rng.standard_normal((L, B, H, T, D)), dt)
    cv = jnp.asarray(rng.standard_normal((L, B, H, T, D)), dt)
    layer = jnp.int32(1)
    d_scale = D ** -0.5

    if quant:
        ckq0 = quantize_kv(ck)
        cvq0 = quantize_kv(cv)
        ck_l = ckq0.q[1].astype(dt) * ckq0.s[1][..., None]
        cv_l = cvq0.q[1].astype(dt) * cvq0.s[1][..., None]
        # canonical cross-scale shape: (L, B, H, 1, T)
        ckq = QuantKV(ckq0.q, ckq0.s[:, :, :, None])
        cvq = QuantKV(cvq0.q, cvq0.s[:, :, :, None])
        out = cross_attend(layer, q, ckq, cvq, interpret=True, t_block=t_block)
    else:
        ck_l, cv_l = ck[1], cv[1]
        out = cross_attend(layer, q, ck, cv, interpret=True)

    scores = np.einsum("bhkd,bhtd->bhkt", np.asarray(q) * d_scale, ck_l)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bhkt,bhtd->bhkd", p, cv_l)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-3)


def test_s8_mxu_path_matches_f32_reference():
    """bf16 callers take the native s8 x s8 -> s32 MXU contractions
    (per-row quantized q and softmax weights).  Parity vs the f32 XLA
    reference on the SAME int8 caches bounds the added noise: the only
    extra error source is the 8-bit q/p rounding (~0.5% relative)."""
    q, k_new, v_new, self_k, self_v, anc, pos_row = _setup(
        True, CTX=32, D=64, seed=11
    )
    layer = jnp.int32(1)

    attn_ref, sk_ref, sv_ref = beam_attend_append_xla(
        layer, pos_row,
        q.astype(jnp.float32), k_new.astype(jnp.float32),
        v_new.astype(jnp.float32), self_k, self_v, anc,
    )
    attn_ker, sk_ker, sv_ker = beam_attend_append(
        layer, pos_row,
        q.astype(jnp.bfloat16), k_new.astype(jnp.bfloat16),
        v_new.astype(jnp.bfloat16), self_k, self_v, anc, interpret=True,
    )

    a_ref = np.asarray(attn_ref, np.float32)
    a_ker = np.asarray(attn_ker, np.float32)
    # ~1% of the attention output's scale (int8 V cache, 8-bit q/p)
    tol = 2e-2 * np.abs(a_ref).max()
    np.testing.assert_allclose(a_ker, a_ref, atol=tol)
    # cache writes are quantize-exact regardless of the dot path (the
    # bf16 k/v columns quantize the bf16-rounded values)
    assert np.abs(
        np.asarray(sk_ker.q, np.int32) - np.asarray(sk_ref.q, np.int32)
    ).max() <= 1


@pytest.mark.parametrize("t_block", [None, 8])
def test_cross_attend_s8_path_matches_f32_reference(t_block):
    from faster_whisper_tpu.ops.beam_attention import cross_attend

    rng = np.random.default_rng(13)
    L, B, H, K, T, D = 3, 2, 4, 3, 32, 64
    q = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((L, B, H, T, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((L, B, H, T, D)), jnp.float32)
    ckq0, cvq0 = quantize_kv(ck), quantize_kv(cv)
    ckq = QuantKV(ckq0.q, ckq0.s[:, :, :, None])
    cvq = QuantKV(cvq0.q, cvq0.s[:, :, :, None])
    layer = jnp.int32(1)
    d_scale = D ** -0.5

    ck_l = np.asarray(ckq0.q[1], np.float32) * np.asarray(ckq0.s[1])[..., None]
    cv_l = np.asarray(cvq0.q[1], np.float32) * np.asarray(cvq0.s[1])[..., None]
    scores = np.einsum(
        "bhkd,bhtd->bhkt", np.asarray(q, np.float64) * d_scale, ck_l
    )
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bhkt,bhtd->bhkd", p, cv_l)

    out = cross_attend(
        layer, q.astype(jnp.bfloat16), ckq, cvq, interpret=True,
        t_block=t_block,
    )
    o = np.asarray(out, np.float32)
    tol = 2e-2 * np.abs(ref).max()
    np.testing.assert_allclose(o, ref, atol=tol)


def test_head_block_budget_accounts_for_cache_dtype():
    """Mosaic's scoped-VMEM stack is 16 MB; budgeting the bf16 cache at
    int8 element size picked hb=20 for large-v3 (H=20, K=5, ctx=192) — a
    19.5 MB block the chip refuses to compile at ANY batch size (the
    block is per-(b, head-tile)).  itemsize must halve the tile."""
    from faster_whisper_tpu.ops.beam_attention import _head_block

    budget = 10 * 1024 * 1024
    # large-v3 decode shapes: int8 keeps the full head tile...
    assert _head_block(20, 5, 192, itemsize=1) == 20
    # ...bf16 must shrink it below the budget
    hb = _head_block(20, 5, 192, itemsize=2)
    assert hb < 20 and 20 % hb == 0
    assert 4 * hb * 5 * 192 * 128 * 2 <= budget
    # cross-attention shapes (K=1, T=1500) for both dtypes
    for itemsize in (1, 2):
        hb = _head_block(20, 1, 1500, itemsize=itemsize)
        assert 4 * hb * 1 * 1500 * 128 * itemsize <= budget
