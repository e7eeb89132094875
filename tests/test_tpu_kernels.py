"""On-chip parity for the fused beam append+attend kernel.

Skipped off-TPU (tests/test_beam_attention.py covers interpret mode);
on the real chip this compares the compiled Mosaic kernel against the
pure-XLA reference at f32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() not in ("tpu", "axon"):
    pytest.skip("TPU-only kernel tests", allow_module_level=True)

from faster_whisper_tpu.ops.beam_attention import (
    beam_attend_append,
    beam_attend_append_xla,
)
from faster_whisper_tpu.ops.quant import QuantKV, quantize_kv


@pytest.mark.parametrize("quant", [True, False])
def test_compiled_kernel_matches_xla_on_chip(quant):
    B, H, K, CTX, D, L = 2, 4, 3, 64, 64, 3
    rng = np.random.default_rng(0)
    dt = jnp.float32
    q = jnp.asarray(rng.standard_normal((B, H, K, D)), dt)
    k_new = jnp.asarray(rng.standard_normal((B, H, K, D)), dt)
    v_new = jnp.asarray(rng.standard_normal((B, H, K, D)), dt)
    kc = jnp.asarray(rng.standard_normal((L, B, H, K, CTX, D)), dt)
    vc = jnp.asarray(rng.standard_normal((L, B, H, K, CTX, D)), dt)
    if quant:
        self_k = QuantKV(*quantize_kv(kc))
        self_v = QuantKV(*quantize_kv(vc))
    else:
        self_k, self_v = kc, vc
    anc = jnp.asarray(rng.integers(0, K, (B, K, CTX)), jnp.int32)
    pos = 9
    anc = anc.at[:, :, pos].set(jnp.arange(K, dtype=jnp.int32)[None, :])
    pos_row = jnp.full((B,), pos, jnp.int32)
    layer = jnp.int32(1)

    a_ref, sk_ref, sv_ref = jax.jit(beam_attend_append_xla)(
        layer, pos_row, q, k_new, v_new, self_k, self_v, anc
    )
    a_ker, sk_ker, sv_ker = jax.jit(beam_attend_append)(
        layer, pos_row, q, k_new, v_new, self_k, self_v, anc
    )

    np.testing.assert_allclose(
        np.asarray(a_ker), np.asarray(a_ref), rtol=3e-2, atol=3e-3
    )
    kq_ref = np.asarray(sk_ref.q if quant else sk_ref)
    kq_ker = np.asarray(sk_ker.q if quant else sk_ker)
    np.testing.assert_allclose(kq_ker, kq_ref, rtol=1e-5, atol=1e-5)
    vq_ref = np.asarray(sv_ref.q if quant else sv_ref)
    vq_ker = np.asarray(sv_ker.q if quant else sv_ker)
    np.testing.assert_allclose(vq_ker, vq_ref, rtol=1e-5, atol=1e-5)
    if quant:
        np.testing.assert_allclose(
            np.asarray(sk_ker.s), np.asarray(sk_ref.s), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sv_ker.s), np.asarray(sv_ref.s), rtol=1e-5
        )


def test_flash_encoder_attention_matches_xla():
    """The tuned flash path (production for S >= 1024) must match the
    plain XLA attention to accumulation tolerance, including the padded
    tail (1500 -> 1536) staying out of the softmax."""
    import os

    from faster_whisper_tpu.ops.attention import _mha_flash_full, mha

    rng = np.random.default_rng(0)
    B, S, H, D = 2, 1500, 4, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)

    ref = np.asarray(jax.jit(mha)(q, k, v), np.float32)
    got = np.asarray(jax.jit(_mha_flash_full)(q, k, v), np.float32)
    tol = 2e-2 * np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=tol)
