"""compute_type="int4": packed-int4 decoder weights + cross K/V.

Beyond-reference (CT2 has no 4-bit type — reference
faster_whisper/transcribe.py:650-651 lists its compute types).  The
contract tested here:

  * quantize_params_int4 puts DECODER matmuls + logits head at 4-bit
    range ([-7, 7]) and leaves the encoder at int8 range;
  * the in-program s8 -> s4 storage conversion is numerically a NO-OP:
    beam search and sampling produce bit-identical outputs with
    ``w_int4`` / ``cross_kv_s4`` on and off (same 4-bit-range params),
    because every value fits int4 and the MXU accumulates exactly in
    int32 either way;
  * the end-to-end pipeline runs under compute_type="int4".
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from faster_whisper_tpu.generation.generate import (  # noqa: E402
    GenOptions,
    beam_search,
    sample,
)
from faster_whisper_tpu.generation.processors import (  # noqa: E402
    ProcessorOptions,
    TokenMeta,
)
from faster_whisper_tpu.models.config import tiny_test_config  # noqa: E402
from faster_whisper_tpu.models.load import random_params  # noqa: E402
from faster_whisper_tpu.ops.quant import (  # noqa: E402
    QuantizedLinear,
    quantize_params_int4,
)


def test_quantize_params_int4_ranges():
    cfg = tiny_test_config()
    params = random_params(cfg, dtype="float32")
    q = quantize_params_int4(params)

    dec = q["decoder"]["layers"]
    for sec in ("self_attn", "cross_attn", "mlp"):
        for name, v in dec[sec].items():
            if isinstance(v, QuantizedLinear):
                assert int(jnp.max(jnp.abs(v.q))) <= 7, (sec, name)
    assert int(jnp.max(jnp.abs(q["decoder"]["logits_w"].q))) <= 7
    # encoder stays at int8 range (encode is compute-bound, not
    # weight-stream-bound; full precision kept there)
    enc_wq = q["encoder"]["layers"]["attn"]["wq"]
    assert int(jnp.max(jnp.abs(enc_wq.q))) > 7


def _setup(seed=0, b=2):
    cfg = tiny_test_config()
    params = quantize_params_int4(random_params(cfg, dtype="float32", seed=seed))
    meta = TokenMeta(
        eot=cfg.n_vocab - 1,
        timestamp_begin=cfg.n_vocab - 10,
        no_timestamps=cfg.n_vocab - 11,
        no_speech=cfg.n_vocab - 12,
        blank=(220,),
        vocab_size=cfg.n_vocab,
    )
    proc = ProcessorOptions(with_timestamps=False)
    rng = np.random.default_rng(seed)
    xa = jnp.asarray(
        rng.standard_normal((b, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.bfloat16,
    ) * 0.1
    prompt = jnp.asarray([[1, 2, 3, 0], [1, 2, 3, 0]][:b], jnp.int32)
    prompt_len = jnp.asarray([3] * b, jnp.int32)
    sot_pos = jnp.asarray([0] * b, jnp.int32)
    return cfg, params, meta, proc, xa, prompt, prompt_len, sot_pos


def _opts(sampling: bool, **kw):
    base = dict(
        beam_size=2,
        num_finished=2,
        sampling=sampling,
        ctx_cap=32,
        kv_int8=True,
        fused_attn=False,
        multi_phase=False,
    )
    base.update(kw)
    return GenOptions(**base)


def test_beam_int4_storage_bit_identical():
    """Same 4-bit-range params: packed-int4 storage (w_int4 + cross_kv_s4)
    must reproduce the int8-stored run bit for bit."""
    cfg, params, meta, proc, xa, prompt, prompt_len, sot_pos = _setup()
    outs = {}
    for s4 in (False, True):
        opts = _opts(
            False, w_int4=s4, cross_kv_qmax=7, cross_kv_s4=s4
        )
        outs[s4] = beam_search(
            params, cfg, opts, proc, meta, xa, prompt, prompt_len,
            sot_pos, jnp.asarray(16, jnp.int32),
        )
    for a, b in zip(jax.tree.leaves(outs[False]), jax.tree.leaves(outs[True])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_int4_storage_bit_identical():
    cfg, params, meta, proc, xa, prompt, prompt_len, sot_pos = _setup(seed=1)
    keys = jnp.stack([jax.random.PRNGKey(7), jax.random.PRNGKey(8)])
    temps = jnp.asarray([0.7, 1.0], jnp.float32)
    outs = {}
    for s4 in (False, True):
        opts = _opts(
            True, sampling_topk=0, w_int4=s4, cross_kv_qmax=7, cross_kv_s4=s4
        )
        outs[s4] = sample(
            params, cfg, opts, proc, meta, xa, prompt, prompt_len,
            sot_pos, jnp.asarray(16, jnp.int32), temps, keys,
        )
    for a, b in zip(jax.tree.leaves(outs[False]), jax.tree.leaves(outs[True])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_phase_int4_matches_single_phase():
    """The ctx ladder's _grow_ctx transitions must stay output-identical
    with packed-int4 weights/cross in play."""
    cfg, params, meta, proc, xa, prompt, prompt_len, sot_pos = _setup(seed=2)
    outs = {}
    for mp in (False, True):
        opts = _opts(
            False, w_int4=True, cross_kv_qmax=7, cross_kv_s4=True,
            ctx_cap=128, multi_phase=mp,
        )
        outs[mp] = [
            np.asarray(a)
            for a in beam_search(
                params, cfg, opts, proc, meta, xa, prompt, prompt_len,
                sot_pos, jnp.asarray(100, jnp.int32),
            )
        ]
    cur_len = outs[False][5]
    for name, a, b in zip(
        ("hist_tok", "hist_par", "fin_slot", "fin_lens", "fin_scores",
         "cur_len", "active_score", "no_speech_prob", "prompt_len"),
        outs[False], outs[True],
    ):
        if name in ("hist_tok", "hist_par"):
            # only written positions are defined; pads differ by design
            for i in range(a.shape[0]):
                np.testing.assert_array_equal(
                    a[i, : cur_len[i]], b[i, : cur_len[i]], err_msg=name
                )
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_int4_guards_reject_mispairing():
    """int4 must refuse int8-range params (the in-program pack would
    saturate them) and kv_int8=False (the cross-KV half would silently
    not apply)."""
    from faster_whisper_tpu.generation.generate import generate_dispatch
    from faster_whisper_tpu.models.engine import WhisperEngine
    from faster_whisper_tpu.ops.quant import quantize_params
    from faster_whisper_tpu.testing import build_synthetic_tokenizer

    cfg = tiny_test_config()
    raw = random_params(cfg, dtype="float32")
    tok = build_synthetic_tokenizer()

    with pytest.raises(ValueError, match="int8-range"):
        WhisperEngine(quantize_params(raw), cfg, tok, kv_int8=True, int4=True)
    with pytest.raises(ValueError, match="kv_int8"):
        WhisperEngine(
            quantize_params_int4(raw), cfg, tok, kv_int8=False, int4=True
        )

    eng = WhisperEngine(quantize_params_int4(raw), cfg, tok, kv_int8=True)
    xa = jnp.zeros((1, cfg.n_audio_ctx, cfg.n_audio_state), jnp.bfloat16)
    with pytest.raises(ValueError, match="kv_int8"):
        generate_dispatch(
            eng.params, cfg, eng.meta, xa, [[1, 2, 3]], sot_id=eng.sot_id,
            int4=True, kv_int8=False,
        )


def test_int4_end_to_end_pipeline():
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.transcribe import WhisperModel

    cfg = tiny_test_config()
    model = WhisperModel.from_parts(
        random_params(cfg, dtype="float32"),
        cfg,
        build_synthetic_tokenizer(),
        compute_type="int4",
    )
    assert model.model.int4 and model.model.kv_int8
    segs, info = model.transcribe(
        np.random.default_rng(0).standard_normal(16000 * 2).astype(np.float32)
        * 0.1,
        language="en",
        beam_size=2,
        temperature=[0.0],
        log_prob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    list(segs)

    rep = model.model.memory_report(batch_size=1, beam_size=2, max_new_tokens=8)
    assert rep["weights_bytes"] > 0


def test_quantize_int4_group_scales_shapes_and_error():
    """group_size=G: one scale per (in-group, out channel) on the 4-bit
    weights; group-wise dequant error is never worse than per-channel
    (it can only tighten the per-group range)."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
    # plant an outlier so per-channel scales visibly lose resolution
    w = w.at[0, 0].set(40.0)

    from faster_whisper_tpu.ops.quant import quantize_weight

    per_ch = quantize_weight(w, qmax=7)
    grouped = quantize_weight(w, qmax=7, group_size=16)
    assert grouped.q.shape == (64, 48)
    assert grouped.s.shape == (4, 48)
    assert int(jnp.max(jnp.abs(grouped.q))) <= 7

    def dequant(ql):
        if ql.s.ndim == ql.q.ndim:
            qg = np.asarray(ql.q, np.float32).reshape(4, 16, 48)
            return (qg * np.asarray(ql.s)[:, None, :]).reshape(64, 48)
        return np.asarray(ql.q, np.float32) * np.asarray(ql.s)

    err_ch = np.abs(dequant(per_ch) - np.asarray(w)).mean()
    err_g = np.abs(dequant(grouped) - np.asarray(w)).mean()
    assert err_g <= err_ch
    # the outlier column: group scales confine the damage to group 0
    col_ch = np.abs(dequant(per_ch)[16:, 0] - np.asarray(w)[16:, 0]).mean()
    col_g = np.abs(dequant(grouped)[16:, 0] - np.asarray(w)[16:, 0]).mean()
    assert col_g < col_ch


def test_int8_dense_group_scales_match_per_channel_at_equal_scales():
    """When every in-group shares the column's amax, group-wise and
    per-channel quantization produce the same q and the grouped dot must
    reproduce the per-channel result exactly (int32 accumulation; the
    f32 group-sum is exact for these small integers)."""
    from faster_whisper_tpu.ops.quant import int8_dense, quantize_weight

    rng = np.random.default_rng(4)
    # values on a +-7 integer grid scaled by a per-column constant ->
    # both schemes quantize losslessly with identical scales
    base = rng.integers(-7, 8, size=(32, 24)).astype(np.float32)
    base[0, :] = 7.0  # pin every column's amax into group 0
    base[16, :] = 7.0  # ... and group 1
    col_scale = rng.uniform(0.5, 2.0, size=(1, 24)).astype(np.float32)
    w = jnp.asarray(base * col_scale)

    per_ch = quantize_weight(w, qmax=7)
    grouped = quantize_weight(w, qmax=7, group_size=16)
    np.testing.assert_array_equal(np.asarray(per_ch.q), np.asarray(grouped.q))

    x = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    y_ch = int8_dense(x, per_ch)
    y_g = int8_dense(x, grouped)
    np.testing.assert_allclose(
        np.asarray(y_ch), np.asarray(y_g), rtol=1e-6, atol=1e-6
    )


def test_beam_int4_group_storage_bit_identical():
    """Packed-int4 storage stays a numeric no-op under group-wise scales
    (the pack touches q only; the grouped dense reads the same s)."""
    cfg = tiny_test_config()
    params = quantize_params_int4(
        random_params(cfg, dtype="float32", seed=5), group_size=16
    )
    # group-wise s carries one extra dim on the 4-bit decoder weights
    s = params["decoder"]["layers"]["mlp"]["w1"].s
    q = params["decoder"]["layers"]["mlp"]["w1"].q
    assert s.ndim == q.ndim, (s.shape, q.shape)

    meta = TokenMeta(
        eot=cfg.n_vocab - 1,
        timestamp_begin=cfg.n_vocab - 10,
        no_timestamps=cfg.n_vocab - 11,
        no_speech=cfg.n_vocab - 12,
        blank=(220,),
        vocab_size=cfg.n_vocab,
    )
    proc = ProcessorOptions(with_timestamps=False)
    rng = np.random.default_rng(5)
    xa = jnp.asarray(
        rng.standard_normal((2, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.bfloat16,
    ) * 0.1
    prompt = jnp.asarray([[1, 2, 3, 0]] * 2, jnp.int32)
    prompt_len = jnp.asarray([3] * 2, jnp.int32)
    sot_pos = jnp.asarray([0] * 2, jnp.int32)

    outs = {}
    for s4 in (False, True):
        opts = _opts(False, w_int4=s4, cross_kv_qmax=7, cross_kv_s4=s4)
        outs[s4] = beam_search(
            params, cfg, opts, proc, meta, xa, prompt, prompt_len,
            sot_pos, jnp.asarray(16, jnp.int32),
        )
    for a, b in zip(jax.tree.leaves(outs[False]), jax.tree.leaves(outs[True])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int4_group_end_to_end_pipeline():
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.transcribe import WhisperModel

    cfg = tiny_test_config()
    model = WhisperModel.from_parts(
        random_params(cfg, dtype="float32", seed=6),
        cfg,
        build_synthetic_tokenizer(),
        compute_type="int4",
        int4_group_size=16,
    )
    rng = np.random.default_rng(6)
    audio = rng.standard_normal(16000 * 4).astype(np.float32) * 0.1
    segments, info = model.transcribe(
        audio, language="en", beam_size=2, max_new_tokens=8
    )
    for s in segments:
        assert s.end >= s.start
