"""Whole-decoder megakernel parity (ops/mega_decoder.py).

The megakernel (interpret mode on CPU) must reproduce the pure-XLA
decode step — logits, cache appends, scale rows — within s8-activation
quantization noise, and a full beam-search decode through it must agree
with the XLA decode on the sampled sequences.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from faster_whisper_tpu.generation.generate import (  # noqa: E402
    _gen_decoder_step,
    _expand_caches,
)
from faster_whisper_tpu.models import model as M  # noqa: E402
from faster_whisper_tpu.models.config import tiny_test_config  # noqa: E402
from faster_whisper_tpu.models.load import random_params  # noqa: E402
from faster_whisper_tpu.ops.quant import quantize_params  # noqa: E402
from faster_whisper_tpu.ops.mega_decoder import pack_mega  # noqa: E402


@pytest.fixture(scope="module")
def decode_state():
    """A tiny quantized model mid-decode: prefilled caches expanded to
    the (B, K) beam grid, plus a step's tokens/positions/ancestry."""
    cfg = tiny_test_config()
    params = quantize_params(random_params(cfg, dtype="float32"))
    rng = np.random.default_rng(7)
    B, K, P = 2, 3, 6
    ctx = 32

    xa = jnp.asarray(
        rng.standard_normal((B, cfg.n_audio_ctx // 16, cfg.n_text_state)),
        jnp.float32,
    )  # fake encoder states (T kept small for speed)
    prompt = jnp.asarray(
        rng.integers(0, cfg.n_vocab, (B, P)), jnp.int32
    )
    lengths = jnp.full((B,), P, jnp.int32)
    gather = jnp.stack([lengths - 1, jnp.zeros((B,), jnp.int32)], axis=1)
    _, cache0 = M.decoder_prefill(
        params, cfg, prompt, lengths, xa, gather, ctx=ctx
    )
    self_k, self_v, cross_k, cross_v = _expand_caches(cache0, K, True)

    token = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, K)), jnp.int32)
    pos_row = jnp.full((B,), P, jnp.int32)
    pos = jnp.broadcast_to(pos_row[:, None], (B, K))
    # a non-trivial ancestry: prompt positions owned per slot (prefill
    # broadcast), future columns permuted (never attended: > pos), and
    # the WRITE column owned by each beam's own slot — the decode loop's
    # invariant (beam_search writes anc[b, k, write_pos] = k before the
    # step; the kernels patch the new token as an explicit own term).
    anc = np.zeros((B, K, ctx), np.int32)
    anc[:, :, :P] = np.arange(K, dtype=np.int32)[None, :, None]
    anc[:, :, P:] = rng.integers(0, K, (B, K, ctx - P))
    anc[:, :, P] = np.arange(K, dtype=np.int32)[None, :]
    anc = jnp.asarray(anc)
    return (cfg, params, token, pos, pos_row,
            self_k, self_v, cross_k, cross_v, anc)


def test_mega_kernel_matches_exact_twin(decode_state):
    """The kernel (interpret mode) against the pure-XLA mirror of its
    EXACT math (mega_decode_layers_xla): s8 dots accumulate in int32 and
    the f32 chains match op-for-op, so agreement must be at float-
    associativity level, and the int8 cache columns bit-equal."""
    from faster_whisper_tpu.ops.mega_decoder import (
        mega_decode_layers,
        mega_decode_layers_xla,
    )

    (cfg, params, token, pos, pos_row,
     self_k, self_v, cross_k, cross_v, anc) = decode_state
    dec = params["decoder"]
    x0 = (dec["token_embed"][token] + dec["pos_embed"][pos]).astype(
        dec["token_embed"].dtype
    )
    mega = pack_mega(params)
    kx, ksk, ksv = mega_decode_layers(
        x0, pos_row, anc, self_k, self_v, cross_k, cross_v, mega,
        n_head=cfg.n_text_head, interpret=True,
    )
    tx, tsk, tsv = mega_decode_layers_xla(
        x0, pos_row, anc, self_k, self_v, cross_k, cross_v, mega,
        n_head=cfg.n_text_head,
    )
    scale = float(np.abs(np.asarray(tx)).max())
    np.testing.assert_allclose(
        np.asarray(kx), np.asarray(tx), atol=1e-4 * scale
    )
    for kc, tc in ((ksk, tsk), (ksv, tsv)):
        np.testing.assert_array_equal(np.asarray(kc.q), np.asarray(tc.q))
        np.testing.assert_allclose(
            np.asarray(kc.s), np.asarray(tc.s), rtol=1e-5
        )


def test_mega_step_matches_xla_step(decode_state):
    (cfg, params, token, pos, pos_row,
     self_k, self_v, cross_k, cross_v, anc) = decode_state

    ref_logits, ref_sk, ref_sv = _gen_decoder_step(
        params, cfg, token, pos, pos_row,
        self_k, self_v, cross_k, cross_v, anc, fused=False,
    )
    mega = pack_mega(params)
    meg_logits, meg_sk, meg_sv = _gen_decoder_step(
        params, cfg, token, pos, pos_row,
        self_k, self_v, cross_k, cross_v, anc,
        fused=False, mega=mega, mega_interpret=True,
    )

    # Logits agree within s8 activation-quantization noise (the XLA path
    # quantizes activations identically but attends in f32; the kernel
    # additionally s8-quantizes q and the softmax weights, like the
    # production bf16 per-layer kernels).  Bound the noise two ways:
    # nearly all elements tight, every element capped.
    r = np.asarray(ref_logits)
    g = np.asarray(meg_logits)
    scale = float(np.abs(r).max())
    assert (np.abs(g - r) <= 0.02 * scale).mean() > 0.99
    np.testing.assert_allclose(g, r, atol=0.12 * scale)
    # Ranking agreement at the top (what the decode loop consumes).
    assert (np.argmax(g, -1) == np.argmax(r, -1)).mean() > 0.95

    # The appended cache column: values int8-exact-ish, scales close.
    p0 = int(np.asarray(pos_row)[0])
    for ref_c, meg_c in ((ref_sk, meg_sk), (ref_sv, meg_sv)):
        rq = np.asarray(ref_c.q)[:, :, :, :, p0].astype(np.int32)
        gq = np.asarray(meg_c.q)[:, :, :, :, p0].astype(np.int32)
        assert (np.abs(rq - gq) <= 2).mean() > 0.99
        rs = np.asarray(ref_c.s)[:, :, :, :, p0]
        gs = np.asarray(meg_c.s)[:, :, :, :, p0]
        np.testing.assert_allclose(gs, rs, rtol=0.05, atol=1e-6)
        # untouched columns are bit-identical (aliased in-place append)
        np.testing.assert_array_equal(
            np.asarray(ref_c.q)[:, :, :, :, :p0],
            np.asarray(meg_c.q)[:, :, :, :, :p0],
        )


def test_mega_beam_search_matches_xla_decode(monkeypatch):
    """End-to-end: a beam-search decode through the megakernel
    (interpret mode) picks the same first tokens and a near-identical
    score as the XLA decode on a tiny model."""
    from faster_whisper_tpu.generation.generate import generate
    from faster_whisper_tpu.generation.processors import TokenMeta
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.tokenizer import Tokenizer

    cfg = tiny_test_config()
    params = quantize_params(random_params(cfg, dtype="float32"))
    hf = build_synthetic_tokenizer()
    tok = Tokenizer(hf, multilingual=True, task="transcribe", language="en")
    meta = TokenMeta(
        eot=tok.eot,
        timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps,
        no_speech=tok.no_speech,
        blank=tuple(tok.encode(" ")),
        vocab_size=cfg.n_vocab,
    )
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, 80, 3000), dtype=np.float32
        )
    )
    xa = M.encode(params, cfg, mel)
    kwargs = dict(
        sot_id=tok.sot, beam_size=2, max_length=20, with_timestamps=True,
        max_initial_timestamp_index=50, kv_int8=True,
    )

    import faster_whisper_tpu.generation.generate as G

    monkeypatch.setenv("FWT_MEGA", "0")
    G._mega_mode.cache_clear()
    ref = generate(params, cfg, meta, xa, [tok.sot_sequence], **kwargs)[0]

    monkeypatch.setenv("FWT_MEGA", "interpret")
    G._mega_mode.cache_clear()
    try:
        meg = generate(params, cfg, meta, xa, [tok.sot_sequence], **kwargs)[0]
    finally:
        G._mega_mode.cache_clear()

    assert abs(ref.no_speech_prob - meg.no_speech_prob) < 1e-6
    # The first generated token is decided by the shared (XLA) prefill
    # logits; afterwards random-model beams are near-tied, so bound the
    # winner's score instead of requiring the same sequence.
    assert meg.sequences_ids[0][0] == ref.sequences_ids[0][0]
    if meg.sequences_ids[0] == ref.sequences_ids[0]:
        assert abs(meg.scores[0] - ref.scores[0]) < 0.35
    else:
        assert abs(meg.scores[0] - ref.scores[0]) < 1.5
