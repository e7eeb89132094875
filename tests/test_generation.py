import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from faster_whisper_tpu.generation.processors import (  # noqa: E402
    NEG_INF,
    ProcessorOptions,
    TokenMeta,
    apply_logits_rules,
)

# Small synthetic vocabulary:
#   0..9 text, 10 eot, 11 notimestamps, 12.. timestamps
META = TokenMeta(
    eot=10,
    timestamp_begin=12,
    no_timestamps=11,
    no_speech=9,
    blank=(3,),
    vocab_size=32,
)


def run_rules(logits, sampled, opts, prompt=(0,)):
    """Helper: build buffers from a prompt + sampled suffix and apply."""
    ctx = 64
    tokens = np.zeros((1, ctx), dtype=np.int32)
    seq = list(prompt) + list(sampled)
    tokens[0, : len(seq)] = seq
    out = apply_logits_rules(
        jnp.asarray(logits, dtype=jnp.float32)[None, :],
        jnp.asarray(tokens),
        jnp.asarray([len(seq)], dtype=jnp.int32),
        jnp.asarray([len(prompt)], dtype=jnp.int32),
        META,
        opts,
    )
    return np.asarray(out)[0]


def flat_logits():
    return np.zeros(META.vocab_size, dtype=np.float32)


def banned(out):
    return set(np.where(out < -1e29)[0].tolist())


def test_suppress_tokens_static():
    opts = ProcessorOptions(
        suppress_blank=False, suppress_tokens=(1, 5), with_timestamps=False
    )
    out = run_rules(flat_logits(), [2, 3], opts)
    assert {1, 5} <= banned(out)
    assert 2 not in banned(out)


def test_suppress_blank_only_at_begin():
    opts = ProcessorOptions(
        suppress_blank=True, suppress_tokens=(), with_timestamps=False
    )
    out = run_rules(flat_logits(), [], opts)
    assert {3, META.eot} <= banned(out)  # blank + eot at the first position
    out = run_rules(flat_logits(), [4], opts)
    assert 3 not in banned(out) and META.eot not in banned(out)


def test_first_position_timestamps_only():
    opts = ProcessorOptions(
        suppress_blank=False, with_timestamps=True, max_initial_timestamp_index=3
    )
    out = run_rules(flat_logits(), [], opts)
    b = banned(out)
    # all text banned, timestamps over the cap banned
    assert set(range(0, META.timestamp_begin)) <= b
    assert META.timestamp_begin not in b
    assert META.timestamp_begin + 3 not in b
    assert META.timestamp_begin + 4 in b


def test_after_single_timestamp_text_banned():
    opts = ProcessorOptions(suppress_blank=False, with_timestamps=True)
    # sampled: [ts, text, ts] -> mid pair: next must be ts or eot.
    # Give eot a large logit so the "timestamp probability dominates" rule
    # (which compares against eot as a text token, openai semantics) stays
    # inactive and we observe the pairing rule alone.
    logits = flat_logits()
    logits[META.eot] = 10.0
    out = run_rules(logits, [12, 2, 14], opts)
    b = banned(out)
    assert set(range(0, META.eot)) <= b  # text banned
    assert META.eot not in b
    assert 14 not in b  # the same timestamp may close the pair
    assert 13 in b  # timestamps below the last are banned


def test_after_timestamp_pair_timestamps_banned():
    opts = ProcessorOptions(suppress_blank=False, with_timestamps=True)
    # sampled: [ts12, text, ts14, ts14] -> pair closed: next must be text
    out = run_rules(flat_logits(), [12, 2, 14, 14], opts)
    b = banned(out)
    assert all(t in b for t in range(META.timestamp_begin, META.vocab_size))
    assert 2 not in b


def test_timestamps_nondecreasing():
    opts = ProcessorOptions(suppress_blank=False, with_timestamps=True)
    out = run_rules(flat_logits(), [14, 2], opts)
    b = banned(out)
    # after pair [14] (single at begin counts as pair-closed), floor is 15
    assert 12 in b and 13 in b and 14 in b
    assert 15 not in b


def test_notimestamps_always_banned_with_timestamps():
    opts = ProcessorOptions(suppress_blank=False, with_timestamps=True)
    out = run_rules(flat_logits(), [12, 2], opts)
    assert META.no_timestamps in banned(out)


def test_timestamp_probability_forcing():
    opts = ProcessorOptions(suppress_blank=False, with_timestamps=True)
    logits = flat_logits()
    # make total timestamp mass dominate every individual text token
    logits[META.timestamp_begin :] = 2.0
    out = run_rules(logits, [12, 2], opts)
    b = banned(out)
    assert set(range(0, META.timestamp_begin)) - {META.no_timestamps} <= b


def test_no_repeat_ngram():
    opts = ProcessorOptions(
        suppress_blank=False, with_timestamps=False, no_repeat_ngram_size=2
    )
    # sampled [1, 2, 1]: bigram (1,2) exists, current suffix is (1,) -> ban 2
    out = run_rules(flat_logits(), [1, 2, 1], opts)
    assert 2 in banned(out)
    assert 3 not in banned(out)


def test_repetition_penalty():
    opts = ProcessorOptions(
        suppress_blank=False, with_timestamps=False, repetition_penalty=2.0
    )
    logits = flat_logits()
    logits[2] = 4.0
    logits[4] = -4.0
    out = run_rules(logits, [2, 4], opts)
    assert out[2] == pytest.approx(2.0)  # positive: divided
    assert out[4] == pytest.approx(-8.0)  # negative: multiplied
    assert out[5] == pytest.approx(0.0)  # unseen untouched


def test_carried_rules_match_buffer_rules():
    """The carried-scalar rule chain (what the decode loops run) must be
    bit-identical to the buffer-scanning reference on random states."""
    from faster_whisper_tpu.generation.processors import (
        apply_logits_rules_logprobs,
        apply_logits_rules_logprobs_carried,
    )

    rng = np.random.default_rng(1)
    ctx, R, begin_len = 64, 24, 2
    for opts in [
        ProcessorOptions(
            suppress_blank=True, suppress_tokens=(1, 5),
            with_timestamps=True, max_initial_timestamp_index=6,
        ),
        ProcessorOptions(suppress_blank=False, with_timestamps=True),
        ProcessorOptions(suppress_blank=True, with_timestamps=False),
    ]:
        logits = rng.standard_normal((R, META.vocab_size)).astype(np.float32)
        tokens = np.zeros((R, ctx), np.int32)
        cur = np.zeros((R,), np.int32)
        last = np.zeros((R,), np.int32)
        penult = np.zeros((R,), np.int32)
        tsm = np.full((R,), -1, np.int32)
        for r in range(R):
            n = int(rng.integers(0, 10))
            seq = rng.integers(0, META.vocab_size, size=n).tolist()
            tokens[r, :begin_len] = [0, 1]
            tokens[r, begin_len : begin_len + n] = seq
            cur[r] = begin_len + n
            if n >= 1:
                last[r] = seq[-1]
            if n >= 2:
                penult[r] = seq[-2]
            ts = [t for t in seq if t >= META.timestamp_begin]
            tsm[r] = max(ts) if ts else -1
        begin = np.full((R,), begin_len, np.int32)
        ref = apply_logits_rules_logprobs(
            jnp.asarray(logits), jnp.asarray(tokens), jnp.asarray(cur),
            jnp.asarray(begin), META, opts,
        )
        got = apply_logits_rules_logprobs_carried(
            jnp.asarray(logits), jnp.asarray(cur - begin),
            jnp.asarray(last), jnp.asarray(penult), jnp.asarray(tsm),
            META, opts,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# ---------------------------------------------------------------------------
# Integration: full generation on a tiny random model
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_model():
    from faster_whisper_tpu.models.config import tiny_test_config
    from faster_whisper_tpu.models.load import random_params
    from faster_whisper_tpu.models import model as M
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.tokenizer import Tokenizer

    cfg = tiny_test_config()
    params = random_params(cfg, dtype="float32")
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
        np.random.default_rng(0).standard_normal((1, 80, 3000), dtype=np.float32)
    )
    xa = M.encode(params, cfg, mel)
    return cfg, params, tok, meta, xa


def _check_timestamp_grammar(seq, meta):
    """Sampled sequences must follow the [ts, text*, ts] pairing grammar."""
    ts = [t for t in seq if t >= meta.timestamp_begin]
    assert seq[0] >= meta.timestamp_begin
    assert ts == sorted(ts)
    # scan pairing: after a closing pair, a new opening timestamp comes
    expecting_open = True
    prev_was_ts = False
    for t in seq:
        if t >= meta.timestamp_begin:
            prev_was_ts = not prev_was_ts
        else:
            prev_was_ts = False


def test_beam_search_runs_and_respects_rules(tiny_model):
    from faster_whisper_tpu.generation.generate import generate

    cfg, params, tok, meta, xa = tiny_model
    res = generate(
        params, cfg, meta, xa, [tok.sot_sequence], sot_id=tok.sot,
        beam_size=2, max_length=24, with_timestamps=True,
        max_initial_timestamp_index=50,
    )[0]
    assert len(res.sequences_ids) >= 1
    seq = res.sequences_ids[0]
    assert len(seq) <= 24 - len(tok.sot_sequence)
    _check_timestamp_grammar(seq, meta)
    assert 0.0 <= res.no_speech_prob <= 1.0
    assert res.scores[0] <= 0.0
    # scores sorted descending
    assert res.scores == sorted(res.scores, reverse=True)


def test_sampling_runs_and_is_seeded(tiny_model):
    from faster_whisper_tpu.generation.generate import generate

    cfg, params, tok, meta, xa = tiny_model
    kwargs = dict(
        sot_id=tok.sot, beam_size=1, sampling_temperature=0.8,
        sampling_topk=0, num_hypotheses=2, max_length=24,
        with_timestamps=True, rng_seed=7,
    )
    r1 = generate(params, cfg, meta, xa, [tok.sot_sequence], **kwargs)[0]
    r2 = generate(params, cfg, meta, xa, [tok.sot_sequence], **kwargs)[0]
    assert r1.sequences_ids == r2.sequences_ids  # deterministic under seed
    for seq in r1.sequences_ids:
        _check_timestamp_grammar(seq, meta)
    assert r1.scores == sorted(r1.scores, reverse=True)


def test_suppressed_tokens_never_generated(tiny_model):
    from faster_whisper_tpu.generation.generate import generate

    cfg, params, tok, meta, xa = tiny_model
    sup = tuple(range(300, 340))
    res = generate(
        params, cfg, meta, xa, [tok.sot_sequence], sot_id=tok.sot,
        beam_size=2, max_length=24, with_timestamps=True,
        suppress_tokens=sup,
    )[0]
    for seq in res.sequences_ids:
        assert not (set(seq) & set(sup))


def test_without_timestamps_mode(tiny_model):
    from faster_whisper_tpu.generation.generate import generate

    cfg, params, tok, meta, xa = tiny_model
    prompt = [tok.sot_prev, 70, 71] + tok.sot_sequence + [tok.no_timestamps]
    res = generate(
        params, cfg, meta, xa, [prompt], sot_id=tok.sot,
        beam_size=1, max_length=len(prompt) + 8, with_timestamps=False,
    )[0]
    assert len(res.sequences_ids[0]) <= 8


def test_batched_prompts(tiny_model):
    from faster_whisper_tpu.generation.generate import generate
    from faster_whisper_tpu.models import model as M

    cfg, params, tok, meta, _ = tiny_model
    mel = jnp.asarray(
        np.random.default_rng(3).standard_normal((3, 80, 3000), dtype=np.float32)
    )
    xa = M.encode(params, cfg, mel)
    res = generate(
        params, cfg, meta, xa,
        [tok.sot_sequence] * 3, sot_id=tok.sot,
        beam_size=2, max_length=20, with_timestamps=True,
    )
    assert len(res) == 3
    # Per-row encoder states actually differ (the batch is not degenerate)...
    enc = np.asarray(xa)
    assert not np.allclose(enc[0], enc[1])
    assert not np.allclose(enc[1], enc[2])
    # ...and batching must not change results: each row decoded alone
    # yields exactly the batched row's sequences and scores.  (On a tiny
    # random model different mels can legitimately beam-decode to the SAME
    # sequence, so uniqueness across rows is not a valid assertion — but
    # batched==solo equality always is, and it pins real batching bugs.)
    for i in range(3):
        solo = generate(
            params, cfg, meta, xa[i : i + 1],
            [tok.sot_sequence], sot_id=tok.sot,
            beam_size=2, max_length=20, with_timestamps=True,
        )[0]
        assert solo.sequences_ids == res[i].sequences_ids, i
        np.testing.assert_allclose(
            np.asarray(solo.scores), np.asarray(res[i].scores), rtol=1e-5, atol=1e-6
        )


def test_mha_full_matches_mha():
    """mha_full is the encoder's attention entry; off-TPU it must be the
    plain path bit-for-bit."""
    import numpy as np
    import jax.numpy as jnp
    from faster_whisper_tpu.ops.attention import mha, mha_full

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 64, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 64, 4, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 64, 4, 16)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(mha_full(q, k, v)), np.asarray(mha(q, k, v)))


def test_beam_search_kv_int8_close_to_bf16(tiny_model):
    """int8 K/V caches must reproduce the bf16 decode on a tiny model:
    identical no_speech_prob (computed pre-quantization) and the same or
    near-identical top sequence."""
    from faster_whisper_tpu.generation.generate import generate

    cfg, params, tok, meta, xa = tiny_model
    kwargs = dict(
        sot_id=tok.sot, beam_size=2, max_length=24, with_timestamps=True,
        max_initial_timestamp_index=50,
    )
    ref = generate(params, cfg, meta, xa, [tok.sot_sequence], **kwargs)[0]
    q = generate(params, cfg, meta, xa, [tok.sot_sequence], kv_int8=True, **kwargs)[0]

    assert abs(ref.no_speech_prob - q.no_speech_prob) < 1e-6
    assert len(q.sequences_ids) >= 1
    _check_timestamp_grammar(q.sequences_ids[0], meta)
    # The first token is decided by the (unquantized) prefill logits, so
    # it must match exactly.  Later steps on a tiny RANDOM model have
    # near-tied beams, so int8 cache noise can legitimately pick a
    # different continuation; bound the winner's score loosely instead
    # of assuming the same sequence won.
    assert q.sequences_ids[0][0] == ref.sequences_ids[0][0]
    if q.sequences_ids[0] == ref.sequences_ids[0]:
        assert abs(q.scores[0] - ref.scores[0]) < 0.35
    else:
        assert abs(q.scores[0] - ref.scores[0]) < 1.5


def test_sampling_entropy_fresh_by_default_and_seedable(tiny_model):
    """CT2 sampling is stochastic per call: without rng_seed two calls
    must draw different keys (fresh OS entropy), while a pinned rng_seed
    reproduces exactly."""
    from faster_whisper_tpu.generation.generate import generate

    cfg, params, tok, meta, xa = tiny_model

    def run(**kw):
        res = generate(
            params, cfg, meta, xa, [tok.sot_sequence], sot_id=tok.sot,
            beam_size=1, sampling_temperature=1.5, sampling_topk=0,
            num_hypotheses=4, max_length=32, with_timestamps=True, **kw,
        )[0]
        return [tuple(s) for s in res.sequences_ids]

    a, b = run(rng_seed=11), run(rng_seed=11)
    assert a == b
    # 4 hypotheses x 20+ steps at T=1.5 over a ~500-token vocab: two
    # unseeded calls colliding is astronomically unlikely.
    assert run() != run()


def test_sampling_kv_int8_runs(tiny_model):
    from faster_whisper_tpu.generation.generate import generate

    cfg, params, tok, meta, xa = tiny_model
    res = generate(
        params, cfg, meta, xa, [tok.sot_sequence], sot_id=tok.sot,
        beam_size=1, sampling_temperature=0.8, sampling_topk=0,
        num_hypotheses=2, max_length=24, with_timestamps=True, rng_seed=7,
        kv_int8=True,
    )[0]
    assert len(res.sequences_ids) == 2
    assert 0.0 <= res.no_speech_prob <= 1.0


def test_exact_topk_matches_lax_topk():
    """The chunk-prefiltered top-k must agree with lax.top_k exactly on
    distinct values (values AND indices), including non-multiple-of-chunk
    widths and top values clustered inside one chunk."""
    import jax.numpy as jnp

    from faster_whisper_tpu.generation.generate import _exact_topk

    rng = np.random.default_rng(0)
    for n, k in [(259330, 10), (5000, 7), (512, 5), (1000, 16)]:
        x = rng.permutation(4 * n).reshape(4, n).astype(np.float32)
        xj = jnp.asarray(x)
        v0, i0 = jax.lax.top_k(xj, k)
        v1, i1 = _exact_topk(xj, k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))

    # adversarial: all top-k packed into a single chunk
    x = np.zeros((2, 4096), np.float32)
    x[:, 100:110] = np.arange(10, 0, -1, dtype=np.float32) * 100
    v1, i1 = _exact_topk(jnp.asarray(x), 10)
    v0, i0 = jax.lax.top_k(jnp.asarray(x), 10)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))


def test_cond_chunk_parity(tiny_model, monkeypatch):
    """Chunked early-exit (GenOptions.cond_chunk > 1) must be
    output-neutral: the loop bodies are done/active-gated, so the frozen
    steps a chunk runs past convergence change nothing.  Beam and
    sampling, chunk sizes that do and do not divide the step count."""
    from faster_whisper_tpu.generation import generate as G

    cfg, params, tok, meta, xa = tiny_model

    def run_beam():
        return G.generate(
            params, cfg, meta, xa, [tok.sot_sequence], sot_id=tok.sot,
            beam_size=2, max_length=24, with_timestamps=True,
            max_initial_timestamp_index=50, return_scores=True,
        )[0]

    def run_sample():
        return G.generate(
            params, cfg, meta, xa, [tok.sot_sequence], sot_id=tok.sot,
            beam_size=1, sampling_temperature=0.8, sampling_topk=0,
            num_hypotheses=2, max_length=24, with_timestamps=True,
            rng_seed=11, return_scores=True,
        )[0]

    def with_chunk(n, fn):
        monkeypatch.setenv("FWT_COND_CHUNK", str(n))
        G._cond_chunk_default.cache_clear()
        try:
            return fn()
        finally:
            monkeypatch.delenv("FWT_COND_CHUNK")
            G._cond_chunk_default.cache_clear()

    base_b = with_chunk(1, run_beam)
    base_s = with_chunk(1, run_sample)
    for chunk in (3, 8):
        got_b = with_chunk(chunk, run_beam)
        assert got_b.sequences_ids == base_b.sequences_ids, chunk
        np.testing.assert_allclose(
            np.asarray(got_b.scores), np.asarray(base_b.scores),
            rtol=1e-5, atol=1e-6,
        )
        got_s = with_chunk(chunk, run_sample)
        assert got_s.sequences_ids == base_s.sequences_ids, chunk
        np.testing.assert_allclose(
            np.asarray(got_s.scores), np.asarray(base_s.scores),
            rtol=1e-5, atol=1e-6,
        )


@pytest.mark.parametrize("kv_int8", [False, True])
def test_multi_phase_ctx_ladder_matches_single_phase(tiny_model, kv_int8):
    """The laddered ctx decode (GenOptions.multi_phase: early steps on a
    64-slot KV table, doubling to ctx_cap) must be output-identical to
    the single-phase loop — attention and the rule chain mask positions
    >= cur_len, so the table size is invisible to the math."""
    from faster_whisper_tpu.generation.generate import (
        GenOptions, _ctx_phases, beam_search,
    )
    from faster_whisper_tpu.generation.processors import ProcessorOptions

    cfg, params, tok, meta, xa = tiny_model
    proc = ProcessorOptions(
        suppress_blank=True, suppress_tokens=(), with_timestamps=True,
        max_initial_timestamp_index=50, repetition_penalty=1.0,
        no_repeat_ngram_size=0,
    )
    prompt = list(tok.sot_sequence)
    P = 32
    pa = np.zeros((1, P), np.int32)
    pa[:, : len(prompt)] = prompt
    pl = np.full((1,), len(prompt), np.int32)
    sp = np.full((1,), prompt.index(tok.sot), np.int32)

    outs = {}
    for mp in (False, True):
        go = GenOptions(
            beam_size=3, num_finished=3, ctx_cap=256,
            kv_int8=kv_int8, multi_phase=mp,
        )
        assert _ctx_phases(P, 256, go) == ([64, 128, 256] if mp else [256])
        outs[mp] = [
            np.asarray(a)
            for a in beam_search(
                params, cfg, go, proc, meta, xa,
                jnp.asarray(pa), jnp.asarray(pl), jnp.asarray(sp),
                jnp.asarray(200, jnp.int32),
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
        elif a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.parametrize("kv_int8", [False, True])
def test_multi_phase_sampling_matches_single_phase(tiny_model, kv_int8):
    """Sampling with a pinned rng key must be identical under the ctx
    ladder — the categorical draws see the same distributions step for
    step, so the phase boundaries are invisible."""
    from faster_whisper_tpu.generation.generate import (
        GenOptions, _ctx_phases, sample,
    )
    from faster_whisper_tpu.generation.processors import ProcessorOptions

    cfg, params, tok, meta, xa = tiny_model
    proc = ProcessorOptions(
        suppress_blank=True, suppress_tokens=(), with_timestamps=True,
        max_initial_timestamp_index=50, repetition_penalty=1.0,
        no_repeat_ngram_size=0,
    )
    prompt = list(tok.sot_sequence)
    P = 32
    pa = np.zeros((1, P), np.int32)
    pa[:, : len(prompt)] = prompt
    pl = np.full((1,), len(prompt), np.int32)
    sp = np.full((1,), prompt.index(tok.sot), np.int32)

    outs = {}
    for mp in (False, True):
        go = GenOptions(
            beam_size=2, num_finished=2, sampling=True, ctx_cap=256,
            kv_int8=kv_int8, multi_phase=mp,
        )
        assert _ctx_phases(P, 256, go) == ([64, 128, 256] if mp else [256])
        outs[mp] = [
            np.asarray(a)
            for a in sample(
                params, cfg, go, proc, meta, xa,
                jnp.asarray(pa), jnp.asarray(pl), jnp.asarray(sp),
                jnp.asarray(200, jnp.int32),
                jnp.full((1,), 0.8, jnp.float32),
                jax.random.PRNGKey(7)[None],
            )
        ]

    lens = outs[False][1]
    for name, a, b in zip(
        ("tokens", "lens", "cum_logprob", "eot_seen", "no_speech_prob"),
        outs[False], outs[True],
    ):
        if name == "tokens":
            for i in range(a.shape[0]):
                for k in range(a.shape[1]):
                    np.testing.assert_array_equal(
                        a[i, k, : lens[i, k]], b[i, k, : lens[i, k]],
                        err_msg=name,
                    )
        elif a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_ctx_phase_ladder_gating():
    """The ladder must collapse to a single phase whenever its step-cap
    bookkeeping can't be exact (cond_chunk), the table is compiled into a
    kernel, the feature is off, or there is no room below the full
    table (long prompts, tiny ctx)."""
    from faster_whisper_tpu.generation.generate import GenOptions, _ctx_phases

    on = GenOptions(multi_phase=True)
    assert _ctx_phases(32, 192, on) == [64, 128, 192]
    assert _ctx_phases(32, 448, on) == [64, 128, 256, 448]
    assert _ctx_phases(128, 448, on) == [192, 384, 448]
    # prompt bucket already needs the full table
    assert _ctx_phases(128, 192, on) == [192]
    assert _ctx_phases(32, 64, on) == [64]
    assert _ctx_phases(32, 256, GenOptions(multi_phase=False)) == [256]
    assert _ctx_phases(32, 256, GenOptions(multi_phase=True, cond_chunk=4)) == [256]
    # every ladder is ascending and ends at the full table
    for p in (32, 128, 256):
        for ctx in (64, 128, 192, 256, 448):
            ph = _ctx_phases(p, ctx, on)
            assert ph[-1] == ctx and ph == sorted(set(ph)), (p, ctx, ph)


def test_ctx_phases_unaligned_ctx_disables_ladder_under_fused():
    """Unaligned ctx_cap + the fused Pallas kernel (8-slot write windows)
    must fall back to the single-phase loop (advisor r3 finding)."""
    from faster_whisper_tpu.generation.generate import GenOptions, _ctx_phases

    fused = GenOptions(multi_phase=True, fused_attn=True)
    assert _ctx_phases(32, 260, fused) == [260]
    # aligned ctx keeps the ladder; unfused unaligned keeps it too (the
    # XLA step has no sublane write windows)
    assert _ctx_phases(32, 256, fused) == [64, 128, 256]
    unfused = GenOptions(multi_phase=True, fused_attn=False)
    assert _ctx_phases(32, 260, unfused)[-1] == 260


def test_memory_report_and_dry_lower():
    """WhisperEngine.memory_report must produce the peak-HBM accounting
    (reference publishes memory per speed row, README.md:27-30) without
    executing anything; dry_lower returns the exact lowered program."""
    from faster_whisper_tpu.testing import build_test_model

    m = build_test_model()
    rep = m.model.memory_report(batch_size=2, beam_size=2, max_new_tokens=8)
    assert rep["weights_bytes"] > 0
    for name in ("encode", "decode"):
        r = rep[name]
        if r is not None:  # backend may not expose memory_analysis
            assert r["peak_bytes"] >= r["argument_bytes"] > 0

    from faster_whisper_tpu.generation.generate import generate_dispatch

    eng = m.model
    cfg = eng.config
    xa = jnp.zeros((2, cfg.n_audio_ctx, cfg.n_audio_state), jnp.float32)
    lowered = generate_dispatch(
        eng.params, cfg, eng.meta, xa, [[eng.sot_id]] * 2,
        sot_id=eng.sot_id, beam_size=2, max_length=16, dry_lower=True,
    )
    assert hasattr(lowered, "compile")  # jax.stages.Lowered
