"""The batched fallback ladder must be decision- and draw-identical to
the serial rungs.

Round-4 perf item: once a rung fails and every remaining rung is a
sampling rung, ``generate_with_fallback`` dispatches the whole tail as
ONE batched call (rows = rungs) instead of six serial decodes
(transcribe.py rung_results).  The reference evaluates rungs serially
(reference transcribe.py:1410-1487); batching is legal because rung
evaluation is side-effect-free and each row's draws depend only on its
own traced temperature and per-row key chain, so "first acceptable rung
wins" is unchanged.  These tests pin that contract:

* host policy: batched on/off make byte-identical decisions over a
  scripted engine, and the batched path issues at most 2 device calls;
* engine: a B=n sampling call with per-row (temperature, seed) rows
  reproduces each row's solo B=1 call exactly;
* one compiled program serves every temperature value (the jit cache
  must not key on the float).
"""

import logging
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_generation import tiny_model  # noqa: E402,F401 (fixture)
from tests.test_reference_parity import _fallback_options  # noqa: E402


class _Result:
    def __init__(self, seq, score, nsp):
        self.sequences_ids = [list(seq)]
        self.scores = [score]
        self.no_speech_prob = nsp


class _ScriptedEngine:
    """Rung results keyed by temperature; supports both the serial
    dispatch (B=1) and the batched tail (B=n, per-row temperatures)."""

    def __init__(self, by_temp):
        self.by_temp = by_temp
        self.dispatches = []  # list of per-call temperature lists

    def generate_dispatch(self, enc, prompts, **kw):
        t = kw["sampling_temperature"] if kw.get("beam_size") == 1 else 0.0
        temps = list(t) if isinstance(t, (list, tuple)) else [float(t)]
        assert len(temps) == len(prompts)
        self.dispatches.append(temps)
        return temps

    def generate_collect(self, temps):
        return [_Result(*self.by_temp[t]) for t in temps]


def _build_model(script):
    from faster_whisper_tpu.transcribe import WhisperModel

    m = object.__new__(WhisperModel)
    m.model = _ScriptedEngine(script)
    m.logger = logging.getLogger("batched-ladder")
    m.time_precision = 0.02
    m.max_length = 448
    return m


class _Tok:
    def decode(self, toks):
        return " ".join(str(t) for t in toks)


_DIVERSE = list(range(100, 130))
_REPEATED = [7, 7] * 40  # zlib-compressible -> CR above 2.4
_TEMPS = [0.0, 0.2, 0.4, 0.6, 0.8, 1.0]


def _scenarios():
    ok = (_DIVERSE, -0.2, 0.1)
    cr_fail = (_REPEATED, -0.3, 0.1)

    def lp_fail(i):
        return (list(_DIVERSE), -2.0 - 0.1 * i, 0.1)

    # accept at rung k, for every k, plus the all-fail best-pick
    for k in range(len(_TEMPS)):
        yield {
            t: (ok if i == k else lp_fail(i)) for i, t in enumerate(_TEMPS)
        }, f"accept-at-{k}"
    yield {t: lp_fail(i) for i, t in enumerate(_TEMPS)}, "all-fail"
    yield {
        t: (cr_fail if i < 2 else lp_fail(i)) for i, t in enumerate(_TEMPS)
    }, "cr-then-lp-all-fail"


def test_batched_ladder_decisions_match_serial(monkeypatch):
    from faster_whisper_tpu.transcribe import TranscriptionOptions

    enc = np.zeros((1, 4, 8), np.float32)
    opts = _fallback_options(TranscriptionOptions, temperatures=_TEMPS)

    for script, name in _scenarios():
        results = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("FWT_BATCHED_LADDER", flag)
            m = _build_model(script)
            results[flag] = (
                m.generate_with_fallback(enc, [1, 2, 3], _Tok(), opts),
                m.model.dispatches,
            )
        (b_res, b_disp), (s_res, s_disp) = results["1"], results["0"]
        assert b_res[0].sequences_ids == s_res[0].sequences_ids, name
        assert b_res[1] == pytest.approx(s_res[1]), name
        assert b_res[2] == s_res[2], name  # reported temperature
        assert b_res[3] == pytest.approx(s_res[3]), name
        # the batched path never issues more than beam + one tail call
        assert len(b_disp) <= 2, (name, b_disp)
        if len(s_disp) > 1:  # rung 0 failed -> tail was batched
            assert b_disp[-1] == _TEMPS[1:], (name, b_disp)


def test_batched_ladder_rows_match_solo_calls(tiny_model):
    """B=n per-row (temperature, seed) sampling == each row's B=1 call."""
    import jax.numpy as jnp

    from faster_whisper_tpu.generation.generate import generate

    cfg, params, tok, meta, xa = tiny_model
    prompt = list(tok.sot_sequence)
    temps = [0.3, 0.8, 1.0]
    seeds = [5, 9, 13]

    kw = dict(
        sot_id=tok.sot, beam_size=1, sampling_topk=0, num_hypotheses=3,
        max_length=28, with_timestamps=True, return_scores=True,
    )
    xa_n = jnp.broadcast_to(xa, (len(temps),) + tuple(xa.shape[1:]))
    batched = generate(
        params, cfg, meta, xa_n, [prompt] * len(temps),
        sampling_temperature=temps, rng_seed=seeds, **kw,
    )
    for i, (t, s) in enumerate(zip(temps, seeds)):
        solo = generate(
            params, cfg, meta, xa, [prompt],
            sampling_temperature=[t], rng_seed=[s], **kw,
        )[0]
        assert batched[i].sequences_ids == solo.sequences_ids, (i, t)
        np.testing.assert_allclose(
            batched[i].scores, solo.scores, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            batched[i].no_speech_prob, solo.no_speech_prob,
            rtol=1e-5, atol=1e-6,
        )


def test_one_sampling_program_serves_every_temperature(tiny_model):
    """The temperature is traced: new values must not recompile."""
    from faster_whisper_tpu.generation.generate import generate, sample

    cfg, params, tok, meta, xa = tiny_model
    prompt = list(tok.sot_sequence)
    kw = dict(
        sot_id=tok.sot, beam_size=1, sampling_topk=0, num_hypotheses=2,
        max_length=24, with_timestamps=True, rng_seed=7,
    )
    generate(params, cfg, meta, xa, [prompt],
             sampling_temperature=0.31415, **kw)
    n0 = sample._cache_size()
    for t in (0.2, 0.4, 0.6, 0.8, 1.0, 1.7):
        generate(params, cfg, meta, xa, [prompt],
                 sampling_temperature=t, **kw)
    assert sample._cache_size() == n0


def test_transcribe_full_ladder_uses_batched_tail(monkeypatch):
    """End-to-end: a forced full ladder in `transcribe` goes through the
    batched tail (one beam + one batched sample dispatch per window) and
    still yields well-formed segments."""
    from faster_whisper_tpu.testing import build_test_model

    monkeypatch.setenv("FWT_BATCHED_LADDER", "1")
    model = build_test_model()
    eng = model.model
    calls = []
    orig = eng.generate_dispatch

    def spy(enc, prompts, **kw):
        calls.append((len(prompts), kw.get("sampling_temperature")))
        return orig(enc, prompts, **kw)

    monkeypatch.setattr(eng, "generate_dispatch", spy)
    audio = np.random.default_rng(0).standard_normal(16000 * 4) * 0.1
    segments, _ = model.transcribe(
        audio.astype(np.float32), language="en", beam_size=2, best_of=2,
        temperature=[0.0, 0.2, 0.4, 0.6, 0.8, 1.0], vad_filter=False,
        max_new_tokens=12, log_prob_threshold=100.0,  # reject every rung
        condition_on_previous_text=False,
    )
    segs = list(segments)
    assert segs, "forced-ladder transcribe produced no segments"
    batched_calls = [c for c in calls if c[0] == 5]
    assert batched_calls, f"no batched tail dispatch seen: {calls}"
    assert all(c[1] == [0.2, 0.4, 0.6, 0.8, 1.0] for c in batched_calls)
