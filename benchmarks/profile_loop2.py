"""Decompose the beam-loop residual (round 3).

profile_step.py shows full beam_search at ~8.5 ms/step vs decoder-only
6.7 + selection 0.6.  This script separates the remaining candidates:

  0. one-time costs inside beam_search (prefill + cache expand/quantize)
     — amortized over STEPS they inflate the apparent per-step cost;
  1. the REAL production body (backpointer selection + decoder, coupled)
     under lax.fori_loop — no early-exit cond, no done logic;
  2. the new backpointer selection chain alone;
  3. the real body under lax.while_loop with a counter cond (same body as
     1, tests whether while-vs-fori matters at all).

Run on the real chip:  python benchmarks/profile_loop2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.generation.generate import (
    GenOptions,
    _exact_topk,
    _expand_caches,
    _gather_rows,
    _gen_decoder_step,
    _scatter_slots,
    _write_column,
)
from faster_whisper_tpu.generation.processors import (
    NEG_INF,
    ProcessorOptions,
    TokenMeta,
    apply_logits_rules_logprobs_carried,
)
from faster_whisper_tpu.models.config import CONFIGS
from faster_whisper_tpu.models.load import random_params_device
from faster_whisper_tpu.models.model import decoder_prefill
from faster_whisper_tpu.ops.quant import quantize_params

B, K, P, CTX = 8, 5, 32, 192
STEPS = int(os.environ.get("PROF_STEPS", "128"))
MODEL = os.environ.get("PROF_MODEL", "large-v3")


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    config = CONFIGS[MODEL]
    params = random_params_device(config, seed=0, dtype="bfloat16")
    params = quantize_params(params)
    V = config.n_vocab

    meta = TokenMeta(
        eot=50257, timestamp_begin=50365, no_timestamps=50364,
        no_speech=50363, blank=(220,), vocab_size=V,
    )
    proc_opts = ProcessorOptions(
        suppress_blank=True, suppress_tokens=tuple(range(1, 40)),
        with_timestamps=True, max_initial_timestamp_index=50,
    )

    rng = np.random.default_rng(0)
    xa = jnp.asarray(
        rng.standard_normal((B, 1500, config.n_text_state)), jnp.bfloat16
    )
    prompt = np.zeros((B, P), np.int32)
    prompt[:, :4] = [50258, 50259, 50359, 50364]
    prompt_np = jnp.asarray(prompt)
    prompt_len = jnp.asarray(np.full((B,), 4, np.int32))

    # ---- 0. one-time: prefill + expand/quantize ----
    @jax.jit
    def prefill_expand(params, xa, prompt, prompt_len):
        gather = jnp.stack([prompt_len - 1, jnp.zeros_like(prompt_len)], axis=1)
        first_logits, cache0 = decoder_prefill(
            params, config, prompt, prompt_len, xa, gather, ctx=CTX
        )
        sk, sv, ck, cv = _expand_caches(cache0, K, True)
        return first_logits, sk, sv, ck, cv

    t0 = timeit(prefill_expand, params, xa, prompt_np, prompt_len)
    print(f"one-time prefill+expand: {t0*1e3:.1f} ms "
          f"(= {t0/STEPS*1e3:.2f} ms/step amortized over {STEPS})")

    first_logits, self_k, self_v, cross_k, cross_v = prefill_expand(
        params, xa, prompt_np, prompt_len
    )

    anc0 = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, CTX)
    )
    logits0 = jnp.broadcast_to(first_logits[:, 0][:, None, :], (B, K, V))

    def real_body(state, params, cross_k, cross_v):
        """The production body minus the finished pool / done logic.
        params/caches arrive as jit ARGUMENTS — closing over the concrete
        arrays embeds GBs of constants in the HLO and wedges the
        remote-compile relay."""
        (cur_len, sum_lp, self_k, self_v, anc, cur_logits,
         last_tok, penult_tok, ts_max, hist_tok, hist_par, i) = state
        n_sampled = cur_len - 4
        logprobs = apply_logits_rules_logprobs_carried(
            cur_logits.reshape(B * K, V),
            jnp.broadcast_to(n_sampled[:, None], (B, K)).reshape(B * K),
            last_tok.reshape(B * K),
            penult_tok.reshape(B * K),
            ts_max.reshape(B * K),
            meta, proc_opts,
        ).reshape(B, K, V)
        total = sum_lp[:, :, None] + logprobs
        cand_val, cand_idx = _exact_topk(total.reshape(B, K * V), 2 * K)
        cand_beam = cand_idx // V
        cand_tok = cand_idx % V
        is_eot = cand_tok == meta.eot
        keep = ~is_eot
        rank = jnp.cumsum(keep.astype(jnp.int32), axis=1)
        slot = jnp.where(keep & (rank <= K), rank - 1, K)
        new_beam = _scatter_slots(cand_beam, slot, K, 0)
        new_tok = _scatter_slots(cand_tok, slot, K, 0)
        new_cum = _scatter_slots(cand_val, slot, K, NEG_INF)
        parent = new_beam
        write_pos = jnp.clip(cur_len, 0, CTX - 1)
        hit = (
            jax.lax.broadcasted_iota(jnp.int32, (1, CTX, 1), 1)
            == write_pos[:, None, None]
        )
        hist_tok = jnp.where(hit, new_tok[:, None, :], hist_tok)
        hist_par = jnp.where(hit, parent[:, None, :], hist_par)
        penult_new = _gather_rows(last_tok, parent)
        ts_prev = _gather_rows(ts_max, parent)
        ts_new = jnp.where(
            new_tok >= meta.timestamp_begin,
            jnp.maximum(ts_prev, new_tok), ts_prev,
        )
        k_arange = jnp.arange(K)[None, :]
        write_pos_bk = jnp.broadcast_to(write_pos[:, None], (B, K))
        anc_new = _gather_rows(anc, parent)
        anc_new = _write_column(
            anc_new, write_pos_bk, jnp.broadcast_to(k_arange, (B, K))
        )
        next_logits, self_k, self_v = _gen_decoder_step(
            params, config, new_tok, write_pos_bk, write_pos,
            self_k, self_v, cross_k, cross_v, anc_new, fused=True,
        )
        return (jnp.minimum(cur_len + 1, CTX), new_cum, self_k, self_v,
                anc_new, next_logits, new_tok, penult_new, ts_new,
                hist_tok, hist_par, i + 1)

    def init_state(self_k, self_v, logits0):
        return (
            jnp.full((B,), 4, jnp.int32),
            jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF)
            * jnp.ones((B, 1), jnp.float32),
            self_k, self_v, anc0, logits0,
            jnp.zeros((B, K), jnp.int32), jnp.zeros((B, K), jnp.int32),
            jnp.full((B, K), -1, jnp.int32),
            jnp.zeros((B, CTX, K), jnp.int32), jnp.zeros((B, CTX, K), jnp.int32),
            jnp.int32(0),
        )

    # ---- 1. real body under fori_loop ----
    @jax.jit
    def fori_real(params, self_k, self_v, cross_k, cross_v, logits0):
        def body(_, state):
            return real_body(state, params, cross_k, cross_v)

        out = jax.lax.fori_loop(
            0, STEPS, body, init_state(self_k, self_v, logits0)
        )
        return out[5]

    t1 = timeit(fori_real, params, self_k, self_v, cross_k, cross_v, logits0)
    print(f"real body, fori_loop: {t1*1e3:.1f} ms -> {t1/STEPS*1e3:.2f} ms/step")

    # ---- 2. new selection chain alone ----
    @jax.jit
    def selection_new(logits0):
        def body(i, carry):
            (cur_len, sum_lp, anc, last_tok, penult_tok, ts_max,
             hist_tok, hist_par, acc) = carry
            n_sampled = cur_len - 4
            logprobs = apply_logits_rules_logprobs_carried(
                (logits0 + acc).reshape(B * K, V),
                jnp.broadcast_to(n_sampled[:, None], (B, K)).reshape(B * K),
                last_tok.reshape(B * K),
                penult_tok.reshape(B * K),
                ts_max.reshape(B * K),
                meta, proc_opts,
            ).reshape(B, K, V)
            total = sum_lp[:, :, None] + logprobs
            cand_val, cand_idx = _exact_topk(total.reshape(B, K * V), 2 * K)
            cand_beam = cand_idx // V
            cand_tok = cand_idx % V
            is_eot = cand_tok == meta.eot
            keep = ~is_eot
            rank = jnp.cumsum(keep.astype(jnp.int32), axis=1)
            slot = jnp.where(keep & (rank <= K), rank - 1, K)
            new_beam = _scatter_slots(cand_beam, slot, K, 0)
            new_tok = _scatter_slots(cand_tok, slot, K, 0)
            new_cum = _scatter_slots(cand_val, slot, K, NEG_INF)
            write_pos = jnp.clip(cur_len, 0, CTX - 1)
            hit = (
                jax.lax.broadcasted_iota(jnp.int32, (1, CTX, 1), 1)
                == write_pos[:, None, None]
            )
            hist_tok = jnp.where(hit, new_tok[:, None, :], hist_tok)
            hist_par = jnp.where(hit, new_beam[:, None, :], hist_par)
            penult_new = _gather_rows(last_tok, new_beam)
            ts_prev = _gather_rows(ts_max, new_beam)
            ts_new = jnp.where(
                new_tok >= meta.timestamp_begin,
                jnp.maximum(ts_prev, new_tok), ts_prev,
            )
            anc_new = _gather_rows(anc, new_beam)
            anc_new = _write_column(
                anc_new, jnp.broadcast_to(write_pos[:, None], (B, K)),
                jnp.broadcast_to(jnp.arange(K)[None, :], (B, K)),
            )
            return (jnp.minimum(cur_len + 1, CTX), new_cum, anc_new, new_tok,
                    penult_new, ts_new, hist_tok, hist_par,
                    acc + 1e-6 * cand_val[0, 0])

        out = jax.lax.fori_loop(
            0, STEPS, body,
            (jnp.full((B,), 4, jnp.int32), jnp.zeros((B, K)), anc0,
             jnp.zeros((B, K), jnp.int32), jnp.zeros((B, K), jnp.int32),
             jnp.full((B, K), -1, jnp.int32),
             jnp.zeros((B, CTX, K), jnp.int32),
             jnp.zeros((B, CTX, K), jnp.int32), jnp.float32(0)),
        )
        return out[-1]

    t2 = timeit(selection_new, logits0)
    print(f"selection (new), alone: {t2*1e3:.1f} ms -> {t2/STEPS*1e3:.2f} ms/step")

    # ---- 3. same real body under while_loop with counter cond ----
    @jax.jit
    def while_real(params, self_k, self_v, cross_k, cross_v, logits0):
        def cond(state):
            return state[-1] < STEPS

        out = jax.lax.while_loop(
            cond,
            lambda s: real_body(s, params, cross_k, cross_v),
            init_state(self_k, self_v, logits0),
        )
        return out[5]

    t3 = timeit(while_real, params, self_k, self_v, cross_k, cross_v, logits0)
    print(f"real body, while_loop: {t3*1e3:.1f} ms -> {t3/STEPS*1e3:.2f} ms/step")




def variant4():
    """Append-on: full production body (finished pool + freezes) under
    (a) fori/counter and (b) while with the data-dependent any(~done) cond.
    Run via: PROF_VARIANT=4 python benchmarks/profile_loop2.py"""
    import functools

    from faster_whisper_tpu.generation.generate import beam_search, GenOptions

    config = CONFIGS[MODEL]
    params = random_params_device(config, seed=0, dtype="bfloat16")
    params = quantize_params(params)
    V = config.n_vocab
    meta = TokenMeta(
        eot=50257, timestamp_begin=50365, no_timestamps=50364,
        no_speech=50363, blank=(220,), vocab_size=V,
    )
    proc_opts = ProcessorOptions(
        suppress_blank=True, suppress_tokens=tuple(range(1, 40)),
        with_timestamps=True, max_initial_timestamp_index=50,
    )
    gen_opts = GenOptions(
        beam_size=K, num_finished=K, length_penalty=1.0, ctx_cap=CTX,
        kv_int8=True, fused_attn=True,
    )
    rng = np.random.default_rng(0)
    xa = jnp.asarray(
        rng.standard_normal((B, 1500, config.n_text_state)), jnp.bfloat16
    )
    prompt = np.zeros((B, P), np.int32)
    prompt[:, :4] = [50258, 50259, 50359, 50364]
    prompt_j = jnp.asarray(prompt)
    plen = jnp.asarray(np.full((B,), 4, np.int32))
    spos = jnp.asarray(np.zeros((B,), np.int32))

    # (b) production while_loop (any(~done) cond) — the real beam_search
    t = timeit(lambda: beam_search(
        params, config, gen_opts, proc_opts, meta, xa, prompt_j, plen, spos,
        jnp.asarray(P + STEPS, jnp.int32)))
    print(f"production beam_search (while, data cond): {t*1e3:.1f} ms "
          f"-> {(t - 0.0685)/STEPS*1e3:.2f} ms/step after one-time 68.5ms")

    # (a) identical math under a counter-bounded loop: beam_search with a
    # max_length that guarantees no row finishes early has the same body;
    # instead patch: run with F large so n_finished never reaches F and
    # cond stays data-dependent... so instead we monkeypatch while->fori.
    orig_while = jax.lax.while_loop

    def fori_shim(cond, body, state):
        def b(_, s):
            return body(s)
        return jax.lax.fori_loop(0, STEPS, b, state)

    jax.lax.while_loop = fori_shim
    try:
        bs2 = functools.partial(beam_search.__wrapped__, params, config,
                                gen_opts, proc_opts, meta)
        jit2 = jax.jit(lambda xa, p, pl, sp, ml: bs2(xa, p, pl, sp, ml))
        t2 = timeit(lambda: jit2(xa, prompt_j, plen, spos,
                                 jnp.asarray(P + STEPS, jnp.int32)))
    finally:
        jax.lax.while_loop = orig_while
    print(f"production body, fori/counter: {t2*1e3:.1f} ms "
          f"-> {(t2 - 0.0685)/STEPS*1e3:.2f} ms/step after one-time")


if os.environ.get("PROF_VARIANT") == "4":
    main = variant4


if __name__ == "__main__":
    main()
