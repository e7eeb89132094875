"""Per-component timing of the beam-search decode step at bench shapes.

Times, on the real chip (large-v3, int8 weights + int8 KV, B=8, K=5,
P=32, ctx=192 — the headline bench's decode configuration):

  1. the full beam_search program (per-step cost),
  2. the decoder step alone (model compute + cache read/write),
  3. the selection logic alone (logits rules, log_softmax, top-k,
     finished-pool and ancestry bookkeeping on dummy logits).

(2) + (3) ~ (1); the gap is fusion/latency overhead.  All loops run
in-jit (lax.fori_loop / while_loop) and sync with a scalar pull, because
single-op timings through a tunneled chip are meaningless.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.generation.generate import (
    GenOptions,
    _expand_caches,
    _gen_decoder_step,
    beam_search,
)
from faster_whisper_tpu.generation.processors import (
    NEG_INF,
    ProcessorOptions,
    TokenMeta,
)
from faster_whisper_tpu.models.config import CONFIGS
from faster_whisper_tpu.models.load import random_params_device
from faster_whisper_tpu.models.model import decoder_prefill
from faster_whisper_tpu.ops.quant import quantize_params

B = int(os.environ.get("PROF_B", "8"))
K = int(os.environ.get("PROF_K", "5"))
P = 32
CTX = int(os.environ.get("PROF_CTX", "192"))
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
    gen_opts = GenOptions(
        beam_size=K, num_finished=K, length_penalty=1.0, ctx_cap=CTX,
        kv_int8=True, fused_attn=True,  # the production TPU configuration
        cond_chunk=max(1, int(os.environ.get("FWT_COND_CHUNK", "1"))),
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
    prompt_len = np.full((B,), 4, np.int32)
    sot_pos = np.zeros((B,), np.int32)

    # ---- 1. full beam_search ----
    # max_length counts from the ACTUAL prompt length (4), not the padded
    # bucket P: the loop runs max_length - prompt_len iterations.  Rounds
    # 2-3 passed P + STEPS here, silently running P - 4 = 28 extra
    # iterations and reporting a phantom ~1.3-2 ms/step "loop residual"
    # (1102.7 ms / 128 = 8.6 "ms/step" when the loop really ran 156
    # iterations at 6.56 ms each + ~84 ms one-time prefill+expand).
    t = timeit(
        lambda: beam_search(
            params, config, gen_opts, proc_opts, meta, xa,
            jnp.asarray(prompt), jnp.asarray(prompt_len),
            jnp.asarray(sot_pos), jnp.asarray(4 + STEPS, jnp.int32),
        )
    )
    print(f"full beam_search ({STEPS} steps): {t*1e3:.1f} ms "
          f"-> {t/STEPS*1e3:.2f} ms/step (incl. one-time prefill+expand)")

    # ---- shared state for isolation runs ----
    gather = jnp.stack(
        [jnp.asarray(prompt_len - 1), jnp.asarray(sot_pos)], axis=1
    )
    first_logits, cache0 = decoder_prefill(
        params, config, jnp.asarray(prompt), jnp.asarray(prompt_len), xa,
        gather, ctx=CTX,
    )
    self_k, self_v, cross_k, cross_v = _expand_caches(cache0, K, True)
    anc = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, CTX)
    )

    # ---- 2. decoder step only, STEPS iterations in one jit ----
    # NB: params/caches MUST be jit arguments: closed-over arrays embed as
    # constants in the serialized HLO, and a ~2 GB proto wedges the
    # remote-compile relay.
    @jax.jit
    def decoder_only(params, self_k, self_v, cross_k, cross_v, anc):
        def body(i, carry):
            self_k, self_v, acc = carry
            tok = jnp.full((B, K), 100 + i, jnp.int32)
            pos = jnp.full((B, K), 4, jnp.int32) + i
            logits, self_k, self_v = _gen_decoder_step(
                params, config, tok, pos, pos[:, 0], self_k, self_v,
                cross_k, cross_v, anc, fused=True,
            )
            return self_k, self_v, acc + jnp.sum(logits[:, 0, :8])

        _, _, acc = jax.lax.fori_loop(
            0, STEPS, body, (self_k, self_v, jnp.float32(0))
        )
        return acc

    t2 = timeit(decoder_only, params, self_k, self_v, cross_k, cross_v, anc)
    print(f"decoder step only: {t2*1e3:.1f} ms -> {t2/STEPS*1e3:.2f} ms/step")

    # ---- 3. selection only ----
    tokens0 = jnp.zeros((B, K, CTX), jnp.int32).at[:, :, :P].set(
        jnp.asarray(prompt)[:, None, :]
    )
    logits0 = jnp.asarray(
        rng.standard_normal((B, K, V)), jnp.float32
    )

    @jax.jit
    def selection_only(tokens, logits):
        # the production selection ops: fused rules+log_softmax, exact
        # chunked top-k, scatter-free (masked-select) bookkeeping
        from faster_whisper_tpu.generation.generate import (
            _exact_topk, _gather_rows, _scatter_slots, _write_column,
        )
        from faster_whisper_tpu.generation.processors import (
            apply_logits_rules_logprobs,
        )

        pl = jnp.full((B,), 4, jnp.int32)
        fin_tokens = jnp.zeros((B, K, CTX), jnp.int32)
        fin_lens = jnp.zeros((B, K), jnp.int32)
        fin_scores = jnp.full((B, K), NEG_INF, jnp.float32)

        def body(i, carry):
            tokens, lens, sum_lp, fin_tokens, fin_lens, fin_scores, acc = carry
            flat_begin = jnp.broadcast_to(pl[:, None], (B, K)).reshape(B * K)
            logprobs = apply_logits_rules_logprobs(
                (logits + acc).reshape(B * K, V),
                tokens.reshape(B * K, CTX),
                lens.reshape(B * K),
                flat_begin, meta, proc_opts,
            ).reshape(B, K, V)
            total = sum_lp[:, :, None] + logprobs
            cand_val, cand_idx = _exact_topk(total.reshape(B, K * V), 2 * K)
            cand_beam = (cand_idx // V).astype(jnp.int32)
            cand_tok = (cand_idx % V).astype(jnp.int32)
            is_eot = cand_tok == meta.eot
            gen_len = _gather_rows(lens, cand_beam)
            norm = cand_val / jnp.maximum(gen_len, 1).astype(jnp.float32)
            eot_scores = jnp.where(is_eot, norm, NEG_INF)
            all_scores = jnp.concatenate([fin_scores, eot_scores], axis=1)
            cand_buf = _gather_rows(tokens, cand_beam)
            all_bufs = jnp.concatenate([fin_tokens, cand_buf], axis=1)
            all_lens = jnp.concatenate(
                [fin_lens, _gather_rows(lens, cand_beam)], axis=1
            )
            top_scores, top_idx = jax.lax.top_k(all_scores, K)
            fin_tokens2 = _gather_rows(all_bufs, top_idx)
            fin_lens2 = _gather_rows(all_lens, top_idx)
            keep = ~is_eot
            rank = jnp.cumsum(keep.astype(jnp.int32), axis=1)
            slot = jnp.where(keep & (rank <= K), rank - 1, K)
            new_beam = _scatter_slots(cand_beam, slot, K, 0)
            new_tok = _scatter_slots(cand_tok, slot, K, 0)
            new_cum = _scatter_slots(cand_val, slot, K, NEG_INF)
            tokens2 = _gather_rows(tokens, new_beam)
            lens2 = _gather_rows(lens, new_beam)
            wp = jnp.clip(lens2, 0, CTX - 1)
            tokens2 = _write_column(tokens2, wp, new_tok)
            return (
                tokens2, jnp.minimum(lens2 + 1, CTX), new_cum, fin_tokens2,
                fin_lens2, top_scores,
                acc + jnp.float32(1e-6) * cand_val[0, 0],
            )

        out = jax.lax.fori_loop(
            0, STEPS, body,
            (tokens0, jnp.full((B, K), 4, jnp.int32), jnp.zeros((B, K)),
             fin_tokens, fin_lens, fin_scores, jnp.float32(0)),
        )
        return out[-1]

    t3 = timeit(selection_only, tokens0, logits0)
    print(f"selection only: {t3*1e3:.1f} ms -> {t3/STEPS*1e3:.2f} ms/step")
    print(f"sum(2+3) = {(t2+t3)/STEPS*1e3:.2f} ms/step vs full "
          f"{t/STEPS*1e3:.2f}")


if __name__ == "__main__":
    main()
