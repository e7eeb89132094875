"""On-device Whisper generation: beam search and temperature sampling.

TPU-native replacement for ``ctranslate2.models.Whisper.generate``
(consumed by the reference at faster_whisper/transcribe.py:1446-1459 and
:222-236).  The whole decode loop — KV-cached decoder steps, the logits-rule
chain, beam bookkeeping, finished-hypothesis pools — runs inside a single
``lax.while_loop`` per call; the host only pads prompts and unpacks results.

Score semantics match what the reference's policy layer expects
(transcribe.py:1463-1466): ``score = cum_logprob / (gen_len ** length_penalty)``
where ``cum_logprob`` sums T=1 log-softmax probabilities of the sampled
tokens *including* the closing <|endoftext|> and ``gen_len`` *excludes* it,
so ``avg_logprob = score * gen_len**lp / (gen_len + 1)`` reproduces
openai/CT2 numbers.

Layout decisions (TPU-first):
  * Beams live on a (B, K) grid.  Cross-attention K/V over the 1500 encoder
    states is computed once per window and *shared* across beams (queries
    broadcast against it), so beam search does not tile the big cross cache.
  * The per-beam self-attention cache is head-major (L, B, H, K, ctx, D)
    and is append-only per slot: beam re-parenting permutes a (B, K, ctx)
    ancestry table and self-attention masks across slots, so the cache is
    never physically reordered (its full-cache read+write was the
    dominant beam overhead).  Optional int8 K/V storage halves the
    per-step cache read.  On TPU the append+attend runs as one fused
    Pallas kernel with the cache aliased in place (ops/beam_attention.py).
  * Prompts are right-padded to a bucketed length; positions/masks carry the
    true lengths.  One compiled program per (B, K, prompt-bucket, flags).
"""

import functools

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.generation.processors import (
    NEG_INF,
    ProcessorOptions,
    TokenMeta,
    apply_logits_rules_logprobs,
    apply_logits_rules_logprobs_carried,
)
from faster_whisper_tpu.ops.beam_attention import (
    beam_attend_append,
    beam_attend_append_xla,
    cross_attend,
)
from faster_whisper_tpu.ops.quant import (
    QuantizedLinear,
    QuantKV,
    quantize_kv,
)
from faster_whisper_tpu.models.config import WhisperConfig
from faster_whisper_tpu.models.model import (
    KVCache,
    _dense,
    _merge_heads,
    _mlp,
    _split_heads,
    decoder_prefill,
    init_cache,
    layer_norm,
)


# ---------------------------------------------------------------------------
# Static options
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GenOptions:
    beam_size: int = 5  # active beams (or parallel samples when sampling)
    num_finished: int = 5  # finished-pool slots: round(beam_size * patience)
    length_penalty: float = 1.0
    sampling: bool = False
    # NOTE: the sampling temperature is NOT here on purpose — it is a
    # traced per-row (B,) argument of ``sample`` so one compiled program
    # serves every fallback rung (the reference pays zero per rung because
    # CT2 runs one C++ program; baking the float into the jit cache key
    # would cost a ~35 s compile per temperature instead).
    sampling_topk: int = 0  # 0 = unrestricted
    # Static cache/buffer length: a bucketed bound on max_length.  Sizing
    # the KV cache by the actual decode budget instead of the model's full
    # 448 context cuts the dominant HBM allocation proportionally.  With
    # fused_attn the Pallas kernel windows writes in 8-slot sublanes, so
    # ctx_cap should be a multiple of 8 (dispatch buckets to 64; unaligned
    # values additionally disable the ctx ladder — see _ctx_phases).
    ctx_cap: int = 448
    # int8 K/V caches (self + cross) with per-(position, head) scales:
    # halves the decode loop's dominant HBM term.  Enabled for int8
    # compute types (the user already opted into quantization).
    kv_int8: bool = False
    # Fused Pallas append+attend kernel for the decode self-attention
    # (ops/beam_attention.py).  On by default on a single TPU chip; the
    # pure-XLA reference runs on CPU and under multi-device meshes.
    fused_attn: bool = False
    # Steps per early-exit check: an inner fori_loop of ``cond_chunk``
    # steps amortizes the data-dependent ``any(~done)`` cond.  Measured
    # on v5e the cond is already free (~0.1 ms/iteration; the suspected
    # "loop residual" was a profiler iteration-miscount — see
    # benchmarks/README.md profile_step row), so the default stays 1 and
    # chunking trades ≤chunk-1 output-neutral frozen iterations per call
    # for nothing.  Kept as a tuning knob for other topologies.
    cond_chunk: int = 1
    # Laddered (two-phase) ctx decode: run the early beam-loop steps on a
    # small self-KV cache (64 slots, doubling as positions fill) before
    # switching to the full ctx_cap table — the self-KV read scales with
    # the table size and is ~25% of the step's HBM traffic.  Each ladder
    # rung is its own lax.while_loop inside one jitted program; carried
    # state is zero-padded between rungs (_grow_ctx).  Output-identical
    # to the single-phase loop: attention and the rule chain mask every
    # position >= cur_len.  Default on; generate_dispatch additionally
    # honors FWT_MULTI_PHASE=0 to disable (see _multi_phase_default).
    multi_phase: bool = True
    # 4-bit decoder weights (compute_type="int4"): params must arrive
    # quantized by ops/quant.py::quantize_params_int4 (values in [-7, 7],
    # int8 storage — S4 arrays cannot cross the jit dispatch boundary on
    # all runtimes), and the program converts them ONCE to packed int4
    # HBM temps (_pack_int4_weights) so every decode step streams half
    # the weight bytes.  The storage change is numerically a no-op: the
    # values are identical in s8 and s4 and the MXU dot is exact in
    # int32 either way (pinned by tests/test_int4.py).
    w_int4: bool = False
    # 4-bit cross-attention K/V: quantize the shared (L, B, H, T, D)
    # cross cache to |q| <= cross_kv_qmax and, when cross_kv_s4, store it
    # as packed int4 — the cross sweep is the decode step's largest
    # single HBM stream (~0.98 GB/step at the bench shapes in int8).
    # Requires kv_int8 (the int4 cache rides the QuantKV scale path);
    # the self cache stays int8 (the fused Pallas append kernel aliases
    # 8-slot sublane windows in place, which packed nibbles can't honor).
    cross_kv_qmax: int = 127
    cross_kv_s4: bool = False


class WhisperGenerationResult:
    """Mirror of ctranslate2's WhisperGenerationResult surface
    (reference reads .sequences_ids, .scores, .no_speech_prob,
    transcribe.py:1461-1466, :241-249)."""

    __slots__ = ("sequences_ids", "scores", "no_speech_prob")

    def __init__(self, sequences_ids, scores, no_speech_prob):
        self.sequences_ids = sequences_ids
        self.scores = scores
        self.no_speech_prob = no_speech_prob

    def __repr__(self):
        return (
            f"WhisperGenerationResult(sequences={len(self.sequences_ids)}, "
            f"scores={self.scores}, no_speech_prob={self.no_speech_prob})"
        )


# ---------------------------------------------------------------------------
# Beam-grid decoder step (queries on a (B, K) grid, shared cross K/V)
# ---------------------------------------------------------------------------


def _gen_decoder_step(
    params,
    config: WhisperConfig,
    token: jax.Array,  # (B, K) token ids
    pos: jax.Array,  # (B, K) absolute positions
    pos_row: jax.Array,  # (B,) per-row write position (pos of active beams)
    self_k: jax.Array,  # (L, B, H, K, ctx, D), head-major
    self_v: jax.Array,
    cross_k: jax.Array,  # (L, B, H, T, D) shared across beams
    cross_v: jax.Array,
    anc: jax.Array,  # (B, K, ctx) ancestry slot map (identity when sampling)
    fused: bool = False,  # static: use the Pallas fused attention kernel
):
    """One decode step over the beam grid.

    Layers run under a fori_loop with the KV cache carried whole: a
    lax.scan with the cache as xs/ys restacks (i.e. fully copies) both
    cache tensors every step, which doubles the step's HBM traffic at
    large model sizes.

    Beam re-parenting is virtual: the K/V written at position c for the
    chain now owned by beam k live in slot ``anc[b, k, c]``, and
    self-attention attends over ALL K slots with an ancestry mask instead
    of a physically reordered cache (the reorder's full-cache read+write
    was the dominant beam-search overhead).  The sampling path passes the
    identity ancestry.

    The append-then-attend itself runs as a fused Pallas kernel on TPU
    (``fused=True``; ops/beam_attention.py — any cache write expressed in
    plain XLA breaks the softmax-chain fusion and costs ~3x the step's
    HBM floor) and as the numerically-identical XLA reference elsewhere.
    """
    dec = params["decoder"]
    b, k = token.shape
    n_head = config.n_text_head
    dh = config.n_text_state // n_head
    quant = isinstance(self_k, QuantKV)
    L = (self_k.q if quant else self_k).shape[0]
    scale = dh ** -0.5
    dtype = dec["token_embed"].dtype

    x0 = dec["token_embed"][token] + dec["pos_embed"][pos]
    x0 = x0.astype(dtype)  # (B, K, d)

    def take(w, i):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False), w
        )

    layers = dec["layers"]
    attend = beam_attend_append if fused else functools.partial(
        beam_attend_append_xla, pos_bk=pos
    )

    def body(i, carry):
        x, self_k, self_v = carry
        p = take(layers, i)

        # self attention over the per-beam cache (fused append + attend)
        h = layer_norm(x, p["ln1_g"], p["ln1_b"])
        sa = p["self_attn"]
        q = _dense(h, sa["wq"], sa["bq"]).reshape(b, k, n_head, dh)
        k_new = _dense(h, sa["wk"]).reshape(b, k, n_head, dh)
        v_new = _dense(h, sa["wv"], sa["bv"]).reshape(b, k, n_head, dh)
        attn_h, self_k, self_v = attend(
            i,
            pos_row,
            q.transpose(0, 2, 1, 3).astype(dtype),
            k_new.transpose(0, 2, 1, 3).astype(dtype),
            v_new.transpose(0, 2, 1, 3).astype(dtype),
            self_k,
            self_v,
            anc,
        )
        attn = attn_h.transpose(0, 2, 1, 3).reshape(b, k, -1)
        x = x + _dense(attn, sa["wo"], sa["bo"])

        # cross attention: beams are independent queries over shared K/V
        # (head-major (L, B, H, T, D) cache).  The Pallas cross kernel
        # (incl. its T-blocked flash variant, FWT_CROSS_TB) is opt-in via
        # FWT_FUSED_CROSS=1: XLA wins on v5e — per-layer pallas_call
        # boundaries lose the cross-layer pipelining XLA gets (measured
        # rows in benchmarks/README.md, profile_cross.py).
        h = layer_norm(x, p["ln2_g"], p["ln2_b"])
        cp = p["cross_attn"]
        qx = _dense(h, cp["wq"], cp["bq"]).reshape(b, k, n_head, dh)
        cross_is_s4 = quant and cross_k.q.dtype == jnp.int4
        if fused and _fused_cross_enabled() and not cross_is_s4:
            attn_h = cross_attend(
                i, qx.transpose(0, 2, 1, 3).astype(dtype), cross_k, cross_v
            )
            attn = attn_h.transpose(0, 2, 1, 3).reshape(b, k, -1)
        else:
            if quant:
                ck = jax.lax.dynamic_index_in_dim(cross_k.q, i, 0, keepdims=False)
                cv = jax.lax.dynamic_index_in_dim(cross_v.q, i, 0, keepdims=False)
                cks = jax.lax.dynamic_index_in_dim(cross_k.s, i, 0, keepdims=False)
                cvs = jax.lax.dynamic_index_in_dim(cross_v.s, i, 0, keepdims=False)
                ck, cv = ck.astype(dtype), cv.astype(dtype)
            else:
                ck = jax.lax.dynamic_index_in_dim(cross_k, i, 0, keepdims=False)
                cv = jax.lax.dynamic_index_in_dim(cross_v, i, 0, keepdims=False)
            scores = (
                jnp.einsum(
                    "bkhd,bhtd->bkht", qx, ck, preferred_element_type=jnp.float32
                )
                * scale
            )
            if quant:  # cks: (B, H, 1, T) -> (B, 1, H, T)
                scores = scores * jnp.swapaxes(cks, 1, 2)
            w = jax.nn.softmax(scores, axis=-1)
            if quant:
                w = (w * jnp.swapaxes(cvs, 1, 2)).astype(dtype)
            else:
                w = w.astype(cv.dtype)
            attn = jnp.einsum("bkht,bhtd->bkhd", w, cv).reshape(b, k, -1)
        x = x + _dense(attn, cp["wo"], cp["bo"])

        h = layer_norm(x, p["ln3_g"], p["ln3_b"])
        x = x + _mlp(p["mlp"], h)
        return x, self_k, self_v

    x, new_sk, new_sv = jax.lax.fori_loop(0, L, body, (x0, self_k, self_v))
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    from faster_whisper_tpu.models.model import _logits

    logits = _logits(params, x)  # (B, K, V) f32
    return logits, new_sk, new_sv


def _exact_topk(x: jax.Array, k: int, chunk: int = 512):
    """Exact top-k over the last axis via chunk-max prefiltering.

    ``lax.top_k`` over the (B, K*V ~ 260k) beam-candidate row measures
    2.6 ms/call on v5e — a third of the whole decode step; a two-stage
    select (per-chunk max -> top-k chunks -> top-k of their union) is
    ~16x faster and EXACT: if a value v is in the global top-k but its
    chunk were not among the top-k chunks, then k chunk-maxima (each a
    distinct element) would exceed v, contradicting v's rank.  Returned
    values are sorted descending; tie-breaking between equal values may
    pick different indices than lax.top_k (irrelevant for beam search —
    equal-score candidates are interchangeable).
    """
    b, n = x.shape
    if n <= k * chunk:  # prefiltering cannot pay for itself
        return jax.lax.top_k(x, k)
    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=NEG_INF)
    nc = x.shape[1] // chunk
    y = x.reshape(b, nc, chunk)
    _, ci = jax.lax.top_k(jnp.max(y, axis=-1), k)  # (B, k) chunk ids
    rows = jnp.take_along_axis(y, ci[:, :, None], axis=1).reshape(b, k * chunk)
    v, j = jax.lax.top_k(rows, k)
    orig = jnp.take_along_axis(ci, j // chunk, axis=1) * chunk + (j % chunk)
    return v, orig


def _gather_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """``take_along_axis(x, idx, axis=1)`` as a static unroll of masked
    selects.  x (B, J, ...), idx (B, K) -> (B, K, ...).

    TPU lowers small dynamic gathers/scatters inside the decode loop to
    serialized ops costing ~100s of us each (the beam bookkeeping was
    ~1.7 ms/step of the 8.5 ms step); J here is tiny (<= F + 2K), so J
    masked selects on the VPU are far cheaper — and integer-exact, unlike
    a one-hot matmul under bf16-rounding matmul defaults."""
    j_dim = x.shape[1]
    out = jnp.zeros(x.shape[:1] + (idx.shape[1],) + x.shape[2:], x.dtype)
    for j in range(j_dim):
        sel = idx == j  # (B, K)
        sel = sel.reshape(sel.shape + (1,) * (x.ndim - 2))
        out = jnp.where(sel, x[:, j : j + 1], out)
    return out


def _write_column(x: jax.Array, pos: jax.Array, val: jax.Array) -> jax.Array:
    """Write val (B, K) at column pos (B, K) of x (B, K, C) — a masked
    select instead of a scatter."""
    c = x.shape[2]
    hit = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2) == pos[:, :, None]
    return jnp.where(hit, val[:, :, None], x)


def _scatter_slots(
    cand: jax.Array, slot: jax.Array, k_out: int, fill
) -> jax.Array:
    """out[b, s] = cand[b, j] where slot[b, j] == s for s < k_out; slots
    never hit keep ``fill``; slot values >= k_out are dropped.  Static
    unroll over the (tiny) candidate axis — see _gather_rows."""
    out = jnp.full((cand.shape[0], k_out), fill, cand.dtype)
    s_ids = jnp.arange(k_out, dtype=slot.dtype)[None, :]
    for j in range(cand.shape[1]):
        hit = slot[:, j][:, None] == s_ids
        out = jnp.where(hit, cand[:, j][:, None], out)
    return out


def _needs_history(opts: ProcessorOptions) -> bool:
    """Static: do the logits rules need the full sampled-token buffer?"""
    return opts.repetition_penalty != 1.0 or opts.no_repeat_ngram_size > 0


def _tokens_view(hist_tok: jax.Array, anc: jax.Array) -> jax.Array:
    """Reconstruct the (B, K, ctx) per-beam sampled-token view from the
    position-history table and the ancestry map.

    ``hist_tok[b, c, j]`` is the token slot j appended at position c, and
    ``anc[b, k, c]`` names the slot whose write at position c belongs to
    the chain now owned by beam k — so the chain's token at c is
    ``hist_tok[b, c, anc[b, k, c]]``.  Unrolled masked selects over the
    (tiny) slot axis; positions outside the sampled window come out as
    whatever slot 0 wrote there (the rule chain masks them)."""
    b, ctx, k_slots = hist_tok.shape
    ht = jnp.swapaxes(hist_tok, 1, 2)  # (B, K, ctx), slot-major
    out = jnp.zeros(anc.shape, jnp.int32)
    for j in range(k_slots):
        out = jnp.where(anc == j, ht[:, j : j + 1, :], out)
    return out


def _expand_caches(
    cache0, K: int, kv_int8: bool, cross_qmax: int = 127,
    cross_s4: bool = False,
):
    """Broadcast the prefill cache to the (B, K) beam grid, optionally
    quantizing both the self and cross K/V to int8 (the decode loop's
    dominant HBM read is these caches; int8 halves it).

    The self cache is head-major: values (L, B, H, ctx, D) ->
    (L, B, H, K, ctx, D) and int8 scales (L, B, H, ctx) ->
    (L, B, H, K, ctx), both with the beam axis inserted before ctx
    (models/model.py::KVCache, ops/beam_attention.py).

    ``cross_qmax=7`` + ``cross_s4`` (compute_type="int4") stores the
    shared cross K/V as packed int4: the while_loop body closes over
    these arrays, so XLA materializes the packed tensors once per call
    and every step's cross sweep reads half the bytes (the int4 -> bf16
    upcast fuses into the attention dot's operand read)."""

    def bcast(a):  # (L, B, H, ...) -> (L, B, H, K, ...)
        return jnp.broadcast_to(
            a[:, :, :, None], a.shape[:3] + (K,) + a.shape[3:]
        )

    if kv_int8:
        # scales stored bf16: they are 38% of the decode kernel's reads
        # at f32, and their rounding (~0.4%) is below the int8 noise
        sdt = jnp.bfloat16
        skq, svq = quantize_kv(cache0.self_k), quantize_kv(cache0.self_v)
        self_k = QuantKV(bcast(skq.q), bcast(skq.s.astype(sdt)))
        self_v = QuantKV(bcast(svq.q), bcast(svq.s.astype(sdt)))
        # cross scales carry a unit axis -> (L, B, H, 1, T): the fused
        # kernel's tile-legal block shape, materialized once per window
        # instead of per layer call
        ckq = quantize_kv(cache0.cross_k, qmax=cross_qmax)
        cvq = quantize_kv(cache0.cross_v, qmax=cross_qmax)
        ckq_q, cvq_q = ckq.q, cvq.q
        if cross_s4:
            ckq_q = jax.lax.optimization_barrier(ckq_q.astype(jnp.int4))
            cvq_q = jax.lax.optimization_barrier(cvq_q.astype(jnp.int4))
        cross_k = QuantKV(ckq_q, ckq.s.astype(sdt)[:, :, :, None])
        cross_v = QuantKV(cvq_q, cvq.s.astype(sdt)[:, :, :, None])
    else:
        self_k, self_v = bcast(cache0.self_k), bcast(cache0.self_v)
        cross_k, cross_v = cache0.cross_k, cache0.cross_v
    return self_k, self_v, cross_k, cross_v


def _pack_int4_weights(params):
    """Convert the decoder's QuantizedLinear weights (4-bit-range values
    stored int8 by quantize_params_int4) to packed int4 HBM temps, ONCE
    per program.  S4 arrays cannot cross the jit dispatch boundary on
    all runtimes (the axon relay rejects them), so the conversion lives
    in-program; the optimization_barrier stops XLA from fusing the
    upcast back into every step's reads (which would re-stream the s8
    argument instead of the half-width packed copy).  Exact: every value
    fits int4, so the s8->s4 cast and the MXU's mixed s8 x s4 -> s32
    dot are lossless (tests/test_int4.py pins bit-equality)."""

    def to4(ql):
        # The clip is free (it fuses into the one-time pack conversion)
        # and turns a misuse — int8-range params reaching the int4 path,
        # where astype alone would wrap values modulo 16 — into bounded
        # saturation; WhisperEngine(int4=True) additionally validates the
        # range eagerly at construction.
        return QuantizedLinear(
            q=jax.lax.optimization_barrier(
                jnp.clip(ql.q, -7, 7).astype(jnp.int4)
            ),
            s=ql.s,
        )

    layers = dict(params["decoder"]["layers"])
    for sec in ("self_attn", "cross_attn", "mlp"):
        d = dict(layers[sec])
        for name, v in d.items():
            if isinstance(v, QuantizedLinear):
                d[name] = to4(v)
        layers[sec] = d
    dec = dict(params["decoder"])
    dec["layers"] = layers
    if isinstance(dec.get("logits_w"), QuantizedLinear):
        dec["logits_w"] = to4(dec["logits_w"])
    out = dict(params)
    out["decoder"] = dec
    return out


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("config", "gen_opts", "proc_opts", "meta")
)
def beam_search(
    params,
    config: WhisperConfig,
    gen_opts: GenOptions,
    proc_opts: ProcessorOptions,
    meta: TokenMeta,
    xa: jax.Array,  # (B, T, d) encoder states
    prompt: jax.Array,  # (B, P) right-padded prompt
    prompt_len: jax.Array,  # (B,)
    sot_pos: jax.Array,  # (B,) index of <|startoftranscript|> in the prompt
    max_length: jax.Array,  # scalar: total length cap (prompt + generated)
):
    """Backpointer beam search: the loop never materializes per-beam token
    buffers.  Tokens are recorded once per step in a position-history pair
    ``hist_tok``/``hist_par`` (B, ctx, K) — token appended by each slot and
    the slot its prefix lived in — and sequences are reconstructed on the
    host by walking the backpointers (``_backtrack``).  The finished pool
    is three (B, F) vectors (score, end length, slot): an eot candidate is
    fully identified by where and in which slot it ended, because history
    columns are append-only and never rewritten.  The pool itself is
    merged ONCE after the loop from step-indexed candidate buffers; the
    loop carries only an exact occupancy counter (see the body's
    finished-pool comment) — the in-loop merge measured ~1.7 ms/step of
    scheduler interference (benchmarks/README.md, profile_step.py row).

    The logits rules run from carried (B, K) scalars (last token, the one
    before it, max sampled timestamp) — see
    ``apply_logits_rules_logprobs_carried``; policy options that need real
    history (repetition penalty, no-repeat-ngram) reconstruct the token
    view from the history + ancestry tables per step instead
    (``_tokens_view``), keeping one code path.

    All beams of a row share one length (they advance in lockstep), so
    lengths are carried as a single (B,) ``cur_len``.

    Returns (hist_tok (B,ctx,K), hist_par (B,ctx,K), fin_slot (B,F),
    fin_lens (B,F), fin_scores (B,F), cur_len (B,), active_score (B,),
    no_speech_prob (B,), prompt_len (B,))."""
    K = gen_opts.beam_size
    F = gen_opts.num_finished
    lp_pow = gen_opts.length_penalty
    b, p = prompt.shape
    if gen_opts.w_int4:
        params = _pack_int4_weights(params)
    # Laddered ctx decode: the loop below runs once per ladder rung, on a
    # KV table of phases[i] slots; ``ctx`` (the FULL logical table, what
    # the single-phase loop used everywhere) keeps sizing the post-loop
    # merge and the length caps, while in-body table shapes come from the
    # carried arrays so one body serves every rung.
    ctx = min(gen_opts.ctx_cap, config.n_text_ctx)
    phases = _ctx_phases(p, ctx, gen_opts)
    ctx0 = phases[0]
    V = meta.vocab_size
    needs_history = _needs_history(proc_opts)

    gather_pos = jnp.stack([prompt_len - 1, sot_pos], axis=1)
    first_logits, cache0 = decoder_prefill(
        params, config, prompt, prompt_len, xa, gather_pos, ctx=ctx0
    )
    no_speech_prob = jax.nn.softmax(first_logits[:, 1], axis=-1)[:, meta.no_speech]

    cur_len = prompt_len  # (B,) shared by all beams of a row
    sum_lp = jnp.where(
        jnp.arange(K)[None, :] == 0, 0.0, NEG_INF
    ) * jnp.ones((b, 1), jnp.float32)

    self_k, self_v, cross_k, cross_v = _expand_caches(
        cache0, K, gen_opts.kv_int8,
        cross_qmax=gen_opts.cross_kv_qmax, cross_s4=gen_opts.cross_kv_s4,
    )

    # Ancestry slot map: anc[b, k, c] = beam slot holding the K/V written at
    # position c for the chain currently owned by beam k.  Re-parenting
    # permutes this (B, K, ctx) int32 table instead of the (L, B, K, ctx, H,
    # D) cache itself — the physical cache is append-only per slot.
    anc = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None], (b, K, ctx0))

    cur_logits = jnp.broadcast_to(first_logits[:, 0][:, None, :], (b, K, V))

    hist_tok = jnp.zeros((b, ctx0, K), jnp.int32)
    hist_par = jnp.zeros((b, ctx0, K), jnp.int32)
    # carried rule scalars (see apply_logits_rules_logprobs_carried)
    last_tok = jnp.zeros((b, K), jnp.int32)
    penult_tok = jnp.zeros((b, K), jnp.int32)
    ts_max = jnp.full((b, K), -1, jnp.int32)

    # step-indexed eot-candidate buffers; merged into the (B, F) pool
    # once, after the loop (see the body's finished-pool comment)
    eot_buf_score = jnp.full((b, ctx0, 2 * K), NEG_INF, jnp.float32)
    eot_buf_slot = jnp.zeros((b, ctx0, 2 * K), jnp.int32)
    len_buf = jnp.zeros((b, ctx0), jnp.int32)
    nfin = jnp.zeros((b,), jnp.int32)

    # The loop cond reads a ONE-ITERATION-LAGGED done: the stopping vector
    # computed by iteration i sits at the end of that iteration's longest
    # dependency chain (decoder -> rules -> top-k -> pool), so a cond on it
    # stalls the loop branch until the whole chain drains (~1.1 ms/step
    # measured on v5e — benchmarks/profile_loop2.py).  Reading the
    # previous iteration's done instead resolves the branch at iteration
    # START; the loop runs exactly one extra all-frozen iteration, which
    # is output-neutral (every carried output is gated by the CURRENT
    # done inside the body).
    if gen_opts.cond_chunk > 1:
        # Chunked: the cond runs once per chunk, so its stall is already
        # amortized — read the TRUE done and exit exactly at the chunk
        # containing convergence (the lagged read would always run one
        # full extra chunk).
        def cond(state):
            return jnp.any(~state[_BEAM_DONE])
    else:
        def cond(state):
            return jnp.any(~state[_BEAM_DONE_LAG])

    def body(state):
        (cur_len, sum_lp, self_k, self_v, anc, cur_logits,
         last_tok, penult_tok, ts_max, hist_tok, hist_par,
         eot_buf_score, eot_buf_slot, len_buf, nfin, step_i,
         done, _done_lag) = state
        # current ladder rung's table size (== ctx on the final rung)
        ctx_tab = hist_tok.shape[1]

        n_sampled = cur_len - prompt_len  # (B,)
        if needs_history:
            view = _tokens_view(hist_tok, anc)
            logprobs = apply_logits_rules_logprobs(
                cur_logits.reshape(b * K, V),
                view.reshape(b * K, ctx_tab),
                jnp.broadcast_to(cur_len[:, None], (b, K)).reshape(b * K),
                jnp.broadcast_to(prompt_len[:, None], (b, K)).reshape(b * K),
                meta,
                proc_opts,
            ).reshape(b, K, V)
        else:
            logprobs = apply_logits_rules_logprobs_carried(
                cur_logits.reshape(b * K, V),
                jnp.broadcast_to(n_sampled[:, None], (b, K)).reshape(b * K),
                last_tok.reshape(b * K),
                penult_tok.reshape(b * K),
                ts_max.reshape(b * K),
                meta,
                proc_opts,
            ).reshape(b, K, V)

        total = sum_lp[:, :, None] + logprobs  # (B, K, V)
        cand_val, cand_idx = _exact_topk(total.reshape(b, K * V), 2 * K)
        cand_beam = cand_idx // V  # (B, 2K)
        cand_tok = cand_idx % V
        is_eot = cand_tok == meta.eot

        # ---- finished pool: RECORD eot candidates, merge after the loop.
        # The in-loop merge (concat + top_k + gathers feeding the carried
        # pool and, through n_finished, the done vector) measured ~1.7
        # ms/step of scheduler interference (profile_step.py ablation).
        # Instead each step writes its 2K candidates into step-indexed
        # buffers — same masked-column pattern as the history tables —
        # and the pool is ONE top_k over (B, ctx*2K) post-loop.  Stopping
        # stays exact without the pool: until it holds F entries every
        # valid eot candidate occupies a free slot, and once full the
        # count stays F, so ``min(F, nfin + #valid)`` IS the merged
        # pool's occupancy, step for step.
        safe_len = jnp.maximum(n_sampled, 1).astype(jnp.float32)[:, None]
        norm_score = cand_val / (safe_len ** lp_pow)
        eot_valid = is_eot & ~done[:, None]  # (B, 2K)
        eot_scores = jnp.where(eot_valid, norm_score, NEG_INF)

        hit_step = (
            jax.lax.broadcasted_iota(jnp.int32, (1, ctx_tab, 1), 1) == step_i
        ) & ~done[:, None, None]
        eot_buf_score = jnp.where(hit_step, eot_scores[:, None, :], eot_buf_score)
        eot_buf_slot = jnp.where(hit_step, cand_beam[:, None, :], eot_buf_slot)
        len_buf = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (1, ctx_tab), 1) == step_i)
            & ~done[:, None],
            cur_len[:, None], len_buf,
        )
        nfin = jnp.minimum(F, nfin + jnp.sum(eot_valid, axis=1))

        # ---- refill active beams with the best K non-eot candidates ----
        keep = ~is_eot
        rank = jnp.cumsum(keep.astype(jnp.int32), axis=1)  # 1-based among kept
        slot = jnp.where(keep & (rank <= K), rank - 1, K)  # K = drop
        # slot-scatter candidates into K slots (order-preserving =>
        # score-sorted; unrolled masked selects, no scatter lowering)
        new_beam = _scatter_slots(cand_beam, slot, K, 0)
        new_tok = _scatter_slots(cand_tok, slot, K, 0)
        new_cum = _scatter_slots(cand_val, slot, K, NEG_INF)

        # ---- record the step in the history tables ----
        parent = new_beam  # (B, K)
        write_pos = jnp.clip(cur_len, 0, ctx_tab - 1)  # (B,)
        hit = (
            jax.lax.broadcasted_iota(jnp.int32, (1, ctx_tab, 1), 1)
            == write_pos[:, None, None]
        ) & ~done[:, None, None]  # done rows must not corrupt history
        hist_tok = jnp.where(hit, new_tok[:, None, :], hist_tok)
        hist_par = jnp.where(hit, parent[:, None, :], hist_par)

        # carried rule scalars follow the re-parenting
        penult_new = _gather_rows(last_tok, parent)
        ts_prev = _gather_rows(ts_max, parent)
        ts_new = jnp.where(
            new_tok >= meta.timestamp_begin,
            jnp.maximum(ts_prev, new_tok),
            ts_prev,
        )

        # Virtual cache re-parenting: permute only the (B, K, ctx) ancestry
        # table; the new token's K/V will be written to this beam's own
        # slot by the decoder step below.
        k_arange = jnp.arange(K)[None, :]
        write_pos_bk = jnp.broadcast_to(write_pos[:, None], (b, K))
        anc_new = _gather_rows(anc, parent)
        anc_new = _write_column(
            anc_new, write_pos_bk, jnp.broadcast_to(k_arange, (b, K))
        )

        # ---- next decoder step ----
        # Dispatched from the UNFROZEN selection results: ``done`` gates
        # only the carried outputs below, never the decoder inputs, so the
        # scheduler can issue the step's first weight/cache streams without
        # waiting on the stopping logic.  Done rows decode garbage tokens
        # at a frozen position — harmless: their cache/ancestry slots and
        # logits are never read again (the finished pool and the frozen
        # carry already hold their outputs, and their history writes are
        # masked off above).
        next_logits, self_k_new, self_v_new = _gen_decoder_step(
            params, config, new_tok, write_pos_bk,
            write_pos, self_k, self_v, cross_k, cross_v, anc_new,
            fused=gen_opts.fused_attn,
        )

        # ---- stopping ----
        cur_len_new = jnp.minimum(cur_len + 1, ctx)
        hit_cap = cur_len_new >= jnp.minimum(max_length, ctx)
        done_new = done | (nfin >= F) | hit_cap

        # frozen rows keep their previous carried state (caches and
        # ancestry need no freeze: slots are append-only and done rows'
        # outputs are already snapshotted)
        cur_len_new = jnp.where(done, cur_len, cur_len_new)
        new_cum = jnp.where(done[:, None], sum_lp, new_cum)

        return (
            cur_len_new, new_cum, self_k_new, self_v_new, anc_new,
            next_logits, new_tok, penult_new, ts_new, hist_tok, hist_par,
            eot_buf_score, eot_buf_slot, len_buf, nfin, step_i + 1,
            done_new, done,
        )

    # NB the rounds-2-3 hunt for a ~1.3-2 ms/step "loop residual" —
    # body unrolling, pool-top_k replacement, cond chunking, lagged
    # conds, and the post-loop pool merge above — ended when the
    # residual turned out to be a profiler iteration-miscount (see
    # benchmarks/README.md profile_step row).  The loop runs at 6.56
    # ms/iteration marginal on v5e, exactly decoder + selection; the
    # post-loop merge is kept because it also simplifies the carried
    # state and shortens the done dependency chain.
    state = (
        cur_len, sum_lp, self_k, self_v, anc, cur_logits,
        last_tok, penult_tok, ts_max, hist_tok, hist_par,
        eot_buf_score, eot_buf_slot, len_buf, nfin, jnp.int32(0),
        jnp.zeros((b,), bool), jnp.zeros((b,), bool),
    )
    loop_body = body
    if gen_opts.cond_chunk > 1:
        def loop_body(state):
            return jax.lax.fori_loop(
                0, gen_opts.cond_chunk, lambda _, s: body(s), state
            )

    # One while_loop per ladder rung.  A non-final rung additionally caps
    # its step counter so every write stays inside its smaller table:
    # cur_len <= prompt_width + step_i, so step_i < phase_ctx - p keeps
    # write_pos < phase_ctx (requires cond_chunk == 1 — _ctx_phases
    # disables the ladder otherwise).
    for phase_i, phase_ctx in enumerate(phases):
        if phase_i > 0:
            state = _grow_ctx(state, phase_ctx, gen_opts.kv_int8)
        if phase_i == len(phases) - 1:
            phase_cond = cond
        else:
            step_cap = phase_ctx - p

            def phase_cond(state, _cap=step_cap):
                return jnp.any(~state[_BEAM_DONE_LAG]) & (
                    state[_BEAM_STEP_I] < _cap
                )

        state = jax.lax.while_loop(phase_cond, loop_body, state)

    (cur_len, sum_lp, self_k, self_v, anc, cur_logits,
     last_tok, penult_tok, ts_max, hist_tok, hist_par,
     eot_buf_score, eot_buf_slot, len_buf, nfin, _step_i,
     done, _done_lag) = state

    # One-shot pool merge over every recorded eot candidate.  Flat index
    # order is (step, candidate-rank) — the same tie-break order the
    # old per-step incremental merge produced (earlier steps first, then
    # candidate order within a step).
    flat_scores = eot_buf_score.reshape(b, ctx * 2 * K)
    fin_scores, top_idx = jax.lax.top_k(flat_scores, F)
    fin_slot = _gather_rows(eot_buf_slot.reshape(b, ctx * 2 * K), top_idx)
    fin_lens = _gather_rows(len_buf, top_idx // (2 * K))

    # The best active beam doubles as a fallback for rows whose finished
    # pool stayed empty (no eot before the length cap); selected host-side.
    gen_len = jnp.maximum(cur_len - prompt_len, 1).astype(jnp.float32)
    active_score = sum_lp[:, 0] / (gen_len ** lp_pow)

    return (
        hist_tok,
        hist_par,
        fin_slot,
        fin_lens,
        fin_scores,
        cur_len,
        active_score,
        no_speech_prob,
        prompt_len,
    )


# ---------------------------------------------------------------------------
# Temperature sampling (beam_size=1, num_hypotheses parallel samples)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("config", "gen_opts", "proc_opts", "meta")
)
def sample(
    params,
    config: WhisperConfig,
    gen_opts: GenOptions,
    proc_opts: ProcessorOptions,
    meta: TokenMeta,
    xa: jax.Array,
    prompt: jax.Array,
    prompt_len: jax.Array,
    sot_pos: jax.Array,
    max_length: jax.Array,
    temperature: jax.Array,  # (B,) per-row sampling temperature (traced)
    rng_keys: jax.Array,  # (B, 2) per-row PRNG keys (traced)
):
    """K independent temperature samples per batch row.

    ``temperature`` and ``rng_keys`` are per-ROW and traced, so one
    compiled program serves every fallback-ladder rung and a whole
    ladder can run as one batched call (rows = rungs) whose outputs are
    independent of what the other rows do — each row owns its key chain
    and its temperature, exactly as if it ran alone.

    Returns (tokens (B,K,ctx), lens (B,K), cum_logprob (B,K),
    eot_seen (B,K), no_speech_prob (B,)).
    """
    K = gen_opts.beam_size
    b, p = prompt.shape
    if gen_opts.w_int4:
        params = _pack_int4_weights(params)
    # Laddered ctx decode, as in beam_search: small KV tables early,
    # ``ctx`` stays the full logical table for the length caps.
    ctx = min(gen_opts.ctx_cap, config.n_text_ctx)
    phases = _ctx_phases(p, ctx, gen_opts)
    ctx0 = phases[0]
    V = meta.vocab_size

    gather_pos = jnp.stack([prompt_len - 1, sot_pos], axis=1)
    first_logits, cache0 = decoder_prefill(
        params, config, prompt, prompt_len, xa, gather_pos, ctx=ctx0
    )
    no_speech_prob = jax.nn.softmax(first_logits[:, 1], axis=-1)[:, meta.no_speech]

    tokens = jnp.zeros((b, K, ctx0), jnp.int32)
    tokens = tokens.at[:, :, :p].set(prompt[:, None, :])
    lens = jnp.broadcast_to(prompt_len[:, None], (b, K))
    sum_lp = jnp.zeros((b, K), jnp.float32)
    finished = jnp.zeros((b, K), bool)
    needs_history = _needs_history(proc_opts)
    # carried rule scalars (see apply_logits_rules_logprobs_carried); the
    # token buffer stays — it is the output and each step's write is one
    # masked column — but the per-step rule chain no longer scans it.
    last_tok = jnp.zeros((b, K), jnp.int32)
    penult_tok = jnp.zeros((b, K), jnp.int32)
    ts_max = jnp.full((b, K), -1, jnp.int32)

    self_k, self_v, cross_k, cross_v = _expand_caches(
        cache0, K, gen_opts.kv_int8,
        cross_qmax=gen_opts.cross_kv_qmax, cross_s4=gen_opts.cross_kv_s4,
    )
    cur_logits = jnp.broadcast_to(first_logits[:, 0][:, None, :], (b, K, V))

    # Identity ancestry: each sample attends only its own cache slot.
    # (Rebuilt in the body from the carried table shape — one iota +
    # broadcast, hoisted by XLA — so one body serves every ladder rung.)

    # Lagged loop cond (see beam_search): the active-beams predicate is
    # computed from each iteration's INPUT state and read by cond one
    # iteration later, so the loop branch never waits on the sampling
    # chain; the extra final iteration is write-masked below.
    if gen_opts.cond_chunk > 1:
        # chunked: per-chunk cond stall is amortized; read true activity
        def cond(state):
            return jnp.any(
                ~state[_SAMPLE_FINISHED]
                & (state[_SAMPLE_LENS] < jnp.minimum(max_length, ctx))
            )
    else:
        def cond(state):
            return jnp.any(state[_SAMPLE_ACTIVE_LAG])

    def body(state):
        (tokens, lens, sum_lp, finished, self_k, self_v, cur_logits,
         last_tok, penult_tok, ts_max, keys, _active_lag) = state
        ctx_tab = tokens.shape[2]  # current ladder rung's table size
        cap = jnp.minimum(max_length, ctx)
        active_in = ~finished & (lens < cap)  # from inputs: ready at start

        if needs_history:
            logprobs = apply_logits_rules_logprobs(
                cur_logits.reshape(b * K, V),
                tokens.reshape(b * K, ctx_tab),
                lens.reshape(b * K),
                jnp.broadcast_to(prompt_len[:, None], (b, K)).reshape(-1),
                meta,
                proc_opts,
            ).reshape(b, K, V)
        else:
            n_sampled = lens - prompt_len[:, None]  # (B, K): per-beam
            logprobs = apply_logits_rules_logprobs_carried(
                cur_logits.reshape(b * K, V),
                n_sampled.reshape(b * K),
                last_tok.reshape(b * K),
                penult_tok.reshape(b * K),
                ts_max.reshape(b * K),
                meta,
                proc_opts,
            ).reshape(b, K, V)

        # Scores use the T=1 distribution (openai semantics); sampling from
        # softmax(logprobs / T) equals softmax(masked_logits / T) — the
        # per-row log-normalizer is a constant shift, so one softmax serves
        # both the score bookkeeping and the sampling distribution.
        sample_logits = logprobs / temperature[:, None, None]
        if gen_opts.sampling_topk > 0:
            kth = jax.lax.top_k(sample_logits, gen_opts.sampling_topk)[0][..., -1:]
            sample_logits = jnp.where(sample_logits < kth, NEG_INF, sample_logits)

        # Per-row key chains: row i's draws depend only on its own key,
        # so a batched ladder call reproduces what each rung would draw
        # in its own B=1 call (given the same per-row seed).
        split = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
        keys, subs = split[:, 0], split[:, 1]
        next_tok = jax.vmap(
            lambda k, l: jax.random.categorical(k, l, axis=-1)
        )(subs, sample_logits)  # (B, K)
        next_tok = jnp.where(finished, meta.eot, next_tok)

        tok_lp = jnp.take_along_axis(logprobs, next_tok[:, :, None], axis=2)[:, :, 0]
        sum_lp = sum_lp + jnp.where(active_in, tok_lp, 0.0)

        write_pos = jnp.clip(lens, 0, ctx_tab - 1)  # position of the new token
        is_eot = next_tok == meta.eot
        # eot is recorded in the buffer but excluded from the length
        # masked-select column write (scatters serialize on TPU);
        # finished beams keep their buffer untouched
        hit = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, ctx_tab), 2)
            == write_pos[:, :, None]
        )
        tokens = jnp.where(
            hit & active_in[:, :, None], next_tok[:, :, None], tokens
        )
        # beams whose sampled window grows: not finished, not emitting eot,
        # and still under the length cap (capped rows stop writing/growing
        # even while sibling beams keep the loop alive)
        adv = active_in & ~is_eot
        lens = jnp.where(adv, lens + 1, lens)
        finished_new = finished | is_eot

        penult_tok = jnp.where(adv, last_tok, penult_tok)
        last_tok = jnp.where(adv, next_tok, last_tok)
        ts_max = jnp.where(
            adv & (next_tok >= meta.timestamp_begin),
            jnp.maximum(ts_max, next_tok),
            ts_max,
        )

        # Active beams share one write position per row (they all advance
        # together); finished beams' slots receive ignored garbage at that
        # position on the fused path — their outputs are never read.
        anc_id = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :, None], (b, K, ctx_tab)
        )
        next_logits, self_k, self_v = _gen_decoder_step(
            params,
            config,
            jnp.where(finished_new, 0, next_tok),
            write_pos,
            jnp.max(write_pos, axis=1),
            self_k,
            self_v,
            cross_k,
            cross_v,
            anc_id,
            fused=gen_opts.fused_attn,
        )

        return (tokens, lens, sum_lp, finished_new, self_k, self_v,
                next_logits, last_tok, penult_tok, ts_max, keys, active_in)

    state = (tokens, lens, sum_lp, finished, self_k, self_v, cur_logits,
             last_tok, penult_tok, ts_max, rng_keys,
             jnp.ones((b, K), bool))
    loop_body = body
    if gen_opts.cond_chunk > 1:  # see GenOptions.cond_chunk
        def loop_body(state):
            return jax.lax.fori_loop(
                0, gen_opts.cond_chunk, lambda _, s: body(s), state
            )

    # One while_loop per ladder rung (see beam_search).  A non-final rung
    # exits once any sample's length reaches its table size: entering the
    # body requires max(lens) < phase_ctx, so the write at clip(lens)
    # stays inside the table.
    for phase_i, phase_ctx in enumerate(phases):
        if phase_i > 0:
            state = _grow_ctx_sample(state, phase_ctx, gen_opts.kv_int8)
        if phase_i == len(phases) - 1:
            phase_cond = cond
        else:
            def phase_cond(state, _c=phase_ctx):
                return jnp.any(state[_SAMPLE_ACTIVE_LAG]) & (
                    jnp.max(state[_SAMPLE_LENS]) < _c
                )

        state = jax.lax.while_loop(phase_cond, loop_body, state)

    tokens, lens, sum_lp, finished = state[:4]

    return tokens, lens, sum_lp, finished, no_speech_prob


# ---------------------------------------------------------------------------
# Host-facing API (ctranslate2.models.Whisper.generate equivalent)
# ---------------------------------------------------------------------------


def _bucket(n: int, step: int = 32, cap: int = 448) -> int:
    return min(cap, max(step, -(-n // step) * step))


# Carried-state tuple indices read by the loop/rung conds below.  The
# loop bodies unpack the tuples positionally, so any reorder must update
# these together with the pack/unpack sites (the conds are the only
# by-index readers).
_BEAM_STEP_I = 15     # beam_search state: step counter
_BEAM_DONE = -2       # beam_search state: current done vector
_BEAM_DONE_LAG = -1   # beam_search state: one-iteration-lagged done
_SAMPLE_LENS = 1      # sample state: per-beam lengths
_SAMPLE_FINISHED = 3  # sample state: finished mask
_SAMPLE_ACTIVE_LAG = -1  # sample state: lagged active mask


@functools.lru_cache(maxsize=1)
def _multi_phase_default() -> bool:
    """Laddered ctx decode (GenOptions.multi_phase).  FWT_MULTI_PHASE=0
    disables; default on."""
    import os

    return os.environ.get("FWT_MULTI_PHASE", "1") != "0"


def _ctx_phases(prompt_width: int, ctx_full: int, gen_opts: "GenOptions"):
    """KV-table sizes for the laddered ctx decode, ascending and ending at
    ``ctx_full``: start at the smallest 64-step bucket holding the prompt
    plus a decode step, double until the full table.  ``[ctx_full]`` (the
    single-phase loop) when disabled, when the prompt already needs the
    full table, or under cond_chunk (the per-phase step cap must be
    checked every iteration)."""
    if (
        not gen_opts.multi_phase
        or gen_opts.cond_chunk > 1
        or ctx_full <= 64
        # The fused Pallas append+attend kernel windows its writes in
        # 8-slot sublanes, so every rung's table size must be 8-aligned;
        # dispatch buckets ctx_cap to 64 so this holds there, but direct
        # GenOptions users may pass an unaligned ctx_cap — fall back to
        # the single-phase loop rather than mis-window rung transitions.
        or (gen_opts.fused_attn and ctx_full % 8 != 0)
    ):
        return [ctx_full]
    c = _bucket(prompt_width + 2, step=64, cap=ctx_full)
    phases = []
    while c < ctx_full and len(phases) < 3:
        phases.append(c)
        c = min(c * 2, ctx_full)
    phases.append(ctx_full)
    return phases


def _grow_ctx(state, new_ctx: int, kv_int8: bool):
    """Zero-pad every ctx-sized table in the beam-loop state from its
    current phase size to ``new_ctx`` (ladder rung transition).  Pad
    regions are never read before being written: self-attention and the
    logits-rule chain mask positions >= cur_len, pad ancestry entries (0)
    are valid-but-unread slot indices, and the eot-candidate buffer pads
    with NEG_INF so the post-loop top_k ignores unwritten steps."""
    (cur_len, sum_lp, self_k, self_v, anc, cur_logits,
     last_tok, penult_tok, ts_max, hist_tok, hist_par,
     eot_buf_score, eot_buf_slot, len_buf, nfin, step_i,
     done, done_lag) = state
    grow = new_ctx - hist_tok.shape[1]

    def pad(a, axis, value=0):
        cfg = [(0, 0)] * a.ndim
        cfg[axis] = (0, grow)
        return jnp.pad(a, cfg, constant_values=value)

    if kv_int8:
        self_k = QuantKV(pad(self_k.q, 4), pad(self_k.s, 4))
        self_v = QuantKV(pad(self_v.q, 4), pad(self_v.s, 4))
    else:
        self_k, self_v = pad(self_k, 4), pad(self_v, 4)
    return (
        cur_len, sum_lp, self_k, self_v, pad(anc, 2), cur_logits,
        last_tok, penult_tok, ts_max, pad(hist_tok, 1), pad(hist_par, 1),
        pad(eot_buf_score, 1, NEG_INF), pad(eot_buf_slot, 1),
        pad(len_buf, 1), nfin, step_i, done, done_lag,
    )


def _grow_ctx_sample(state, new_ctx: int, kv_int8: bool):
    """``_grow_ctx`` for the sampling loop's (smaller) carried state."""
    (tokens, lens, sum_lp, finished, self_k, self_v, cur_logits,
     last_tok, penult_tok, ts_max, key, active_lag) = state
    grow = new_ctx - tokens.shape[2]

    def pad(a, axis):
        cfg = [(0, 0)] * a.ndim
        cfg[axis] = (0, grow)
        return jnp.pad(a, cfg)

    if kv_int8:
        self_k = QuantKV(pad(self_k.q, 4), pad(self_k.s, 4))
        self_v = QuantKV(pad(self_v.q, 4), pad(self_v.s, 4))
    else:
        self_k, self_v = pad(self_k, 4), pad(self_v, 4)
    return (
        pad(tokens, 2), lens, sum_lp, finished, self_k, self_v,
        cur_logits, last_tok, penult_tok, ts_max, key, active_lag,
    )


@functools.lru_cache(maxsize=1)
def _fused_cross_enabled() -> bool:
    import os

    return os.environ.get("FWT_FUSED_CROSS") == "1"


@functools.lru_cache(maxsize=1)
def _cond_chunk_default() -> int:
    """Early-exit check interval (GenOptions.cond_chunk).  FWT_COND_CHUNK
    overrides; 1 checks every step."""
    import os

    try:
        return max(1, int(os.environ.get("FWT_COND_CHUNK", "1")))
    except ValueError:
        return 1


@functools.lru_cache(maxsize=1)
def _fused_attn_default() -> bool:
    """Use the Pallas append+attend kernel when decoding on a single TPU
    chip.  The pure-XLA reference serves CPU (tests, the virtual mesh)
    and multi-device meshes (pallas_call has no SPMD partitioning rule, so
    the sharded data-parallel path keeps the XLA step).  FWT_FUSED_ATTN=0
    forces the XLA step everywhere."""
    import os

    if os.environ.get("FWT_FUSED_ATTN", "1") == "0":
        return False
    return jax.default_backend() in ("tpu", "axon") and jax.device_count() == 1


def generate(
    params,
    config: WhisperConfig,
    meta: TokenMeta,
    encoder_output: jax.Array,  # (B, T, d)
    prompts: Sequence[Sequence[int]],
    *,
    sot_id: int,
    beam_size: int = 5,
    patience: float = 1.0,
    length_penalty: float = 1.0,
    repetition_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
    max_length: int = 448,
    return_scores: bool = False,
    return_no_speech_prob: bool = False,
    suppress_blank: bool = True,
    suppress_tokens: Optional[Sequence[int]] = (),
    max_initial_timestamp_index: int = 50,
    sampling_temperature: Union[float, Sequence[float]] = 1.0,
    sampling_topk: int = 1,
    num_hypotheses: int = 1,
    with_timestamps: bool = True,
    rng_seed: Optional[Union[int, Sequence[int]]] = None,
    kv_int8: bool = False,
    int4: bool = False,
) -> List[WhisperGenerationResult]:
    """Batched generation mirroring the CT2 call signature the reference
    uses (transcribe.py:222-236, :1446-1459)."""
    return generate_collect(
        generate_dispatch(
            params,
            config,
            meta,
            encoder_output,
            prompts,
            sot_id=sot_id,
            beam_size=beam_size,
            patience=patience,
            length_penalty=length_penalty,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size,
            max_length=max_length,
            return_scores=return_scores,
            return_no_speech_prob=return_no_speech_prob,
            suppress_blank=suppress_blank,
            suppress_tokens=suppress_tokens,
            max_initial_timestamp_index=max_initial_timestamp_index,
            sampling_temperature=sampling_temperature,
            sampling_topk=sampling_topk,
            num_hypotheses=num_hypotheses,
            with_timestamps=with_timestamps,
            rng_seed=rng_seed,
            kv_int8=kv_int8,
            int4=int4,
        )
    )


class PendingGeneration(NamedTuple):
    """An in-flight generation: device arrays still attached to the XLA
    stream plus the host-side metadata needed to unpack them.  Splitting
    dispatch from collect lets callers enqueue the next batch's encode +
    decode while the host unpacks this one (the device never idles
    between batches)."""

    kind: str  # "sample" | "beam"
    arrays: tuple  # device arrays, fetched lazily by generate_collect
    prompt_lens: np.ndarray
    length_penalty: float


def generate_dispatch(
    params,
    config: WhisperConfig,
    meta: TokenMeta,
    encoder_output: jax.Array,
    prompts: Sequence[Sequence[int]],
    *,
    sot_id: int,
    beam_size: int = 5,
    patience: float = 1.0,
    length_penalty: float = 1.0,
    repetition_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
    max_length: int = 448,
    return_scores: bool = False,
    return_no_speech_prob: bool = False,
    suppress_blank: bool = True,
    suppress_tokens: Optional[Sequence[int]] = (),
    max_initial_timestamp_index: int = 50,
    sampling_temperature: Union[float, Sequence[float]] = 1.0,
    sampling_topk: int = 1,
    num_hypotheses: int = 1,
    with_timestamps: bool = True,
    rng_seed: Optional[Union[int, Sequence[int]]] = None,
    kv_int8: bool = False,
    int4: bool = False,
    dry_lower: bool = False,
) -> PendingGeneration:
    """Enqueue a generation on the device and return immediately (JAX
    async dispatch); ``generate_collect`` blocks and unpacks.

    With ``dry_lower`` the exact program this call would run is lowered
    (AOT, nothing executes) and the ``jax.stages.Lowered`` is returned
    instead — the hook for ``compile().memory_analysis()`` peak-HBM
    reporting (the reference publishes memory next to every speed row,
    reference README.md:27-30; axon's ``device.memory_stats()`` is
    unavailable so static XLA analysis is the honest substitute)."""
    b = len(prompts)
    assert encoder_output.shape[0] == b
    if int4 and not kv_int8:
        raise ValueError(
            "int4=True requires kv_int8=True: the packed-int4 cross cache "
            "rides the QuantKV scale path (_expand_caches), so without "
            "kv_int8 the cross-KV half of int4 would silently not apply"
        )

    prompt_lens = np.array([len(pr) for pr in prompts], dtype=np.int32)
    # Prompt buckets: 32 covers the batched pipeline's short prompts; long
    # conditioned prompts (sequential path, previous-text up to 223 tokens)
    # bucket coarsely at 128 — each distinct bucket is a separate XLA
    # program, and step-32 buckets meant ~8 cold compiles per model.
    # Prefill over padded positions is cheap; decode length is ctx_cap's.
    max_p = int(prompt_lens.max())
    P = 32 if max_p <= 32 else _bucket(max_p, step=128)
    prompt_arr = np.zeros((b, P), dtype=np.int32)
    sot_pos = np.zeros((b,), dtype=np.int32)
    for i, pr in enumerate(prompts):
        prompt_arr[i, : len(pr)] = pr
        sot_pos[i] = pr.index(sot_id) if sot_id in pr else len(pr) - 1

    proc_opts = ProcessorOptions(
        suppress_blank=suppress_blank,
        suppress_tokens=tuple(suppress_tokens or ()),
        with_timestamps=with_timestamps,
        max_initial_timestamp_index=max_initial_timestamp_index,
        repetition_penalty=repetition_penalty,
        no_repeat_ngram_size=no_repeat_ngram_size,
    )

    # Cache/buffer length: bucket the requested max_length so XLA compiles
    # a handful of programs and short decode budgets stay cheap.
    ctx_cap = min(448, _bucket(max(max_length, P + 1), step=64, cap=448))

    # Per-row temperature: a scalar applies to every row; a sequence maps
    # one temperature per batch row (the batched fallback ladder dispatches
    # its remaining rungs as rows of ONE call — transcribe.py
    # generate_with_fallback).  Temperature is traced, so every value runs
    # the same compiled program.
    if isinstance(sampling_temperature, (list, tuple, np.ndarray)):
        temps = [float(t) for t in sampling_temperature]
        if len(temps) != b:
            raise ValueError(
                f"per-row sampling_temperature has {len(temps)} entries "
                f"for batch size {b}"
            )
    else:
        temps = [float(sampling_temperature)] * b

    is_sampling = beam_size == 1 and all(t > 0 for t in temps)
    if beam_size == 1 and any(t > 0 for t in temps) and not is_sampling:
        raise ValueError(
            "per-row sampling_temperature mixes zero and non-zero values; "
            "greedy (t=0) and sampling rows cannot share one call"
        )

    if is_sampling:
        gen_opts = GenOptions(
            beam_size=num_hypotheses,
            num_finished=num_hypotheses,
            length_penalty=length_penalty,
            sampling=True,
            sampling_topk=sampling_topk,
            ctx_cap=ctx_cap,
            kv_int8=kv_int8,
            fused_attn=_fused_attn_default(),
            cond_chunk=_cond_chunk_default(),
            multi_phase=_multi_phase_default(),
            w_int4=int4,
            cross_kv_qmax=7 if int4 else 127,
            cross_kv_s4=int4,
        )
        # CT2 sampling is stochastic per call: draw fresh OS entropy
        # unless the caller pins seeds (tests, ladder parity).  Keys are
        # per-ROW and traced: row i's draws depend only on its own chain,
        # so a batched ladder reproduces each rung's solo draws, and
        # per-call seeds never recompile.
        if rng_seed is None:
            seeds = [
                int(np.random.SeedSequence().entropy % (2**63))
                for _ in range(b)
            ]
        elif isinstance(rng_seed, (list, tuple, np.ndarray)):
            seeds = [int(s) for s in rng_seed]
            if len(seeds) != b:
                raise ValueError(
                    f"per-row rng_seed has {len(seeds)} entries for "
                    f"batch size {b}"
                )
        else:
            # one seed for the whole batch: derive a distinct stream per
            # row (fold_in) so rows never share draws
            seeds = None
        if seeds is None:
            base = jax.random.PRNGKey(int(rng_seed))
            rng_keys = jnp.stack(
                [jax.random.fold_in(base, i) for i in range(b)]
            )
        else:
            rng_keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
        arrays = (sample.lower if dry_lower else sample)(
            params,
            config,
            gen_opts,
            proc_opts,
            meta,
            encoder_output,
            jnp.asarray(prompt_arr),
            jnp.asarray(prompt_lens),
            jnp.asarray(sot_pos),
            jnp.asarray(max_length, dtype=jnp.int32),
            jnp.asarray(temps, dtype=jnp.float32),
            rng_keys,
        )
        if dry_lower:
            return arrays  # jax.stages.Lowered
        return PendingGeneration("sample", arrays, prompt_lens, length_penalty)

    gen_opts = GenOptions(
        beam_size=beam_size,
        num_finished=max(1, round(beam_size * patience)),
        length_penalty=length_penalty,
        sampling=False,
        ctx_cap=ctx_cap,
        kv_int8=kv_int8,
        fused_attn=_fused_attn_default(),
        cond_chunk=_cond_chunk_default(),
        multi_phase=_multi_phase_default(),
        w_int4=int4,
        cross_kv_qmax=7 if int4 else 127,
        cross_kv_s4=int4,
    )
    arrays = (beam_search.lower if dry_lower else beam_search)(
        params,
        config,
        gen_opts,
        proc_opts,
        meta,
        encoder_output,
        jnp.asarray(prompt_arr),
        jnp.asarray(prompt_lens),
        jnp.asarray(sot_pos),
        jnp.asarray(max_length, dtype=jnp.int32),
    )
    if dry_lower:
        return arrays  # jax.stages.Lowered
    return PendingGeneration("beam", arrays, prompt_lens, length_penalty)


def generate_collect(pending: PendingGeneration) -> List[WhisperGenerationResult]:
    """Block on an in-flight generation and unpack the results."""
    prompt_lens = pending.prompt_lens
    length_penalty = pending.length_penalty
    b = len(prompt_lens)
    results: List[WhisperGenerationResult] = []

    if pending.kind == "sample":
        tokens, lens, sum_lp, finished, nsp = jax.device_get(pending.arrays)
        for i in range(b):
            gen_lens = lens[i] - prompt_lens[i]
            scores = sum_lp[i] / np.maximum(gen_lens, 1) ** length_penalty
            order = np.argsort(-scores)
            seqs = [
                tokens[i, j, prompt_lens[i] : lens[i, j]].tolist() for j in order
            ]
            results.append(
                WhisperGenerationResult(
                    sequences_ids=seqs,
                    scores=[float(scores[j]) for j in order],
                    no_speech_prob=float(nsp[i]),
                )
            )
    else:
        (hist_tok, hist_par, fin_slot, fin_lens, fin_scores, cur_len,
         act_score, nsp, _pl) = jax.device_get(pending.arrays)
        for i in range(b):
            begin = int(prompt_lens[i])
            have = fin_scores[i] > -1e29
            if have.any():
                seqs = [
                    _backtrack(
                        hist_tok[i], hist_par[i],
                        int(fin_slot[i, j]), int(fin_lens[i, j]), begin,
                    )
                    for j in range(fin_scores.shape[1])
                    if have[j]
                ]
                scores = [float(s) for s in fin_scores[i][have]]
            else:
                seqs = [
                    _backtrack(hist_tok[i], hist_par[i], 0, int(cur_len[i]), begin)
                ]
                scores = [float(act_score[i])]
            results.append(
                WhisperGenerationResult(
                    sequences_ids=seqs,
                    scores=scores,
                    no_speech_prob=float(nsp[i]),
                )
            )

    return results


def _backtrack(hist_tok, hist_par, slot: int, end_len: int, begin: int):
    """Rebuild one hypothesis from the (ctx, K) history tables: walk the
    backpointers from (position end_len-1, beam slot) down to the prompt
    boundary.  A few hundred numpy scalar reads per hypothesis — noise
    next to the device fetch."""
    seq = []
    c = end_len - 1
    while c >= begin:
        seq.append(int(hist_tok[c, slot]))
        slot = int(hist_par[c, slot])
        c -= 1
    seq.reverse()
    return seq
