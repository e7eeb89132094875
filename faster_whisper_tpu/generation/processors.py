"""Whisper logits processors, fully vectorized for on-device decoding.

Reproduces the CTranslate2/openai-whisper logits-rule semantics that the
reference depends on for output parity (the reference passes suppress_blank,
suppress_tokens and max_initial_timestamp_index straight into the C++ engine,
reference: faster_whisper/transcribe.py:1446-1459):

  * static suppress list (non-speech tokens + control tokens),
  * blank suppression at the first sampled position,
  * repetition penalty and no-repeat-ngram over the sampled region,
  * the timestamp pairing rules: <|notimestamps|> always banned, timestamps
    come in pairs (after a lone timestamp only text/eot, after a pair only
    a timestamp), monotonically non-decreasing, timestamp-only at the first
    position with a max_initial_timestamp cap, and the "if the total
    timestamp probability beats every text token, force a timestamp" rule.

All functions operate on rows: logits (R, V) f32, token buffers (R, ctx),
per-row lengths; everything is jit-traceable with static metadata.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


@dataclass(frozen=True)
class TokenMeta:
    """Static vocabulary layout (hashable: used as a jit static arg)."""

    eot: int
    timestamp_begin: int
    no_timestamps: int
    no_speech: int
    blank: Tuple[int, ...]  # token ids of " " (plus eot added separately)
    vocab_size: int


@dataclass(frozen=True)
class ProcessorOptions:
    """Static decode-policy options (hashable: used as a jit static arg)."""

    suppress_blank: bool = True
    suppress_tokens: Tuple[int, ...] = ()
    with_timestamps: bool = True
    max_initial_timestamp_index: int = 50
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0


def apply_logits_rules(
    logits: jax.Array,  # (R, V) f32
    tokens: jax.Array,  # (R, ctx) i32 full buffers (prompt + sampled)
    cur_len: jax.Array,  # (R,) absolute length so far
    sample_begin: jax.Array,  # (R,) prompt length
    meta: TokenMeta,
    opts: ProcessorOptions,
) -> jax.Array:
    """Apply the full rule chain; returns masked/penalized logits (R, V)."""
    masked = _apply_masks(logits, tokens, cur_len, sample_begin, meta, opts)
    if opts.with_timestamps:
        # If the total timestamp probability beats every text token,
        # only timestamps may be sampled.
        v = logits.shape[1]
        is_ts = jnp.arange(v, dtype=jnp.int32)[None, :] >= meta.timestamp_begin
        lp = jax.nn.log_softmax(masked, axis=-1)
        ts_lse = jax.nn.logsumexp(jnp.where(is_ts, lp, NEG_INF), axis=-1)
        max_text = jnp.max(jnp.where(is_ts, NEG_INF, lp), axis=-1)
        force_ts = (ts_lse > max_text)[:, None]
        masked = jnp.where(force_ts & ~is_ts, NEG_INF, masked)
    return masked


def apply_logits_rules_logprobs(
    logits: jax.Array,  # (R, V) f32
    tokens: jax.Array,
    cur_len: jax.Array,
    sample_begin: jax.Array,
    meta: TokenMeta,
    opts: ProcessorOptions,
) -> jax.Array:
    """Rule chain fused with the log-softmax: returns final LOG-PROBS.

    Mathematically identical to ``log_softmax(apply_logits_rules(...))``
    but with a single softmax pass: the force-timestamp rule masks text
    tokens to -inf, and a log-softmax restricted to the surviving
    timestamp tokens is just ``lp - logsumexp(lp[timestamps])`` — a shift,
    not a second normalization.  This is what the decode loops use; the
    unfused variant above stays for rule-parity tests and external
    callers that need logits.
    """
    masked = _apply_masks(logits, tokens, cur_len, sample_begin, meta, opts)
    lp = jax.nn.log_softmax(masked, axis=-1)
    if opts.with_timestamps:
        v = logits.shape[1]
        is_ts = jnp.arange(v, dtype=jnp.int32)[None, :] >= meta.timestamp_begin
        ts_lse = jax.nn.logsumexp(jnp.where(is_ts, lp, NEG_INF), axis=-1)
        max_text = jnp.max(jnp.where(is_ts, NEG_INF, lp), axis=-1)
        force_ts = ts_lse > max_text
        lp = jnp.where(
            force_ts[:, None],
            jnp.where(is_ts, lp - ts_lse[:, None], NEG_INF),
            lp,
        )
    return lp


def apply_logits_rules_logprobs_carried(
    logits: jax.Array,  # (R, V) f32
    n_sampled: jax.Array,  # (R,) tokens sampled so far
    last: jax.Array,  # (R,) last sampled token (valid when n_sampled >= 1)
    penult: jax.Array,  # (R,) second-to-last sampled (valid when n_sampled >= 2)
    ts_max: jax.Array,  # (R,) max sampled timestamp token, -1 when none
    meta: TokenMeta,
    opts: ProcessorOptions,
) -> jax.Array:
    """``apply_logits_rules_logprobs`` from carried per-row scalars.

    The timestamp rules only consume three reductions of the token
    buffer — the last token, the one before it, and the largest sampled
    timestamp — all of which the decode loops can carry incrementally
    as (B, K) integers.  This variant removes every buffer-width scan
    from the per-step rule chain; it is valid only for the policy
    options that need no further history (the defaults): callers with a
    repetition penalty or no-repeat-ngram reconstruct a token view and
    use the buffer-based variant above.  Equivalence to the buffer
    variant is pinned by tests/test_generation.py.
    """
    assert opts.repetition_penalty == 1.0 and opts.no_repeat_ngram_size == 0
    r, v = logits.shape
    vocab_ids = jnp.arange(v, dtype=jnp.int32)[None, :]
    at_begin = (n_sampled == 0)[:, None]

    if opts.suppress_tokens:
        sup = jnp.asarray(opts.suppress_tokens, dtype=jnp.int32)
        mask = jnp.zeros((v,), dtype=bool).at[sup].set(True)
        logits = jnp.where(mask[None, :], NEG_INF, logits)

    if opts.suppress_blank and meta.blank:
        blank = jnp.asarray(tuple(meta.blank) + (meta.eot,), dtype=jnp.int32)
        mask = jnp.zeros((v,), dtype=bool).at[blank].set(True)
        logits = jnp.where(at_begin & mask[None, :], NEG_INF, logits)

    if opts.with_timestamps:
        tsb = meta.timestamp_begin
        is_ts = vocab_ids >= tsb
        last_was_ts = (n_sampled >= 1) & (last >= tsb)
        penult_was_ts = (n_sampled < 2) | (penult >= tsb)

        logits = jnp.where(vocab_ids == meta.no_timestamps, NEG_INF, logits)
        ban_ts = (last_was_ts & penult_was_ts)[:, None] & is_ts
        ban_text = (last_was_ts & ~penult_was_ts)[:, None] & (vocab_ids < meta.eot)
        logits = jnp.where(ban_ts | ban_text, NEG_INF, logits)

        have_ts = ts_max >= 0
        floor = jnp.where(last_was_ts & ~penult_was_ts, ts_max, ts_max + 1)
        ban_low = have_ts[:, None] & is_ts & (vocab_ids < floor[:, None])
        logits = jnp.where(ban_low, NEG_INF, logits)

        logits = jnp.where(at_begin & ~is_ts, NEG_INF, logits)
        if opts.max_initial_timestamp_index is not None:
            cap = tsb + opts.max_initial_timestamp_index
            logits = jnp.where(at_begin & (vocab_ids > cap), NEG_INF, logits)

    lp = jax.nn.log_softmax(logits, axis=-1)
    if opts.with_timestamps:
        is_ts = jnp.arange(v, dtype=jnp.int32)[None, :] >= meta.timestamp_begin
        ts_lse = jax.nn.logsumexp(jnp.where(is_ts, lp, NEG_INF), axis=-1)
        max_text = jnp.max(jnp.where(is_ts, NEG_INF, lp), axis=-1)
        force_ts = ts_lse > max_text
        lp = jnp.where(
            force_ts[:, None],
            jnp.where(is_ts, lp - ts_lse[:, None], NEG_INF),
            lp,
        )
    return lp


def _apply_masks(
    logits: jax.Array,
    tokens: jax.Array,
    cur_len: jax.Array,
    sample_begin: jax.Array,
    meta: TokenMeta,
    opts: ProcessorOptions,
) -> jax.Array:
    """All rules except the force-timestamp probability rule."""
    r, v = logits.shape
    vocab_ids = jnp.arange(v, dtype=jnp.int32)[None, :]  # (1, V)
    n_sampled = cur_len - sample_begin  # (R,)
    at_begin = (n_sampled == 0)[:, None]  # (R, 1)

    # --- static suppress list ---
    if opts.suppress_tokens:
        sup = jnp.asarray(opts.suppress_tokens, dtype=jnp.int32)
        mask = jnp.zeros((v,), dtype=bool).at[sup].set(True)
        logits = jnp.where(mask[None, :], NEG_INF, logits)

    # --- blank suppression at the first sampled position ---
    if opts.suppress_blank and meta.blank:
        blank = jnp.asarray(tuple(meta.blank) + (meta.eot,), dtype=jnp.int32)
        mask = jnp.zeros((v,), dtype=bool).at[blank].set(True)
        logits = jnp.where(at_begin & mask[None, :], NEG_INF, logits)

    # --- repetition penalty over the sampled region ---
    if opts.repetition_penalty != 1.0:
        ctx = tokens.shape[1]
        pos = jnp.arange(ctx, dtype=jnp.int32)[None, :]
        in_window = (pos >= sample_begin[:, None]) & (pos < cur_len[:, None])
        seen = jnp.zeros((r, v), dtype=bool)
        row = jnp.arange(r)[:, None]
        seen = seen.at[row, jnp.where(in_window, tokens, 0)].max(in_window)
        penalized = jnp.where(
            logits > 0,
            logits / opts.repetition_penalty,
            logits * opts.repetition_penalty,
        )
        logits = jnp.where(seen, penalized, logits)

    # --- no-repeat-ngram over the sampled region ---
    if opts.no_repeat_ngram_size > 0:
        n = opts.no_repeat_ngram_size
        ctx = tokens.shape[1]
        row = jnp.arange(r)

        # current (n-1)-gram suffix: tokens[cur_len-n+1 : cur_len]
        def suffix_tok(j):  # j in [0, n-1)
            idx = jnp.clip(cur_len - (n - 1) + j, 0, ctx - 1)
            return tokens[row, idx]

        suffix = jnp.stack([suffix_tok(j) for j in range(n - 1)], axis=1)

        def banned_at(p, acc):
            # window tokens[p : p+n-1] matches suffix -> ban tokens[p+n-1]
            window = jax.lax.dynamic_slice_in_dim(tokens, p, n - 1, axis=1)
            matches = jnp.all(window == suffix, axis=1)
            valid = (p >= sample_begin) & (p + n - 1 < cur_len)
            ban_tok = tokens[row, jnp.clip(p + n - 1, 0, ctx - 1)]
            hit = matches & valid & (n_sampled >= n - 1)
            return acc.at[row, ban_tok].max(hit)

        banned = jax.lax.fori_loop(
            0,
            ctx - (n - 1),
            banned_at,
            jnp.zeros((r, v), dtype=bool),
        )
        logits = jnp.where(banned, NEG_INF, logits)

    # --- timestamp rules ---
    if opts.with_timestamps:
        tsb = meta.timestamp_begin
        is_ts = vocab_ids >= tsb  # (1, V)
        ctx = tokens.shape[1]

        # one-element-per-row reads as masked reductions: tiny dynamic
        # gathers serialize on TPU inside the decode loop
        pos_ids = jnp.arange(ctx, dtype=jnp.int32)[None, :]

        def col(idx):
            return jnp.sum(
                jnp.where(pos_ids == idx[:, None], tokens, 0), axis=1
            )

        last = col(jnp.clip(cur_len - 1, 0, ctx - 1))
        penult = col(jnp.clip(cur_len - 2, 0, ctx - 1))
        last_was_ts = (n_sampled >= 1) & (last >= tsb)
        penult_was_ts = (n_sampled < 2) | (penult >= tsb)

        # <|notimestamps|> is never a valid output here.
        logits = jnp.where(vocab_ids == meta.no_timestamps, NEG_INF, logits)

        # After a timestamp pair: must be text/eot.  After a lone timestamp:
        # must be a timestamp or eot (ban plain text).
        ban_ts = (last_was_ts & penult_was_ts)[:, None] & is_ts
        ban_text = (last_was_ts & ~penult_was_ts)[:, None] & (vocab_ids < meta.eot)
        logits = jnp.where(ban_ts | ban_text, NEG_INF, logits)

        # Timestamps are non-decreasing: ban anything below the last sampled
        # timestamp (strictly below it if we're mid-pair, at-or-below after
        # a completed pair).
        pos = jnp.arange(ctx, dtype=jnp.int32)[None, :]
        in_window = (pos >= sample_begin[:, None]) & (pos < cur_len[:, None])
        ts_vals = jnp.where(in_window & (tokens >= tsb), tokens, -1)
        ts_last = jnp.max(ts_vals, axis=1)  # (R,) last sampled ts (== max)
        have_ts = ts_last >= 0
        floor = jnp.where(last_was_ts & ~penult_was_ts, ts_last, ts_last + 1)
        ban_low = have_ts[:, None] & is_ts & (vocab_ids < floor[:, None])
        logits = jnp.where(ban_low, NEG_INF, logits)

        # First sampled position: timestamps only, capped by
        # max_initial_timestamp_index.
        logits = jnp.where(at_begin & ~is_ts, NEG_INF, logits)
        if opts.max_initial_timestamp_index is not None:
            cap = tsb + opts.max_initial_timestamp_index
            logits = jnp.where(at_begin & (vocab_ids > cap), NEG_INF, logits)

    return logits
