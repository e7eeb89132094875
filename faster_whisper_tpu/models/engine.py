"""WhisperEngine: the device-side inference surface.

This is the TPU-native replacement for the ``ctranslate2.models.Whisper``
object: the reference drives exactly four native entry points —
``encode``, ``generate``, ``align`` and ``detect_language`` plus the
``is_multilingual``/``n_mels`` properties (reference:
faster_whisper/transcribe.py:689-698, :1391-1400, :1446-1459, :1709-1715,
:1823, :484) — and this class provides the same surface on top of the JAX
model + generation stack, so the policy layer (transcribe.py) maps 1:1.
"""

import functools

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.generation.generate import (
    WhisperGenerationResult,
    generate,
    generate_collect,
    generate_dispatch,
)
from faster_whisper_tpu.generation.processors import TokenMeta
from faster_whisper_tpu.ops.quant import QuantizedLinear
from faster_whisper_tpu.models import model as M
from faster_whisper_tpu.models.config import WhisperConfig
from faster_whisper_tpu.tokenizer import _LANGUAGE_CODES


class AlignmentResult:
    """Mirror of CT2's WhisperAlignmentResult (.text_token_probs,
    .alignments) consumed at transcribe.py:1716-1750."""

    __slots__ = ("text_token_probs", "alignments")

    def __init__(self, text_token_probs, alignments):
        self.text_token_probs = text_token_probs
        self.alignments = alignments


# ---------------------------------------------------------------------------
# Teacher-forced pass that accumulates alignment-head QK scores on the fly.
#
# The naive approach returns all cross-attention weights (L, B, H, S, T) —
# 13+ GB for large-v3 at S=448 — so instead each scan step projects its
# layer's scores through a static one-hot (L, K, H) selector and adds them
# into a (B, K, S, T) accumulator, where K = number of alignment heads.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config", "head_select"))
def _forward_with_alignment(
    params,
    config: WhisperConfig,
    head_select: Tuple[Tuple[int, int], ...],  # static ((layer, head), ...)
    tokens: jax.Array,  # (B, S)
    xa: jax.Array,  # (B, T, d)
):
    """Returns (logits (B,S,V) f32, qk_scores (B,K,S,T) f32 raw scaled
    attention scores for the selected heads)."""
    dec = params["decoder"]
    b, s = tokens.shape
    t = xa.shape[1]
    dtype = dec["token_embed"].dtype
    n_head = config.n_text_head
    dh = config.n_text_state // n_head
    L = config.n_text_layer
    K = len(head_select)

    # (L, K, H) one-hot selector
    sel = np.zeros((L, K, n_head), dtype=np.float32)
    for k, (layer, head) in enumerate(head_select):
        sel[layer, k, head] = 1.0
    sel = jnp.asarray(sel)

    x = dec["token_embed"][tokens] + dec["pos_embed"][:s][None]
    x = x.astype(dtype)

    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    causal = (j <= i)[None, None]

    scale = dh ** -0.5

    def body(carry, scanned):
        x, acc, layer_idx = carry
        p = scanned

        h = M.layer_norm(x, p["ln1_g"], p["ln1_b"])
        q, kk, vv = M._attn_qkv(p["self_attn"], h, n_head)
        attn = M.mha(q, kk, vv, mask=causal)
        x = x + M._dense(
            M._merge_heads(attn), p["self_attn"]["wo"], p["self_attn"]["bo"]
        )

        h = M.layer_norm(x, p["ln2_g"], p["ln2_b"])
        cp = p["cross_attn"]
        qx = M._split_heads(M._dense(h, cp["wq"], cp["bq"]), n_head)
        kx = M._split_heads(M._dense(xa.astype(dtype), cp["wk"]), n_head)
        vx = M._split_heads(M._dense(xa.astype(dtype), cp["wv"], cp["bv"]), n_head)

        scores = (
            jnp.einsum("bshd,bthd->bhst", qx, kx, preferred_element_type=jnp.float32)
            * scale
        )
        w = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhst,bthd->bshd", w.astype(vx.dtype), vx)
        x = x + M._dense(M._merge_heads(attn), cp["wo"], cp["bo"])

        # project this layer's raw scores into the alignment accumulator
        acc = acc + jnp.einsum("kh,bhst->bkst", sel[layer_idx], scores)

        h = M.layer_norm(x, p["ln3_g"], p["ln3_b"])
        x = x + M._mlp(p["mlp"], h)
        return (x, acc, layer_idx + 1), None

    acc0 = jnp.zeros((b, K, s, t), jnp.float32)
    (x, acc, _), _ = jax.lax.scan(body, (x, acc0, 0), dec["layers"])
    x = M.layer_norm(x, dec["ln_g"], dec["ln_b"])
    logits = jnp.dot(x, dec["token_embed"].T, preferred_element_type=jnp.float32)
    return logits, acc


@functools.partial(jax.jit, static_argnames=("config",))
def _detect_language_logits(params, config: WhisperConfig, xa, sot_id):
    """Single decoder step on <|startoftranscript|>; returns logits (B, V)."""
    b = xa.shape[0]
    tokens = jnp.full((b, 1), sot_id, jnp.int32)
    lengths = jnp.ones((b,), jnp.int32)
    gather = jnp.zeros((b, 1), jnp.int32)
    logits, _ = M.decoder_prefill(params, config, tokens, lengths, xa, gather)
    return logits[:, 0]


def _median_filter_time(x: np.ndarray, width: int) -> np.ndarray:
    """Median filter along the last axis with mirror padding (matches the
    torch reflect-pad median filter used for whisper timing)."""
    if width <= 1:
        return x
    from scipy.ndimage import median_filter

    size = (1,) * (x.ndim - 1) + (width,)
    return median_filter(x, size=size, mode="mirror")


def alignment_matrix(
    qk: np.ndarray, t_frames: int, median_filter_width: int
) -> np.ndarray:
    """openai's DTW input recipe on a (K, S', T) raw-score slice:
    per-head softmax over the FULL encoder time axis, THEN truncation to
    the content frames (openai/HF/CT2 order — truncating first rescales
    every row by its tail mass), per-column standardization over tokens,
    median filter along time, mean over heads -> (S', t_frames).  Pinned
    against HF transformers' own chain by
    tests/test_hf_alignment_parity.py."""
    w = qk - qk.max(axis=-1, keepdims=True)
    w = np.exp(w)
    w /= w.sum(axis=-1, keepdims=True)
    w = w[..., :t_frames]
    mean = w.mean(axis=-2, keepdims=True)
    std = w.std(axis=-2, keepdims=True) + 1e-9
    w = (w - mean) / std
    w = _median_filter_time(w, median_filter_width)
    return w.mean(axis=0)


def _align_head_chain(xk, row_start, n_rows, t_frames, median_width):
    """openai's DTW-input recipe for ONE alignment head's raw scores
    (B, S, T), batched with per-item masks: full-T softmax -> per-column
    standardization over the item's text-row span -> median filter along
    time with mirror padding at the item's content boundary (the host
    filters AFTER truncation to t_frames, so the mirror sits there, not
    at T).  Columns >= t_frames are garbage; callers slice them off."""
    B, S, T = xk.shape
    w = jax.nn.softmax(xk.astype(jnp.float32), axis=-1)

    rows = jnp.arange(S)[None, :, None]
    lo = row_start[:, None, None]
    hi = (row_start + n_rows)[:, None, None]
    rmask = (rows >= lo) & (rows < hi)
    cnt = jnp.maximum(n_rows, 1).astype(jnp.float32)[:, None, None]
    mean = jnp.sum(jnp.where(rmask, w, 0.0), axis=1, keepdims=True) / cnt
    var = (
        jnp.sum(jnp.where(rmask, (w - mean) ** 2, 0.0), axis=1, keepdims=True)
        / cnt
    )
    w = (w - mean) / (jnp.sqrt(var) + 1e-9)

    if median_width <= 1:
        return w

    # Mirror the content tail: for col >= tf the value must read
    # x[2*tf - 2 - col], which equals reverse(x) rolled by (2*tf - T - 1)
    # — a per-item dynamic roll, no gather (TPU gathers serialize).
    col = jnp.arange(T)[None, None, :]
    rev = jnp.flip(w, axis=-1)
    rolled = jax.vmap(lambda r, s: jnp.roll(r, s, axis=-1))(
        rev, 2 * t_frames - T - 1
    )
    w = jnp.where(col < t_frames[:, None, None], w, rolled)

    # median-of-7 along time: reflect pad + 7 static slices + sort
    half = median_width // 2
    wp = jnp.pad(w, ((0, 0), (0, 0), (half, half)), mode="reflect")
    stack = jnp.stack(
        [wp[:, :, k : k + T] for k in range(median_width)], axis=0
    )
    return jnp.sort(stack, axis=0)[half]


@functools.partial(
    jax.jit,
    static_argnames=("config", "head_select", "eot", "median_width"),
)
def _align_forward_post(
    params,
    config: WhisperConfig,
    head_select: Tuple[Tuple[int, int], ...],
    tokens,  # (B, S) int32
    xa,  # (B, T, d)
    row_start,  # (B,) first text row (len(prefix) - 1)
    n_rows,  # (B,) text rows incl. the eot row
    t_frames,  # (B,) content frames on the encoder time axis
    *,
    eot: int,
    median_width: int,
):
    """One program for the whole align pass: teacher-forced decoder
    forward (selected-head raw scores accumulated in-scan), next-token
    probabilities, and the per-head DTW-matrix recipe reduced to its
    head-mean — returning only (B, S) probs + (B, S, T) matrix.

    Exists because the split version fetched the raw (B, S, V) logits and
    (B, heads, S, T) attention tensors to the host (~6 GB f32 per batch-8
    call — ~60 s on a tunneled link and an HBM blow-up when post-processed
    as one tensor); the DTW only needs ~4.6 MB.  The per-head chain runs
    as a scan with a (B, S, T) accumulator so no second (B, K, S, T)
    buffer ever materializes.  The reference never sees this boundary:
    CT2 computes the whole alignment in C++ (reference
    faster_whisper/transcribe.py:1709)."""
    logits, qk = _forward_with_alignment(
        params, config, head_select, tokens, xa
    )

    lg = logits[:, :, :eot]
    lse = jax.nn.logsumexp(lg, axis=-1)
    nxt = jnp.concatenate([tokens[:, 1:], tokens[:, :1]], axis=1)
    tok_lp = jnp.take_along_axis(lg, nxt[:, :, None], axis=2)[:, :, 0]
    probs = jnp.exp(tok_lp - lse)

    B, K, S, T = qk.shape

    def step(acc, xk):
        return (
            acc + _align_head_chain(
                xk, row_start, n_rows, t_frames, median_width
            ),
            None,
        )

    matrix_sum, _ = jax.lax.scan(
        step, jnp.zeros((B, S, T), jnp.float32), jnp.moveaxis(qk, 1, 0)
    )
    return probs, matrix_sum / K


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW over a (N, M) cost matrix; returns (text_idx, time_idx)
    backtraced path.  Runs the native C++ implementation when available
    (native/dtw.cpp — the numpy anti-diagonal loop costs ~50-80 ms per
    (130, 750) matrix, x batch per align call; the native one ~1 ms with
    bit-identical output), falling back to the numpy oracle below."""
    from faster_whisper_tpu.dtw_native import dtw_native

    native = dtw_native(cost)
    if native is not None:
        return native
    return _dtw_path_numpy(cost)


def _dtw_path_numpy(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy oracle for dtw_path, vectorized over anti-diagonals (the
    N,M here are at most 448 x 1500)."""
    n, m = cost.shape
    INF = np.float64(np.inf)
    acc = np.full((n + 1, m + 1), INF, dtype=np.float64)
    acc[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), dtype=np.int8)

    # anti-diagonal d ranges over i + j
    for d in range(1, n + m + 1):
        i_lo = max(1, d - m)
        i_hi = min(n, d)
        if i_lo > i_hi:
            continue
        i = np.arange(i_lo, i_hi + 1)
        j = d - i
        valid = (j >= 1) & (j <= m)
        i, j = i[valid], j[valid]
        c0 = acc[i - 1, j - 1]  # match (diag)
        c1 = acc[i - 1, j]  # insertion
        c2 = acc[i, j - 1]  # deletion
        best = np.minimum(np.minimum(c0, c1), c2)
        acc[i, j] = cost[i - 1, j - 1] + best
        t = np.where(best == c0, 0, np.where(best == c1, 1, 2))
        trace[i, j] = t

    # backtrace
    i, j = n, m
    text_idx, time_idx = [], []
    while i > 0 or j > 0:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        if i > 0 and j > 0:
            t = trace[i, j]
        elif i > 0:
            t = 1
        else:
            t = 2
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.array(text_idx[::-1]), np.array(time_idx[::-1])


class WhisperEngine:
    """Device-side Whisper inference engine (CT2 surface equivalent)."""

    def __init__(
        self,
        params,
        config: WhisperConfig,
        hf_tokenizer=None,
        token_ids: Optional[dict] = None,
        kv_int8: bool = False,
        int4: bool = False,
    ):
        """``token_ids`` may pre-specify the special ids; otherwise they are
        resolved from ``hf_tokenizer``.  ``kv_int8`` quantizes the decode
        loop's K/V caches (set for int8 compute types).  ``int4``
        (compute_type="int4") expects params from quantize_params_int4 and
        makes the decode loop stream packed-int4 decoder weights and cross
        K/V (generation/generate.py::_pack_int4_weights); the self cache
        stays int8 for the fused append kernel."""
        self.params = params
        self.config = config
        self.device = "tpu"
        self.device_index = 0
        self.kv_int8 = kv_int8
        self.int4 = int4
        if int4:
            if not kv_int8:
                raise ValueError("int4=True requires kv_int8=True")
            # int4 params MUST come from quantize_params_int4 (values in
            # [-7, 7]); int8-range values would saturate in the in-program
            # int4 pack (generation/generate.py::_pack_int4_weights).  One
            # eager reduction on the logits head catches the mispairing at
            # construction instead of as silent garbage transcripts.
            lw = params["decoder"].get("logits_w")
            if not isinstance(lw, QuantizedLinear):
                # int4=True over an unquantized tree would silently run
                # full-precision weights: the flag is meaningless without
                # quantize_params_int4 output.
                raise ValueError(
                    "int4=True requires quantized params (decoder.logits_w "
                    "is missing or not a QuantizedLinear): quantize with "
                    "ops.quant.quantize_params_int4 (compute_type='int4')"
                )
            if int(jnp.max(jnp.abs(lw.q))) > 7:
                raise ValueError(
                    "int4=True but params are int8-range: quantize with "
                    "ops.quant.quantize_params_int4 (compute_type='int4')"
                )
        # Set by WhisperModel._setup_mesh for multi-chip data parallelism:
        # a NamedSharding splitting the batch axis over the ("data",) mesh.
        self.input_sharding = None

        if token_ids is None:
            token_ids = resolve_token_ids(hf_tokenizer)
        self._ids = token_ids
        self.meta = TokenMeta(
            eot=token_ids["eot"],
            timestamp_begin=token_ids["timestamp_begin"],
            no_timestamps=token_ids["no_timestamps"],
            no_speech=token_ids["no_speech"],
            blank=tuple(token_ids["blank"]),
            vocab_size=config.n_vocab,
        )
        self.sot_id = token_ids["sot"]
        # [(code, token_id)] for language detection
        self.language_tokens: List[Tuple[str, int]] = token_ids["languages"]

    # -- properties the reference reads (transcribe.py:484, :1394) --

    @property
    def is_multilingual(self) -> bool:
        return self.config.is_multilingual and bool(self.language_tokens)

    @property
    def n_mels(self) -> int:
        return self.config.n_mels

    # -- encode ---------------------------------------------------------

    def encode(self, features: np.ndarray, to_cpu: bool = False) -> jax.Array:
        """(B, n_mels, 3000) or (n_mels, 3000) mel -> encoder states."""
        if features.ndim == 2:
            features = features[None]
        arr = jnp.asarray(features)
        sh = self.input_sharding
        if sh is not None and arr.shape[0] % sh.mesh.shape["data"] == 0:
            arr = jax.device_put(arr, sh)
        return M.encode(self.params, self.config, arr)

    # -- generate -------------------------------------------------------

    def generate(
        self,
        encoder_output: jax.Array,
        prompts: Sequence[Sequence[int]],
        *,
        beam_size: int = 5,
        patience: float = 1.0,
        num_hypotheses: int = 1,
        length_penalty: float = 1.0,
        repetition_penalty: float = 1.0,
        no_repeat_ngram_size: int = 0,
        max_length: int = 448,
        return_scores: bool = False,
        return_no_speech_prob: bool = False,
        suppress_blank: bool = True,
        suppress_tokens: Optional[Sequence[int]] = (),
        max_initial_timestamp_index: int = 50,
        sampling_temperature=1.0,  # float or per-row Sequence[float]
        sampling_topk: int = 1,
        rng_seed=None,
    ) -> List[WhisperGenerationResult]:
        return generate_collect(
            self.generate_dispatch(
                encoder_output,
                prompts,
                beam_size=beam_size,
                patience=patience,
                num_hypotheses=num_hypotheses,
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
                rng_seed=rng_seed,
            )
        )

    def generate_dispatch(
        self,
        encoder_output: jax.Array,
        prompts: Sequence[Sequence[int]],
        *,
        beam_size: int = 5,
        patience: float = 1.0,
        num_hypotheses: int = 1,
        length_penalty: float = 1.0,
        repetition_penalty: float = 1.0,
        no_repeat_ngram_size: int = 0,
        max_length: int = 448,
        return_scores: bool = False,
        return_no_speech_prob: bool = False,
        suppress_blank: bool = True,
        suppress_tokens: Optional[Sequence[int]] = (),
        max_initial_timestamp_index: int = 50,
        sampling_temperature=1.0,  # float or per-row Sequence[float]
        sampling_topk: int = 1,
        rng_seed=None,
    ):
        """Async half of ``generate``: enqueues the decode on the device
        stream and returns a PendingGeneration; ``generate_collect``
        blocks.  Lets the batched pipeline overlap the next batch's
        encode+decode with this batch's host-side unpacking."""
        prompts = [list(p) for p in prompts]
        # CT2 semantics: timestamp rules are active unless the prompt opts
        # out with <|notimestamps|>.
        with_timestamps = self.meta.no_timestamps not in prompts[0]
        return generate_dispatch(
            self.params,
            self.config,
            self.meta,
            encoder_output,
            prompts,
            sot_id=self.sot_id,
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
            rng_seed=rng_seed,
            num_hypotheses=num_hypotheses,
            with_timestamps=with_timestamps,
            kv_int8=self.kv_int8,
            int4=self.int4,
        )

    @staticmethod
    def generate_collect(pending):
        """Blocking half of generate_dispatch."""
        return generate_collect(pending)

    def memory_report(
        self,
        batch_size: int = 8,
        beam_size: int = 5,
        max_new_tokens: int = 128,
        prompt_len: int = 4,
        sampling_temperature: float = 0.0,
    ) -> dict:
        """Peak-HBM accounting for the engine's two big programs (encode +
        the decode loop) at the given shapes, via XLA's static
        ``memory_analysis`` on the exact compiled executables — nothing
        executes.  The reference publishes memory next to every speed row
        (reference README.md:27-30, benchmark/memory_benchmark.py:28-93);
        tunneled TPU backends return no ``device.memory_stats()``, so the
        compiler's own allocation analysis is the recorded substitute:
        peak == weights (arguments) + program temporaries (KV caches,
        beam state, activations all live inside one jitted program).
        """
        import jax.numpy as jnp

        cfg = self.config
        weights_bytes = sum(
            x.nbytes for x in jax.tree.leaves(self.params)
        )

        def analyze(compiled):
            try:
                m = compiled.memory_analysis()
            except Exception:  # backend without the analysis API
                return None
            if m is None:
                return None
            return {
                "argument_bytes": int(m.argument_size_in_bytes),
                "output_bytes": int(m.output_size_in_bytes),
                "temp_bytes": int(m.temp_size_in_bytes),
                "code_bytes": int(m.generated_code_size_in_bytes),
                "peak_bytes": int(
                    m.argument_size_in_bytes
                    + m.output_size_in_bytes
                    + m.temp_size_in_bytes
                ),
            }

        mel = jax.ShapeDtypeStruct(
            (batch_size, cfg.n_mels, 3000), jnp.float32
        )
        enc = analyze(M.encode.lower(self.params, cfg, mel).compile())

        xa = jnp.zeros(
            (batch_size, cfg.n_audio_ctx, cfg.n_audio_state), jnp.bfloat16
        )
        prompt = [self.sot_id] * prompt_len
        lowered = generate_dispatch(
            self.params,
            self.config,
            self.meta,
            xa,
            [prompt] * batch_size,
            sot_id=self.sot_id,
            beam_size=beam_size,
            max_length=prompt_len + max_new_tokens,
            sampling_temperature=sampling_temperature,
            kv_int8=self.kv_int8,
            int4=self.int4,
            dry_lower=True,
        )
        dec = analyze(lowered.compile())
        return {
            "weights_bytes": int(weights_bytes),
            "encode": enc,
            "decode": dec,
        }

    # -- language detection (transcribe.py:1823, :1193) ------------------

    def detect_language(self, encoder_output: jax.Array):
        """Per-batch sorted [(token, prob)] over the language tokens."""
        if not self.language_tokens:
            return [[("<|en|>", 1.0)] for _ in range(encoder_output.shape[0])]
        logits = _detect_language_logits(
            self.params, self.config, encoder_output, self.sot_id
        )
        lang_ids = np.array([tid for _, tid in self.language_tokens])
        lang_logits = np.asarray(logits)[:, lang_ids]
        lang_logits = lang_logits - lang_logits.max(axis=-1, keepdims=True)
        probs = np.exp(lang_logits)
        probs /= probs.sum(axis=-1, keepdims=True)

        results = []
        for row in probs:
            order = np.argsort(-row)
            results.append(
                [
                    ("<|%s|>" % self.language_tokens[i][0], float(row[i]))
                    for i in order
                ]
            )
        return results

    # -- alignment (transcribe.py:1709-1715) -----------------------------

    def _alignment_heads(self) -> Tuple[Tuple[int, int], ...]:
        if self.config.alignment_heads:
            return tuple(tuple(h) for h in self.config.alignment_heads)
        # openai fallback: every head of the upper half of decoder layers
        L, H = self.config.n_text_layer, self.config.n_text_head
        return tuple((layer, head) for layer in range(L // 2, L) for head in range(H))

    def align(
        self,
        encoder_output: jax.Array,
        start_sequence: Sequence[int],
        text_tokens: List[List[int]],
        num_frames,
        median_filter_width: int = 7,
    ) -> List[AlignmentResult]:
        """Teacher-forced pass + cross-attention DTW word alignment.

        ``num_frames`` is an int or per-item list of content frame counts
        (mel frames; encoder states cover num_frames // 2).
        """
        return self.align_collect(
            self.align_dispatch(
                encoder_output,
                start_sequence,
                text_tokens,
                num_frames,
                median_filter_width=median_filter_width,
            )
        )

    def align_dispatch(
        self,
        encoder_output: jax.Array,
        start_sequence: Sequence[int],
        text_tokens: List[List[int]],
        num_frames,
        median_filter_width: int = 7,
    ):
        """Async half of ``align``: enqueues the device program and starts
        the device->host copies, so the caller can queue more device work
        (e.g. the next batch's decode) before blocking in
        ``align_collect`` — the ~6 MB matrix pull then overlaps device
        compute instead of idling the chip (measured ~0.3 s per batch-8
        call on the tunneled link, benchmarks/profile_align.py)."""
        b_real = len(text_tokens)
        if isinstance(num_frames, int):
            num_frames = [num_frames] * b_real
        assert encoder_output.shape[0] == b_real
        if b_real == 0:
            return (None, None, 0, [], [])

        # Bucket the batch axis to the next power of two (dummy rows:
        # repeated last encoder row + empty text) so align programs key
        # on {1, 2, 4, ...} like the decode programs — a raw tail size
        # would compile a fresh teacher-forced program per distinct
        # trailing-batch size, unwarmable ahead of time.
        b = 1
        while b < b_real:
            b *= 2
        if b != b_real:
            pad = b - b_real
            encoder_output = jnp.concatenate(
                [encoder_output] + [encoder_output[-1:]] * pad, axis=0
            )
            text_tokens = list(text_tokens) + [[]] * pad
            num_frames = list(num_frames) + [num_frames[-1]] * pad

        prefix = list(start_sequence) + [self.meta.no_timestamps]
        seqs = [prefix + list(t) + [self.meta.eot] for t in text_tokens]
        max_len = max(len(s) for s in seqs)
        pad_to = min(self.config.n_text_ctx, -(-max_len // 64) * 64)
        tokens = np.zeros((b, pad_to), dtype=np.int32)
        for i, s in enumerate(seqs):
            tokens[i, : len(s)] = s[:pad_to]

        heads = self._alignment_heads()
        # Probabilities + the DTW input matrix reduce ON DEVICE in one
        # program (_align_forward_post); only (B, S) + the text-row slice
        # of the (B, S, T) matrix cross the link.
        start = len(prefix) - 1
        n_rows = np.array(
            [min(len(t) + 1, pad_to - start) for t in text_tokens], np.int32
        )
        tfr = np.array(
            [max(1, int(nf) // 2) for nf in num_frames], np.int32
        )
        probs_d, matrix_d = _align_forward_post(
            self.params,
            self.config,
            heads,
            jnp.asarray(tokens),
            encoder_output,
            jnp.full((b,), start, jnp.int32),
            jnp.asarray(n_rows),
            jnp.asarray(tfr),
            eot=int(self.meta.eot),
            median_width=int(median_filter_width),
        )
        # Only rows [start, start + max(n_rows)) feed the DTW — slicing on
        # device cuts the pull by the prompt/padding share (~1/3).  The
        # slice length is bucketed to 64 rows (clamped to the token
        # buffer) so it keys a handful of eager programs, not one per
        # distinct longest-text length.
        max_rows = int(n_rows.max()) if b else 0
        max_rows = min(-(-max(max_rows, 1) // 64) * 64, pad_to - start)
        matrix_d = jax.lax.dynamic_slice_in_dim(
            matrix_d, start, max_rows, axis=1
        )
        for a in (probs_d, matrix_d):
            try:
                a.copy_to_host_async()
            except AttributeError:  # older jax / non-PJRT arrays
                break
        return (probs_d, matrix_d, start, text_tokens[:b_real], tfr)

    def align_collect(self, pending) -> List[AlignmentResult]:
        """Blocking half of ``align``: pull + native DTW + unpack
        (text_tokens carries only the real rows; pow2 pad rows are
        dropped here by never being iterated)."""
        probs_d, matrix_d, start, text_tokens, tfr = pending
        if not text_tokens:
            return []
        probs = np.asarray(probs_d)
        matrix = np.asarray(matrix_d)

        results = []
        for i, text in enumerate(text_tokens):
            n_text = len(text)
            if n_text == 0:
                results.append(AlignmentResult([], []))
                continue

            text_token_probs = probs[i, start : start + n_text].tolist()

            m = matrix[i, : n_text + 1, : tfr[i]]
            text_idx, time_idx = dtw_path(-m.astype(np.float64))
            alignments = list(zip(text_idx.tolist(), time_idx.tolist()))
            results.append(AlignmentResult(text_token_probs, alignments))

        return results


def resolve_token_ids(hf_tokenizer) -> dict:
    """Resolve the Whisper special-token layout from a tokenizers.Tokenizer."""
    def tid(tok):
        return hf_tokenizer.token_to_id(tok)

    eot = tid("<|endoftext|>")
    no_timestamps = tid("<|notimestamps|>")
    no_speech = tid("<|nospeech|>")
    if no_speech is None:
        no_speech = tid("<|nocaptions|>")
    languages = []
    for code in _LANGUAGE_CODES:
        t = tid("<|%s|>" % code)
        if t is not None:
            languages.append((code, t))
    blank = hf_tokenizer.encode(" ", add_special_tokens=False).ids
    return {
        "eot": eot,
        "sot": tid("<|startoftranscript|>"),
        "no_timestamps": no_timestamps,
        "timestamp_begin": no_timestamps + 1,
        "no_speech": no_speech if no_speech is not None else eot,
        "blank": blank,
        "languages": languages,
    }
