"""Word-timestamp align-pass anatomy (round 5).

The batched +word_timestamps row costs ~2.3 s over plain decode in the
same window at the production 10-head count (benchmarks/README.md).  The
align pass is one device program per batch (engine._align_forward_post:
teacher-forced forward + DTW-matrix recipe) + a host pull + native DTW +
python bookkeeping.  This script line-items one batch-8 call:

  forward+post   _align_forward_post dispatch -> ready   (device)
  matrix pull    (B, S, T) f32 device -> host             (link)
  dtw            native C++ backtrace per item            (host)
  engine.align   the whole engine call                    (sum)

Shapes mirror the bench word-ts row: large-v3 int8, B=8, S=192 bucket,
T=1500, K=10 alignment heads.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from faster_whisper_tpu.models import engine as E

    model = bench.build_model("large-v3", os.environ.get("BENCH_COMPUTE", "int8"))
    eng = model.model
    cfg = eng.config
    L, H = cfg.n_text_layer, cfg.n_text_head
    ten_heads = tuple(
        (L // 2 + (i * (L - L // 2)) // 10, (i * 7) % H) for i in range(10)
    )
    eng._alignment_heads = lambda: ten_heads

    B, n_text = 8, 125
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((B, cfg.n_mels, 3000)).astype(np.float32) * 0.2
    xa = eng.encode(mel)
    sot = list(model_sot(model))
    text_tokens = [
        rng.integers(300, 5000, size=n_text).tolist() for _ in range(B)
    ]

    def sync(x):
        return float(jnp.sum(jnp.asarray(x)))

    def timed(name, fn, n=3):
        fn()  # compile/load
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: min {min(ts)*1e3:.1f} ms  runs {[round(t*1e3) for t in ts]}")
        return min(ts)

    # --- whole engine.align call (device + pull + dtw + python) ---
    timed(
        "engine.align (whole call)",
        lambda: eng.align(xa, sot, text_tokens, [3000] * B),
    )

    # --- device program only ---
    prefix = sot + [eng.meta.no_timestamps]
    seqs = [prefix + t + [eng.meta.eot] for t in text_tokens]
    pad_to = min(cfg.n_text_ctx, -(-max(len(s) for s in seqs) // 64) * 64)
    tokens = np.zeros((B, pad_to), np.int32)
    for i, s in enumerate(seqs):
        tokens[i, : len(s)] = s[:pad_to]
    start = len(prefix) - 1
    n_rows = jnp.full((B,), n_text + 1, jnp.int32)
    tfr = jnp.full((B,), 1500, jnp.int32)
    tokens_d = jnp.asarray(tokens)
    row_start = jnp.full((B,), start, jnp.int32)

    def fwd_post():
        p, m = E._align_forward_post(
            eng.params, cfg, ten_heads, tokens_d, xa, row_start, n_rows, tfr,
            eot=int(eng.meta.eot), median_width=7,
        )
        sync(m[:, 0, 0]) ; return p, m

    timed("_align_forward_post (device, sync tiny)", fwd_post)

    # --- forward only (no post chain) ---
    def fwd_only():
        lg, qk = E._forward_with_alignment(eng.params, cfg, ten_heads, tokens_d, xa)
        sync(qk[:, 0, 0, 0])

    timed("_forward_with_alignment (device)", fwd_only)

    # --- matrix pull (fresh device array each rep: jax.Array caches its
    # host copy after the first np.asarray, which would time a no-op) ---
    def pull():
        _, m_d = fwd_post()
        np.asarray(m_d)

    timed("matrix pull (B,S,T) f32 -> host (incl fwd)", pull)

    # --- native DTW on realistic slices ---
    _, m_d = fwd_post()
    m = np.asarray(m_d)

    def dtw_all():
        for i in range(B):
            E.dtw_path(-m[i, start : start + n_text + 1, :750].astype(np.float64))

    timed("native DTW x8 (host)", dtw_all)


def model_sot(model):
    from faster_whisper_tpu.tokenizer import Tokenizer

    tok = Tokenizer(
        model.hf_tokenizer, model.model.is_multilingual,
        task="transcribe", language="en",
    )
    return tok.sot_sequence


if __name__ == "__main__":
    main()
