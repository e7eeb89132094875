"""Megakernel decode step vs the per-layer fused production step.

Times `_gen_decoder_step` (embedding + layers + final LN + logits head)
at large-v3 decode shapes on the real chip, per-layer fused kernels vs
the whole-decoder megakernel, iterated inside one jitted fori_loop like
the production decode loop.  Also cross-checks the two paths' logits
ranking on shared random state.

Env: MODEL=large|distil (default large), STEPS (default 64).
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

from faster_whisper_tpu.generation.generate import _gen_decoder_step
from faster_whisper_tpu.models.config import WhisperConfig
from faster_whisper_tpu.models.load import random_params
from faster_whisper_tpu.ops.mega_decoder import pack_mega
from faster_whisper_tpu.ops.quant import QuantKV, quantize_params

MODEL = os.environ.get("MODEL", "large")
STEPS = int(os.environ.get("STEPS", "64"))
B, K, CTX, T = 8, 5, 192, 1500

if MODEL == "large":
    L, H, DM = 32, 20, 1280
else:  # distil-large-v3
    L, H, DM = 2, 20, 1280
D = DM // H

cfg = WhisperConfig(
    name=f"bench-{MODEL}", n_mels=128, n_audio_ctx=T, n_audio_state=DM,
    n_audio_head=H, n_audio_layer=2, n_vocab=51866, n_text_ctx=448,
    n_text_state=DM, n_text_head=H, n_text_layer=L, multilingual=True,
)
params = quantize_params(random_params(cfg, dtype="bfloat16"))
mega = pack_mega(params)

rng = np.random.default_rng(0)
token = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, K)), jnp.int32)
pos_row = jnp.full((B,), 24, jnp.int32)
pos = jnp.broadcast_to(pos_row[:, None], (B, K))
anc = np.zeros((B, K, CTX), np.int32)
anc[:, :, :] = rng.integers(0, K, (B, K, CTX))
anc[:, :, 24] = np.arange(K, dtype=np.int32)[None, :]
anc = jnp.asarray(anc)

sdt = jnp.bfloat16
self_k = QuantKV(
    jnp.asarray(rng.integers(-127, 127, (L, B, H, K, CTX, D)), jnp.int8),
    jnp.asarray(rng.random((L, B, H, K, CTX)) * 0.02 + 0.001, sdt),
)
self_v = QuantKV(
    jnp.asarray(rng.integers(-127, 127, (L, B, H, K, CTX, D)), jnp.int8),
    jnp.asarray(rng.random((L, B, H, K, CTX)) * 0.02 + 0.001, sdt),
)
cross_k = QuantKV(
    jnp.asarray(rng.integers(-127, 127, (L, B, H, T, D)), jnp.int8),
    jnp.asarray(rng.random((L, B, H, 1, T)) * 0.02 + 0.001, sdt),
)
cross_v = QuantKV(
    jnp.asarray(rng.integers(-127, 127, (L, B, H, T, D)), jnp.int8),
    jnp.asarray(rng.random((L, B, H, 1, T)) * 0.02 + 0.001, sdt),
)


def bench(name, **kw):
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def run(token, self_k, self_v):
        def body(i, carry):
            sk, sv, acc = carry
            logits, sk, sv = _gen_decoder_step(
                params, cfg, token, pos, pos_row, sk, sv,
                cross_k, cross_v, anc, **kw,
            )
            return sk, sv, acc + jnp.sum(logits) * 1e-9

        sk, sv, acc = jax.lax.fori_loop(
            0, STEPS, body, (self_k, self_v, jnp.float32(0))
        )
        return acc

    t0 = time.perf_counter()
    float(run(token, self_k, self_v))
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(token, self_k, self_v))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / STEPS * 1e3:6.2f} ms/step")
    return best / STEPS


def main():
    order = os.environ.get("ORDER", "mega,fused").split(",")
    times = {}
    for name in order:
        print(f"--- {name} ---", flush=True)
        kw = {"fused": True}
        if name == "mega":
            kw["mega"] = mega
        times[name] = bench(name, **kw)
    if len(times) == 2:
        print(f"speedup: {times['fused'] / times['mega']:.2f}x")

    if os.environ.get("CHECK", "1") == "1":
        print("--- numerics cross-check ---", flush=True)
        lf, _, _ = _gen_decoder_step(
            params, cfg, token, pos, pos_row, self_k, self_v,
            cross_k, cross_v, anc, fused=True,
        )
        lm, _, _ = _gen_decoder_step(
            params, cfg, token, pos, pos_row, self_k, self_v,
            cross_k, cross_v, anc, fused=True, mega=mega,
        )
        agree = (
            np.argmax(np.asarray(lf), -1) == np.argmax(np.asarray(lm), -1)
        )
        print(f"top-1 agreement fused vs mega: {agree.mean():.3f}")


if __name__ == "__main__":
    main()
