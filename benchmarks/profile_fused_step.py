"""Profile the production _gen_decoder_step: fused Pallas kernel vs XLA.

Runs STEPS production decode steps (self-attn via ops/beam_attention.py,
cross-attn + MLP + logits in XLA) inside one jit at bench shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()  # may re-exec before jax boots

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.generation.generate import (
    _expand_caches,
    _gen_decoder_step,
)
from faster_whisper_tpu.models.config import CONFIGS
from faster_whisper_tpu.models.load import random_params_device
from faster_whisper_tpu.models.model import decoder_prefill
from faster_whisper_tpu.ops.quant import quantize_params

B, K, P, CTX, STEPS = 8, 5, 32, 192, 128
MODEL = os.environ.get("PROF_MODEL", "large-v3")
QUANT = os.environ.get("PROF_QUANT", "1") == "1"


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(out))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def build(config, fused):
    def loop(params, self_k, self_v, cross_k, cross_v, anc):
        def step(s, carry):
            self_k, self_v, acc = carry
            token = jnp.full((B, K), 100, jnp.int32)
            pos = jnp.full((B, K), 4, jnp.int32) + s
            logits, self_k, self_v = _gen_decoder_step(
                params, config, token, pos, pos[:, 0],
                self_k, self_v, cross_k, cross_v, anc, fused=fused,
            )
            return self_k, self_v, acc + jnp.sum(logits[:, 0, :8])

        _, _, acc = jax.lax.fori_loop(
            0, STEPS, step, (self_k, self_v, jnp.float32(0))
        )
        return acc

    return jax.jit(loop)


def main():
    config = CONFIGS[MODEL]
    params = random_params_device(config, seed=0, dtype="bfloat16")
    if QUANT:
        params = quantize_params(params)

    rng = np.random.default_rng(0)
    xa = jnp.asarray(
        rng.standard_normal((B, 1500, config.n_text_state)), jnp.bfloat16
    )
    prompt = jnp.zeros((B, P), jnp.int32)
    plen = jnp.full((B,), 4, jnp.int32)
    gather = jnp.stack([plen - 1, jnp.zeros_like(plen)], axis=1)
    _, cache0 = decoder_prefill(params, config, prompt, plen, xa, gather, ctx=CTX)
    self_k, self_v, cross_k, cross_v = _expand_caches(cache0, K, QUANT)
    anc = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, CTX)
    )

    for fused in (False, True):
        fn = build(config, fused)
        t = timeit(fn, params, self_k, self_v, cross_k, cross_v, anc)
        name = "fused-pallas" if fused else "xla-step"
        print(f"{name:14s}: {t*1e3:7.1f} ms -> {t/STEPS*1e3:6.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
