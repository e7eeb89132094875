"""Encoder + mel + prefill timing at bench shapes (large-v3, int8, B=8).

The headline bench spends ~1.7 s in 4 batched encodes of (8, 128, 3000)
mels; this isolates where that goes: mel fronted, conv stem, transformer
stack, and the decoder prefill that follows each encode.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.models import model as M
from faster_whisper_tpu.models.config import CONFIGS
from faster_whisper_tpu.models.load import random_params_device
from faster_whisper_tpu.models.model import decoder_prefill
from faster_whisper_tpu.ops.quant import quantize_params

B = int(os.environ.get("PROF_B", "8"))
MODEL = os.environ.get("PROF_MODEL", "large-v3")
REPS = 8


def sync(x):
    return float(jnp.sum(jnp.asarray(x[:1] if hasattr(x, "shape") else x, jnp.float32)))


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main():
    config = CONFIGS[MODEL]
    params = random_params_device(config, seed=0, dtype="bfloat16")
    params = quantize_params(params)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((B, config.n_mels, 3000)), jnp.float32
    )

    enc = jax.jit(lambda p, m: M.encode(p, config, m))
    t = timeit(enc, params, mel)
    print(f"encode (B={B}, 3000 frames): {t*1e3:.1f} ms")

    xa = enc(params, mel)
    xa = jax.block_until_ready(xa)

    prompt = jnp.zeros((B, 32), jnp.int32)
    plen = jnp.full((B,), 4, jnp.int32)
    gather = jnp.stack([plen - 1, jnp.zeros_like(plen)], axis=1)

    pre = jax.jit(
        lambda w, p, pl, g, x: decoder_prefill(w, config, p, pl, x, g, ctx=192)[0]
    )
    t = timeit(pre, params, prompt, plen, gather, xa)
    print(f"decoder prefill (P=32, ctx=192): {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
