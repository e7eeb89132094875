"""Locate the per-CALL overhead of the production beam program.

profile_step.py at 64 vs 128 steps shows the full beam_search has a
~280 ms fixed per-call cost (marginal step 6.43 ms) of which
prefill+cache-expand explains ~79 ms (profile_loop2.py part 0).  This
script asks the actionable question: is the remaining ~200 ms host-side
dispatch work that OVERLAPS when calls are queued back-to-back (the
batched pipeline dispatches batch i+1 before collecting batch i), or a
serial per-execution cost?

  single      : dispatch + sync, one call (the profile_step number)
  back2back x2: dispatch two calls, sync once at the end
  back2back x3: three

If back2back(n) ~= fixed + n * steps*marginal, dispatch overhead
pipelines away and the batched pipeline already hides it; if it is
~n * single, every call pays it serially on this backend.
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

from faster_whisper_tpu.generation.generate import GenOptions, beam_search
from faster_whisper_tpu.generation.processors import (
    ProcessorOptions,
    TokenMeta,
)
from faster_whisper_tpu.models.config import CONFIGS
from faster_whisper_tpu.models.load import random_params_device
from faster_whisper_tpu.ops.quant import quantize_params

B, K, P, CTX = 8, 5, 32, 192
STEPS = 128
MODEL = os.environ.get("PROF_MODEL", "large-v3")


def main():
    config = CONFIGS[MODEL]
    params = random_params_device(config, seed=0, dtype="bfloat16")
    params = quantize_params(params)

    meta = TokenMeta(
        eot=50257, timestamp_begin=50365, no_timestamps=50364,
        no_speech=50363, blank=(220,), vocab_size=config.n_vocab,
    )
    gen_opts = GenOptions(
        beam_size=K, num_finished=K, length_penalty=1.0, ctx_cap=CTX,
        kv_int8=True, fused_attn=True,
    )
    proc_opts = ProcessorOptions(
        suppress_blank=True, suppress_tokens=tuple(range(1, 40)),
        with_timestamps=True, max_initial_timestamp_index=50,
    )
    rng = np.random.default_rng(0)
    # distinct encoder states per queued call so nothing dedups
    xas = [
        jnp.asarray(
            rng.standard_normal((B, 1500, config.n_text_state)), jnp.bfloat16
        )
        for _ in range(3)
    ]
    prompt = np.zeros((B, P), np.int32)
    prompt[:, :4] = [50258, 50259, 50359, 50364]
    prompt_j = jnp.asarray(prompt)
    plen = jnp.asarray(np.full((B,), 4, np.int32))
    spos = jnp.asarray(np.zeros((B,), np.int32))
    ml = jnp.asarray(P + STEPS, jnp.int32)

    def call(xa):
        return beam_search(
            params, config, gen_opts, proc_opts, meta, xa, prompt_j, plen,
            spos, ml,
        )

    def sync(outs):
        return float(sum(jnp.sum(o[0]).astype(jnp.float32) for o in outs))

    sync([call(xas[0])])  # warm

    for n in (1, 2, 3):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [call(xas[i]) for i in range(n)]
            sync(outs)
            best = min(best, time.perf_counter() - t0)
        print(
            f"back2back x{n}: {best*1e3:8.1f} ms "
            f"({best*1e3/n:7.1f} ms/call, {best*1e3/n/STEPS:5.2f} ms/step)"
        )


if __name__ == "__main__":
    main()
