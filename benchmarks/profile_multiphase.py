"""Laddered (multi-phase) ctx decode vs single-phase at bench shapes.

The self-KV table read scales with the table size (~0.63 GB/step of the
~2.5 GB/step total at ctx=192, int8 KV), so running the first 32 steps
on a 64-slot table and the next 64 on 128 slots (GenOptions.multi_phase,
phases bucketed by prompt width and doubling — generate._ctx_phases)
saves ~(32*2/3 + 64*1/3)*0.63 GB per 128-step call.  This script times
the FULL beam_search program both ways at the headline bench's decode
configuration (large-v3, int8 weights + int8 KV, fused kernels, B=8,
K=5, P=32, ctx=192, 128 steps) and checks output equality on the chip.

Run on the real chip: python benchmarks/profile_multiphase.py
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
    _ctx_phases,
    beam_search,
)
from faster_whisper_tpu.generation.processors import (
    ProcessorOptions,
    TokenMeta,
)
from faster_whisper_tpu.models.config import CONFIGS
from faster_whisper_tpu.models.load import random_params_device
from faster_whisper_tpu.ops.quant import quantize_params

B = int(os.environ.get("PROF_B", "8"))
K = int(os.environ.get("PROF_K", "5"))
P = 32
CTX = int(os.environ.get("PROF_CTX", "192"))
STEPS = int(os.environ.get("PROF_STEPS", "128"))
MODEL = os.environ.get("PROF_MODEL", "large-v3")


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


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
    prompt_len = np.full((B,), 4, np.int32)
    sot_pos = np.zeros((B,), np.int32)

    outs = {}
    for mp in (False, True):
        gen_opts = GenOptions(
            beam_size=K, num_finished=K, length_penalty=1.0, ctx_cap=CTX,
            kv_int8=True, fused_attn=True, multi_phase=mp,
        )
        print(f"multi_phase={mp}: phases={_ctx_phases(P, CTX, gen_opts)}",
              flush=True)

        def run():
            return beam_search(
                params, config, gen_opts, proc_opts, meta, xa,
                jnp.asarray(prompt), jnp.asarray(prompt_len),
                jnp.asarray(sot_pos), jnp.asarray(4 + STEPS, jnp.int32),
            )

        t0 = time.perf_counter()
        out = run()
        sync(out[5])
        print(f"  compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = run()
            sync(out[5])
            best = min(best, time.perf_counter() - t0)
        outs[mp] = out
        print(f"  full beam_search ({STEPS} steps): {best*1e3:.1f} ms "
              f"-> {best/STEPS*1e3:.2f} ms/step", flush=True)

    cur_len = np.asarray(outs[False][5])
    a, b = np.asarray(outs[False][0]), np.asarray(outs[True][0])
    same = all(
        np.array_equal(a[i, : cur_len[i]], b[i, : cur_len[i]])
        for i in range(a.shape[0])
    )
    scores_same = np.allclose(
        np.asarray(outs[False][4]), np.asarray(outs[True][4]),
        rtol=1e-4, atol=1e-5,
    )
    print(f"output parity on chip: hist={'OK' if same else 'DIFF'} "
          f"scores={'OK' if scores_same else 'DIFF'}", flush=True)


if __name__ == "__main__":
    main()
