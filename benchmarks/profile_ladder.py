#!/usr/bin/env python
"""Phase breakdown of the sequential full-fallback-ladder path (warm).

Round-4 recorded 4.32 s warm for 95 s audio with the batched rung tail
(benchmarks/README.md bench tail row).  The VERDICT round-3 target was
"warm ladder <= ~3 s"; this script measures whether that is reachable or
whether 4.32 s already sits at the device floor:

  per window (all rungs fire, random weights):
    beam decode   B=1 K=5, 128 steps   (the T=0 rung)
    batched tail  B=5 K=5, 128 steps   (all five sampling rungs, one call)
  x 4 windows, serially dependent through the seek loop.

It times each rung call in isolation (warm), then the end-to-end ladder
transcribe, and prints the accounted split: if beam+tail device time
explains the total, the number is the floor for the reference's
decision semantics (rungs evaluated in order, first acceptable wins;
merging the beam into the speculative batched call would regress the
common no-ladder case ~2x, so it is not done).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_model, load_audio_13min

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    model = build_model("large-v3", "int8")
    audio = load_audio_13min()[: 95 * 16000]
    temps = [0.0, 0.2, 0.4, 0.6, 0.8, 1.0]

    def ladder_once():
        t0 = time.perf_counter()
        segs, _ = model.transcribe(
            audio,
            language="en",
            beam_size=5,
            max_new_tokens=128,
            temperature=temps,
        )
        n = sum(1 for _ in segs)
        return time.perf_counter() - t0, n

    cold, n = ladder_once()
    warm = min(ladder_once()[0] for _ in range(3))
    print(f"# ladder cold {cold:.2f}s warm {warm:.2f}s ({n} segs)")

    # isolated rung costs at the exact ladder shapes (warm)
    eng = model.model
    xa1 = jnp.zeros((1, 1500, 1280), jnp.bfloat16)
    prompt = [eng.sot_id, eng.sot_id + 1, eng.sot_id + 2, 50364]
    kw = dict(max_length=len(prompt) + 128, return_scores=True,
              return_no_speech_prob=True)

    def timed(fn, reps=3):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    beam = timed(lambda: eng.generate(xa1, [prompt], beam_size=5, **kw))
    xa5 = jnp.zeros((5, 1500, 1280), jnp.bfloat16)
    tail = timed(
        lambda: eng.generate(
            xa5, [prompt] * 5, beam_size=1, num_hypotheses=5,
            sampling_topk=0, sampling_temperature=[0.2, 0.4, 0.6, 0.8, 1.0],
            **kw,
        )
    )
    n_windows = 4
    accounted = n_windows * (beam + tail)
    print(
        f"# beam(B=1,K=5) {beam*1e3:.0f} ms, batched tail(B=5,K=5) "
        f"{tail*1e3:.0f} ms -> {n_windows} windows x "
        f"{(beam+tail)*1e3:.0f} ms = {accounted:.2f}s accounted "
        f"of {warm:.2f}s warm ({100*accounted/warm:.0f}%)"
    )


if __name__ == "__main__":
    main()
