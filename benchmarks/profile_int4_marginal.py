#!/usr/bin/env python
"""int8 vs int4 decode-step marginal at the bench shapes.

End-to-end wall-clock through a congested tunnel swings +-2 s run to
run, so this isolates the per-iteration device cost the way
profile_step.py does: time the SAME compiled beam program at two traced
max_length values (the step count is data-dependent inside one program,
so both points share one executable per compute type) and divide the
difference by the step delta.  Tunnel constants (dispatch, sync fetch)
cancel in the subtraction.
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


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_model

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    B, beam, reps = 8, 5, 5
    lo_steps, hi_steps = 8, 128

    for ct in ("int8", "int4"):
        model = build_model("large-v3", ct)
        eng = model.model
        xa = jnp.zeros((B, 1500, 1280), jnp.bfloat16)
        prompt = [eng.sot_id, eng.sot_id + 1, eng.sot_id + 2, 50364]

        def run(steps):
            res = eng.generate(
                xa, [prompt] * B, beam_size=beam,
                max_length=len(prompt) + steps, return_scores=True,
            )
            return res

        def timed(steps):
            run(steps)  # compile/load + warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                run(steps)
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = timed(lo_steps), timed(hi_steps)
        marg = (t_hi - t_lo) / (hi_steps - lo_steps) * 1e3
        print(
            f"{ct}: {lo_steps} steps {t_lo*1e3:.0f} ms, {hi_steps} steps "
            f"{t_hi*1e3:.0f} ms -> marginal {marg:.2f} ms/step"
        )


if __name__ == "__main__":
    main()
