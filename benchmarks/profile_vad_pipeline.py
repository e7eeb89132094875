"""Pipelined sliced upload+VAD vs the serial upload -> forward prefix.

The headline floor table (benchmarks/README.md bench row) charges ~1.0 s
uncontended (2-4 s under pool load) to the serial PCM upload + VAD
round-trip that precedes every batched transcribe: the transfer must
finish before the whole-buffer forward starts.  vad.upload_with_vad
slices the transfer on the UPLOAD_BUCKET grid and dispatches the VAD
forward per slice with carried LSTM state, so slice k's compute overlaps
slice k+1's transfer.  This profiler measures both forms end-to-end
(until the probabilities are on host and the f32 PCM copy is ready on
device) on the real chip.

MEASURED (2026-08-19, 13-min audio, 5 repeats):
  serial:    min 1.304 s  med 1.713 s
  pipelined: min 1.586 s  med 2.476 s
The pipelined form LOSES on the tunneled chip: ~12 slice steps each add
a dispatch round-trip, and the serial prefix's cost is mostly tunnel
RTT/queue drain (device forward is ~45 ms), so slicing multiplies the
dominant term.  FWT_PIPELINED_VAD therefore defaults off; the path is
kept for direct-attached deployments where dispatch is microseconds.

Usage: python benchmarks/profile_vad_pipeline.py [repeats]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()

import numpy as np


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import jax

    import bench
    from faster_whisper_tpu.models.silero import _WINDOW
    from faster_whisper_tpu.ops.mel import upload_audio
    from faster_whisper_tpu.vad import get_vad_model, upload_with_vad

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    audio = bench.load_audio_13min()
    model = get_vad_model()
    expected_windows = len(audio) // _WINDOW + 1

    def serial():
        t0 = time.perf_counter()
        dev = upload_audio(audio)
        probs = model(dev)[:expected_windows]
        np.asarray(probs)
        dev.block_until_ready()
        return time.perf_counter() - t0

    def pipelined():
        t0 = time.perf_counter()
        dev, probs_dev = upload_with_vad(audio)
        np.asarray(probs_dev)[:expected_windows]
        dev.block_until_ready()
        return time.perf_counter() - t0

    # warm both program sets (+ backend session)
    serial()
    pipelined()

    for name, fn in (("serial", serial), ("pipelined", pipelined)):
        times = [fn() for _ in range(repeats)]
        print(
            f"{name}: min {min(times):.3f}s  "
            f"med {sorted(times)[len(times) // 2]:.3f}s  "
            f"all {[round(t, 3) for t in times]}"
        )


if __name__ == "__main__":
    main()
