"""Peak memory benchmark: host RSS + device HBM.

Equivalent of the reference's benchmark/memory_benchmark.py:28-93 (RAM via
memory_profiler, GPU memory via py3nvml polling); on TPU we sample host RSS
from /proc and read live/peak HBM from JAX's memory_stats().
"""

import threading
import time

from utils import base_parser, build_benchmark_model, get_audio


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return 0.0


class PeakSampler(threading.Thread):
    def __init__(self, interval=0.1):
        super().__init__(daemon=True)
        self.interval = interval
        self.peak_rss = 0.0
        self.peak_hbm = 0
        self.running = True

    def run(self):
        import jax

        device = jax.devices()[0]
        while self.running:
            self.peak_rss = max(self.peak_rss, rss_mb())
            stats = getattr(device, "memory_stats", lambda: None)() or {}
            used = stats.get("bytes_in_use", stats.get("bytes_used", 0))
            peak = stats.get("peak_bytes_in_use", used)
            self.peak_hbm = max(self.peak_hbm, peak or 0)
            time.sleep(self.interval)


def main():
    args = base_parser().parse_args()

    sampler = PeakSampler()
    sampler.start()

    model = build_benchmark_model(args.model, args.compute_type)
    audio = get_audio(args.minutes)

    from faster_whisper_tpu.transcribe import BatchedInferencePipeline

    pipeline = BatchedInferencePipeline(model)
    segments, _ = pipeline.transcribe(
        audio, language="en", beam_size=args.beam_size, batch_size=args.batch_size
    )
    for _ in segments:
        pass

    sampler.running = False
    sampler.join(timeout=2)
    print(f"peak host RSS: {sampler.peak_rss:.0f} MB")
    if sampler.peak_hbm:
        print(f"peak device HBM: {sampler.peak_hbm / 1e6:.0f} MB")
    else:
        print("peak device HBM: n/a (memory_stats not exposed by this runtime)")


if __name__ == "__main__":
    main()
