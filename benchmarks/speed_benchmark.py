"""Wall-clock transcription benchmark (min of repeats).

Equivalent of the reference's benchmark/speed_benchmark.py:21-27 (timeit
of a full transcribe, min over runs) on TPU.
"""

import timeit

from utils import base_parser, build_benchmark_model, get_audio


def main():
    parser = base_parser()
    parser.add_argument("--repeat", type=int, default=3)
    parser.add_argument("--sequential", action="store_true",
                        help="use WhisperModel.transcribe instead of the batched pipeline")
    args = parser.parse_args()

    model = build_benchmark_model(args.model, args.compute_type)
    audio = get_audio(args.minutes)

    if args.sequential:
        def run():
            segments, _ = model.transcribe(
                audio, language="en", beam_size=args.beam_size
            )
            for _ in segments:
                pass
    else:
        from faster_whisper_tpu.transcribe import BatchedInferencePipeline

        pipeline = BatchedInferencePipeline(model)

        def run():
            segments, _ = pipeline.transcribe(
                audio,
                language="en",
                beam_size=args.beam_size,
                batch_size=args.batch_size,
            )
            for _ in segments:
                pass

    run()  # warmup/compile
    times = timeit.repeat(run, repeat=args.repeat, number=1)
    print(f"min execution time: {min(times):.3f}s (all: {[round(t, 2) for t in times]})")


if __name__ == "__main__":
    main()
