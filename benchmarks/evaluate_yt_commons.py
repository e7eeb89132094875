"""YouTube-Commons ASR evaluation (long-form WER).

Equivalent of the reference's benchmark/evaluate_yt_commons.py: stream
the mobiuslabsgmbh/youtube-commons-asr-eval manifest, download each
video's audio track, transcribe with the batched pipeline
(without_timestamps, batch_size 8), normalize both sides with the
English text normalizer, and report corpus WER.  The reference's
published row for this benchmark is distil-large-v3 fp16 batch=16 at
WER 13.527 (reference: README.md:36-37).

Requires network access (datasets + a YouTube downloader) and a real
checkpoint; everything scoring-related (normalizer, WER) is
self-contained and unit-tested offline (tests/test_wer.py).
"""

import json

from io import BytesIO

from normalizer import EnglishTextNormalizer
from utils import base_parser, build_benchmark_model
from wer import word_error_rate


def iter_rows(audio_numb=None):
    from datasets import load_dataset  # network required

    try:
        from pytubefix import YouTube
        from pytubefix.exceptions import VideoUnavailable
    except ImportError as e:  # pragma: no cover - optional downloader
        raise SystemExit(
            "evaluate_yt_commons.py needs a YouTube downloader "
            "(pip install pytubefix) and network access"
        ) from e

    from faster_whisper_tpu import decode_audio

    dataset = load_dataset("mobiuslabsgmbh/youtube-commons-asr-eval", streaming=True)
    for i, row in enumerate(dataset["test"]):
        if audio_numb is not None and i >= audio_numb:
            return
        buffer = BytesIO()
        try:
            stream = (
                YouTube(row["link"])
                .streams.filter(only_audio=True, mime_type="audio/mp4")
                .order_by("bitrate")
                .desc()
                .last()
            )
            stream.stream_to_buffer(buffer)
            buffer.seek(0)
            audio = decode_audio(buffer)
        except VideoUnavailable:
            print(f"Failed to download: {row['link']}")
            continue
        yield audio, row["text"][0] if isinstance(row["text"], list) else row["text"]


def main():
    parser = base_parser()
    parser.add_argument(
        "--audio-numb",
        type=int,
        default=None,
        help="number of validation audio files to evaluate (default: all)",
    )
    args = parser.parse_args()

    from faster_whisper_tpu import BatchedInferencePipeline

    model = build_benchmark_model(args.model, args.compute_type)
    pipeline = BatchedInferencePipeline(model)
    normalizer = EnglishTextNormalizer()

    refs, hyps = [], []
    for audio, ref_text in iter_rows(args.audio_numb):
        segments, _ = pipeline.transcribe(
            audio, batch_size=8, word_timestamps=False, without_timestamps=True
        )
        hyps.append(normalizer("".join(s.text for s in segments)))
        refs.append(normalizer(ref_text))

    print(json.dumps({"wer": word_error_rate(refs, hyps), "n": len(refs)}))


if __name__ == "__main__":
    main()
