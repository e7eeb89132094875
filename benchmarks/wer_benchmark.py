"""Word-error-rate benchmark on LibriSpeech clean validation.

Equivalent of the reference's benchmark/wer_benchmark.py (datasets +
evaluate + EnglishTextNormalizer).  Requires network access for the
dataset and a real checkpoint; the WER computation and text normalizer
below are self-contained and unit-tested offline (tests/test_wer.py).
"""

import json

from utils import base_parser, build_benchmark_model
from normalizer import EnglishTextNormalizer
from wer import word_error_rate


def main():
    parser = base_parser()
    parser.add_argument("--num-samples", type=int, default=500)
    args = parser.parse_args()

    from datasets import load_dataset  # network required

    dataset = load_dataset("librispeech_asr", "clean", split="validation")
    model = build_benchmark_model(args.model, args.compute_type)
    normalizer = EnglishTextNormalizer()

    refs, hyps = [], []
    for i, sample in enumerate(dataset):
        if i >= args.num_samples:
            break
        audio = sample["audio"]["array"].astype("float32")
        segments, _ = model.transcribe(audio, language="en", beam_size=args.beam_size)
        text = "".join(s.text for s in segments)
        refs.append(normalizer(sample["text"]))
        hyps.append(normalizer(text))

    print(json.dumps({"wer": word_error_rate(refs, hyps), "n": len(refs)}))


if __name__ == "__main__":
    main()
