"""English text normalization for WER scoring — reference-comparable.

The reference's WER benchmark normalizes hypotheses and references with
openai-whisper's ``EnglishTextNormalizer`` (exposed by transformers) plus
the British→American spelling table it ships as ``benchmark/normalizer.json``
(reference: benchmark/wer_benchmark.py:8,27-29).  WER numbers are only
comparable to the reference's published 13.527 if the exact same
normalization runs here, so this module wraps the very same transformers
class with the vendored spelling table (``benchmarks/normalizer.json``,
pure data) — full number/ordinal/currency spelling-to-digits conversion
included, not an approximation.
"""

import json
import os

from transformers.models.whisper.english_normalizer import (
    EnglishTextNormalizer as _HFEnglishTextNormalizer,
)

_SPELLING_JSON = os.path.join(os.path.dirname(__file__), "normalizer.json")


class EnglishTextNormalizer(_HFEnglishTextNormalizer):
    """openai's EnglishTextNormalizer with the reference's spelling table."""

    def __init__(self, spelling_json: str = _SPELLING_JSON):
        with open(spelling_json) as f:
            spelling = json.load(f)
        super().__init__(spelling)
