import sys
import os

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks")
)

from normalizer import EnglishTextNormalizer  # noqa: E402
from wer import word_error_rate  # noqa: E402


def test_wer_identical():
    assert word_error_rate(["hello world"], ["hello world"]) == 0.0


def test_wer_substitution():
    assert word_error_rate(["the cat sat"], ["the dog sat"]) == 1 / 3


def test_wer_insert_delete():
    assert word_error_rate(["a b c"], ["a c"]) == 1 / 3
    assert word_error_rate(["a c"], ["a b c"]) == 1 / 2


def test_wer_corpus_weighting():
    wer = word_error_rate(["one two three four", "x"], ["one two three four", "y"])
    assert wer == 1 / 5


def test_normalizer_matches_reference_semantics():
    """Golden pairs pinning openai-EnglishTextNormalizer behavior (the
    normalization the reference's WER benchmark applies, including the
    number/ordinal/currency spelling-to-digits conversion and the
    British->American spelling table from the vendored normalizer.json)."""
    norm = EnglishTextNormalizer()
    cases = [
        ("Hello, World!", "hello world"),
        ("I can't do it.", "i can not do it"),
        ("they're won't we've", "they are will not we have"),
        ("[noise] okay (laughs) then", "okay then"),
        ("The CAT's  whiskers", "the cat is whiskers"),
        ("one hundred and twenty-three dollars", "$123"),
        ("the twenty-first of May, nineteen sixty-three", "the 21st of may 1963"),
        ("Mr. Brown lives on the 3rd floor", "mister brown lives on the 3rd floor"),
        ("I paid $12.50 for two apples", "i paid $12.50 for 2 apples"),
        (
            "it's the colour and flavour of the aeroplane",
            "it is the color and flavor of the airplane",
        ),
        ("he was born in nineteen eighty-four", "he was born in 1984"),
        ("zero point five percent", "0.5%"),
    ]
    for raw, want in cases:
        assert norm(raw) == want, raw
