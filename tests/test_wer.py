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


def test_normalizer_basic():
    norm = EnglishTextNormalizer()
    assert norm("Hello, World!") == "hello world"
    assert norm("I can't do it.") == "i can not do it"
    assert norm("they're won't we've") == "they are will not we have"
    assert norm("[noise] okay (laughs) then") == "okay then"
    assert norm("The CAT's  whiskers") == "the cat s whiskers"
