import pytest

from faster_whisper_tpu.testing import build_synthetic_tokenizer, synthetic_vocab_size
from faster_whisper_tpu.tokenizer import _LANGUAGE_CODES, Tokenizer


@pytest.fixture(scope="module")
def hf_tok():
    return build_synthetic_tokenizer()


@pytest.fixture(scope="module")
def tokenizer(hf_tok):
    return Tokenizer(hf_tok, multilingual=True, task="transcribe", language="en")


def test_special_token_layout(tokenizer):
    # Whisper layout: consecutive specials after the base vocabulary.
    assert tokenizer.sot == tokenizer.eot + 1
    langs_start = tokenizer.sot + 1
    assert tokenizer.translate == langs_start + len(_LANGUAGE_CODES)
    assert tokenizer.transcribe == tokenizer.translate + 1
    assert tokenizer.sot_lm == tokenizer.transcribe + 1
    assert tokenizer.sot_prev == tokenizer.sot_lm + 1
    assert tokenizer.no_speech == tokenizer.sot_prev + 1
    assert tokenizer.no_timestamps == tokenizer.no_speech + 1
    assert tokenizer.timestamp_begin == tokenizer.no_timestamps + 1


def test_vocab_size(hf_tok):
    assert hf_tok.get_vocab_size() == synthetic_vocab_size()


def test_sot_sequence(tokenizer, hf_tok):
    assert tokenizer.sot_sequence == [
        tokenizer.sot,
        hf_tok.token_to_id("<|en|>"),
        tokenizer.transcribe,
    ]
    mono = Tokenizer(hf_tok, multilingual=False)
    assert mono.sot_sequence == [mono.sot]
    assert mono.language_code == "en"


def test_invalid_task_and_language(hf_tok):
    with pytest.raises(ValueError):
        Tokenizer(hf_tok, multilingual=True, task="summarize", language="en")
    with pytest.raises(ValueError):
        Tokenizer(hf_tok, multilingual=True, task="transcribe", language="xx")


def test_encode_decode_roundtrip(tokenizer):
    text = " And so my fellow Americans"
    ids = tokenizer.encode(text)
    assert tokenizer.decode(ids) == text
    # decode filters special tokens
    assert tokenizer.decode(ids + [tokenizer.eot, tokenizer.sot]) == text


def test_decode_with_timestamps(tokenizer):
    tb = tokenizer.timestamp_begin
    ids = [tb] + tokenizer.encode(" hi") + [tb + 50]
    out = tokenizer.decode_with_timestamps(ids)
    assert out == "<|0.00|> hi<|1.00|>"


def test_non_speech_tokens(tokenizer):
    sup = tokenizer.non_speech_tokens
    assert sup == tuple(sorted(set(sup)))
    # word-initial hyphen and apostrophe are suppressed
    assert tokenizer.encode(" -")[0] in sup
    assert tokenizer.encode(" '")[0] in sup
    # single-token symbols are suppressed
    for sym in ['"', "#", "(", ")"]:
        ids = tokenizer.encode(sym)
        if len(ids) == 1:
            assert ids[0] in sup
    # basic punctuation is kept
    for sym in [",", ".", "?", "!"]:
        ids = tokenizer.encode(sym)
        if len(ids) == 1:
            assert ids[0] not in sup


def test_split_tokens_on_spaces(tokenizer):
    ids = tokenizer.encode(" hello world, again")
    words, word_tokens = tokenizer.split_tokens_on_spaces(ids)
    assert words == [" hello", " world", ",", " again"]
    flat = [t for toks in word_tokens for t in toks]
    assert flat == ids


def test_split_tokens_on_unicode_multibyte(hf_tok):
    tok = Tokenizer(hf_tok, multilingual=True, task="transcribe", language="ja")
    ids = tok.encode("こんにちは")
    words, word_tokens = tok.split_to_word_tokens(ids)
    # every piece must be valid unicode (no replacement chars)
    assert "".join(words) == "こんにちは"
    assert all("�" not in w for w in words)
    flat = [t for toks in word_tokens for t in toks]
    assert flat == ids


def test_split_handles_eot(tokenizer):
    ids = tokenizer.encode(" ok then") + [tokenizer.eot]
    words, word_tokens = tokenizer.split_to_word_tokens(ids)
    assert words[-1] == "<|endoftext|>" or word_tokens[-1][-1] == tokenizer.eot
