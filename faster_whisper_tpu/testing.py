"""Hermetic test/bench helpers.

This environment has no network egress, so the real Whisper vocabularies
(tokenizer.json from the HF Hub) may be unavailable.  ``build_synthetic_tokenizer``
constructs a real ``tokenizers.Tokenizer`` with the exact Whisper
special-token *layout* (eot, sot, 100 language tokens, translate/transcribe,
sot_lm, sot_prev, no_speech, no_timestamps, then 1501 timestamp tokens) over
a byte-level base vocabulary, so every decode-policy code path — suppress
sets, timestamp rules, prompts, word splitting — can be exercised without
downloads.  Token *ids* differ from the production vocabulary; behavior
does not.
"""

from typing import Optional

from faster_whisper_tpu.tokenizer import _LANGUAGE_CODES


def build_synthetic_tokenizer(n_timestamps: int = 1501, base_vocab: int = 256):
    """Build a byte-level tokenizer with the Whisper special-token layout.

    Base vocabulary: the 256 GPT-2 byte symbols (so any text round-trips),
    optionally padded with unused filler entries up to ``base_vocab`` (use
    base_vocab=50257 to reproduce the production large-v3 vocabulary size of
    51866 — important for honest logits-matmul benchmarking), followed by
    the Whisper specials in canonical order.
    """
    from tokenizers import AddedToken, Tokenizer, decoders, pre_tokenizers
    from tokenizers.models import BPE

    byte_alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(byte_alphabet))}
    for i in range(256, base_vocab):
        vocab[f"<unused{i}>"] = i

    tok = Tokenizer(BPE(vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()

    specials = ["<|endoftext|>", "<|startoftranscript|>"]
    specials += ["<|%s|>" % code for code in _LANGUAGE_CODES]
    specials += [
        "<|translate|>",
        "<|transcribe|>",
        "<|startoflm|>",
        "<|startofprev|>",
        "<|nospeech|>",
        "<|notimestamps|>",
    ]
    specials += ["<|%.2f|>" % (0.02 * i) for i in range(n_timestamps)]

    tok.add_special_tokens(
        [AddedToken(s, special=True, normalized=False) for s in specials]
    )
    return tok


def synthetic_vocab_size(n_timestamps: int = 1501, base_vocab: int = 256) -> int:
    return base_vocab + 2 + len(_LANGUAGE_CODES) + 6 + n_timestamps


def build_test_model(seed: int = 0, dtype: str = "float32"):
    """A complete WhisperModel over the micro config + synthetic tokenizer.

    Text output is meaningless (random weights) but every pipeline stage —
    features, encoder, generation, fallback, timestamps, VAD, batching —
    runs exactly as it would with production weights.
    """
    from faster_whisper_tpu.models.config import tiny_test_config
    from faster_whisper_tpu.models.load import random_params
    from faster_whisper_tpu.transcribe import WhisperModel

    config = tiny_test_config()
    params = random_params(config, seed=seed, dtype=dtype)
    return WhisperModel.from_parts(params, config, build_synthetic_tokenizer())
