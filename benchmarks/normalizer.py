"""English text normalization for WER scoring.

A self-contained implementation of the standard ASR English normalizer
behavior (the reference ships openai-whisper's EnglishTextNormalizer
spelling table as benchmark/normalizer.json and applies it via the
evaluate/transformers stack): lowercase, bracketed/parenthesized
annotations removed, common contractions and British/American spelling
variants folded, punctuation stripped, whitespace collapsed.
"""

import json
import os
import re

_CONTRACTIONS = {
    "won't": "will not",
    "can't": "can not",
    "shan't": "shall not",
    "cannot": "can not",
    "let's": "let us",
    "ain't": "aint",
    "y'all": "you all",
    "wanna": "want to",
    "gonna": "going to",
    "gotta": "got to",
    "gimme": "give me",
    "'cause": "because",
}

_SUFFIX_RULES = [
    (re.compile(r"\b(\w+)n't\b"), r"\1 not"),
    (re.compile(r"\b(\w+)'re\b"), r"\1 are"),
    (re.compile(r"\b(\w+)'ve\b"), r"\1 have"),
    (re.compile(r"\b(\w+)'ll\b"), r"\1 will"),
    (re.compile(r"\b(\w+)'d\b"), r"\1 would"),
    (re.compile(r"\b(\w+)'m\b"), r"\1 am"),
    (re.compile(r"\b(he|she|it|that|there|who|what|where|when|how)'s\b"), r"\1 is"),
]


class EnglishTextNormalizer:
    def __init__(self, spelling_json: str = None):
        self.spelling = {}
        if spelling_json is None:
            candidate = os.path.join(os.path.dirname(__file__), "normalizer.json")
            if os.path.exists(candidate):
                spelling_json = candidate
        if spelling_json and os.path.exists(spelling_json):
            with open(spelling_json) as f:
                self.spelling = json.load(f)

    def __call__(self, text: str) -> str:
        text = text.lower()
        text = re.sub(r"[<\[][^>\]]*[>\]]", "", text)  # <tags>, [annotations]
        text = re.sub(r"\(([^)]+?)\)", "", text)  # (parenthesized)
        for src, dst in _CONTRACTIONS.items():
            text = text.replace(src, dst)
        for pattern, repl in _SUFFIX_RULES:
            text = pattern.sub(repl, text)
        text = re.sub(r"'s\b", " s", text)  # possessives
        text = re.sub(r"[^\w\s']", " ", text)  # punctuation -> space
        text = text.replace("'", "")
        words = [self.spelling.get(w, w) for w in text.split()]
        return " ".join(words)
