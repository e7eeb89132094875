"""Word error rate via token-level Levenshtein distance."""

from typing import List, Sequence


def _edit_distance(ref: Sequence[str], hyp: Sequence[str]) -> int:
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            sub = prev[j - 1] + (ref[i - 1] != hyp[j - 1])
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[m]


def word_error_rate(references: List[str], hypotheses: List[str]) -> float:
    """Corpus-level WER: total edits / total reference words."""
    assert len(references) == len(hypotheses)
    edits = 0
    words = 0
    for ref, hyp in zip(references, hypotheses):
        r, h = ref.split(), hyp.split()
        edits += _edit_distance(r, h)
        words += len(r)
    return edits / max(words, 1)
