"""Corpus BLEU (multi-bleu.perl semantics).

Re-designs the reference's BLEU scoring (vendored ``multi-bleu.perl`` or
Python equivalent — SURVEY.md C18): modified n-gram precision up to 4-grams
with brevity penalty, computed corpus-level over tokenized hypotheses and
references. Pure host-side Python.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import List, Sequence, Tuple


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def corpus_bleu(
    hypotheses: Sequence[Sequence[str]],
    references: Sequence[Sequence[str]],
    max_n: int = 4,
) -> float:
    """BLEU in [0, 100], multi-bleu style (single reference per sentence)."""
    if len(hypotheses) != len(references):
        raise ValueError("hypothesis/reference count mismatch")
    matches = [0] * max_n
    totals = [0] * max_n
    hyp_len = 0
    ref_len = 0
    for hyp, ref in zip(hypotheses, references):
        hyp_len += len(hyp)
        ref_len += len(ref)
        for n in range(1, max_n + 1):
            h = _ngrams(hyp, n)
            r = _ngrams(ref, n)
            totals[n - 1] += max(len(hyp) - n + 1, 0)
            matches[n - 1] += sum(min(c, r[g]) for g, c in h.items())
    if hyp_len == 0 or matches[0] == 0:
        return 0.0
    log_prec = 0.0
    for n in range(max_n):
        if totals[n] == 0 or matches[n] == 0:
            # multi-bleu returns 0 when any n-gram order has no matches
            return 0.0
        log_prec += math.log(matches[n] / totals[n])
    log_prec /= max_n
    bp = min(0.0, 1.0 - ref_len / hyp_len)
    return 100.0 * math.exp(bp + log_prec)
