"""Word error rate: corpus WER = (S + D + I) / N via Levenshtein alignment.

Capability parity with the reference's vendored HF metric
(finetune/training/trainers/wer.py:78-106, jiwer-backed) — vendored there
because compute nodes have no internet; same motivation here, implemented
directly (word-level dynamic programming, two-row O(min(m,n)) memory).
A C++ fast path (native/) is used automatically when built.
"""
from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import numpy as np

try:
    from asr_finetune_tpu.utils import native_ext  # optional C++ fast path
except Exception:  # pragma: no cover
    native_ext = None


def _edit_distance(ref: Sequence[str], hyp: Sequence[str]) -> int:
    """Word-level Levenshtein distance (S+D+I with unit costs)."""
    m, n = len(ref), len(hyp)
    if m == 0:
        return n
    if n == 0:
        return m
    prev = np.arange(n + 1, dtype=np.int32)
    cur = np.empty(n + 1, dtype=np.int32)
    for i in range(1, m + 1):
        cur[0] = i
        r = ref[i - 1]
        for j in range(1, n + 1):
            cost = 0 if r == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev, cur = cur, prev
    return int(prev[n])


def _pair_counts(reference: str, hypothesis: str) -> Tuple[int, int]:
    ref_words = reference.split()
    hyp_words = hypothesis.split()
    if native_ext is not None and native_ext.available():
        return native_ext.edit_distance_words(ref_words, hyp_words), len(ref_words)
    return _edit_distance(ref_words, hyp_words), len(ref_words)


def wer(references: Iterable[str], hypotheses: Iterable[str]) -> float:
    """Corpus WER over whitespace-tokenized words.

    Matches jiwer.compute_measures' corpus aggregation used by the vendored
    metric (reference wer.py:96-106): sum errors / sum reference words.
    """
    refs = list(references)
    hyps = list(hypotheses)
    if len(refs) != len(hyps):
        raise ValueError(f"length mismatch: {len(refs)} refs vs {len(hyps)} hyps")
    if native_ext is not None and native_ext.available():
        errors, total = native_ext.corpus_wer(refs, hyps)
    else:
        errors = 0
        total = 0
        for r, h in zip(refs, hyps):
            e, n = _pair_counts(r, h)
            errors += e
            total += n
    if total == 0:
        raise ValueError("no reference words; WER undefined")
    return errors / total


def wer_percent(references: Iterable[str], hypotheses: Iterable[str]) -> float:
    """100 * WER, the scale the reference reports (metrics.py:69-71)."""
    return 100.0 * wer(references, hypotheses)
