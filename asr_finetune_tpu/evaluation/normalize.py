"""Transcript normalization, exactly matching the reference.

Reference: finetune/training/utils.py:72-92 (`normalize`: strip, lowercase,
remove the characters !?.,;) — applied to both predictions and references
before WER in metrics.py:63-66 and custom_seq2seq_trainers.py:259-268.
Kept bug-for-bug identical so WER numbers are comparable.
"""
from __future__ import annotations

from typing import Iterable, List

_REMOVE = "!?.,;"
_TABLE = str.maketrans("", "", _REMOVE)


def normalize(text: str) -> str:
    return text.strip().lower().translate(_TABLE)


def normalize_batch(texts: Iterable[str]) -> List[str]:
    return [normalize(t) for t in texts]
