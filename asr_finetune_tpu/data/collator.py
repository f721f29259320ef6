"""Batch assembly: padding, label masking, decoder-input shifting.

Capability parity with the reference's collators
(DataCollatorSpeechSeq2SeqWithPadding, datasets_and_collators.py:418-461, and
the streaming collator's _prepare_dataset :229-256):
- labels padded and pad positions masked to -100
- leading <|startoftranscript|> stripped when every row begins with it
  (reference :456-458) — the trainer's shift re-adds it
- features padded to the fixed 30 s window

TPU-native differences:
- default output carries RAW AUDIO (B, 480000); log-mel runs on-device
  (ops/logmel.py). `features="host"` reproduces the reference's host-side
  extraction (float64, bit-matching WhisperFeatureExtractor).
- label padding uses fixed buckets so XLA sees a bounded set of shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..models.tokenizer import WhisperTokenizerBase
from ..ops import logmel as logmel_ops

IGNORE_ID = -100
LABEL_BUCKETS = (48, 96, 192, 448)


@dataclasses.dataclass
class CollatorConfig:
    features: str = "audio"        # "audio" (on-device mel) | "host" (host mel)
    n_mels: int = 80
    language: str = "de"
    task: str = "transcribe"
    max_label_len: int = 448       # reference: materialize_dataset_ray.py:43-49
    label_buckets: Tuple[int, ...] = LABEL_BUCKETS
    strip_leading_sot: bool = True


class Collator:
    """(audio, text) rows → model-ready numpy batch."""

    def __init__(self, tokenizer: WhisperTokenizerBase, cfg: CollatorConfig):
        self.tokenizer = tokenizer
        self.cfg = cfg

    def _bucket_len(self, longest: int) -> int:
        for b in self.cfg.label_buckets:
            if longest <= b:
                return b
        return self.cfg.max_label_len

    def __call__(self, rows: Sequence[Tuple[int, np.ndarray, str]]
                 ) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        sp = self.tokenizer.special
        B = len(rows)

        try:
            from ..utils import native_ext
            audio = native_ext.assemble_batch(
                [a for _, a, _ in rows], logmel_ops.CHUNK_SAMPLES)
        except Exception:  # noqa: BLE001 — pure-Python fallback
            audio = np.stack([logmel_ops.pad_or_trim(a) for _, a, _ in rows])
        label_lists: List[List[int]] = [
            self.tokenizer.build_labels(t, cfg.language, cfg.task)[: cfg.max_label_len]
            for _, _, t in rows
        ]
        # reference rule: strip the leading sot when every row starts with it
        if cfg.strip_leading_sot and all(l and l[0] == sp.sot for l in label_lists):
            label_lists = [l[1:] for l in label_lists]

        longest = max(len(l) for l in label_lists)
        L = self._bucket_len(longest)
        labels = np.full((B, L), IGNORE_ID, np.int32)
        dec_in = np.full((B, L), sp.pad, np.int32)
        dec_in[:, 0] = sp.sot
        for i, l in enumerate(label_lists):
            l = l[:L]
            labels[i, : len(l)] = l
            dec_in[i, 1 : min(len(l), L - 1) + 1] = l[: L - 1]

        batch: Dict[str, np.ndarray] = {
            "decoder_input_ids": dec_in,
            "labels": labels,
            "idx": np.asarray([i for i, _, _ in rows], np.int32),
        }
        if cfg.features == "audio":
            batch["audio"] = audio
        else:
            batch["mel"] = np.stack(
                [logmel_ops.log_mel_np(a, cfg.n_mels) for a in audio])
        batch["text"] = np.asarray([t for _, _, t in rows], dtype=object)
        return batch
