"""Parquet feature materialization and reading.

Capability parity with the reference's offline materializers
(finetune/prepare_dataset/materialize_dataset.py:19-188 and
materialize_dataset_ray.py:80-152: HDF5 → parquet of precomputed
input_features + max-length-448-padded labels) and its parquet training
path (`ray.data.read_parquet` + collate_parquet,
datasets_and_collators.py:279-294, :557).

TPU-native role: with the on-device log-mel frontend this path is OPTIONAL
(the reference needs it because host-CPU feature extraction bottlenecks
training); it remains useful for repeated-epoch runs on slow storage.
Process-sharded reads replace Ray's block distribution.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .collator import IGNORE_ID
from ..ops import logmel as logmel_ops


def materialize_hdf5_to_parquet(reader, tokenizer, out_dir: str,
                                n_mels: int = 80, language: str = "de",
                                task: str = "transcribe",
                                max_label_len: int = 448,
                                shard_size: int = 256,
                                limit: Optional[int] = None,
                                start: int = 0,
                                end: Optional[int] = None) -> List[str]:
    """Precompute (mel, labels) rows → parquet shards. Returns file list.

    [start, end) bounds the row range so multiple processes can partition
    one file (the reference fans out over Ray actors,
    materialize_dataset_ray.py:119-126)."""
    os.makedirs(out_dir, exist_ok=True)
    n = len(reader) if limit is None else min(limit, len(reader))
    end = n if end is None else min(end, n)
    sp = tokenizer.special
    files = []
    for shard_start in range(start, end, shard_size):
        idx = list(range(shard_start, min(shard_start + shard_size, end)))
        rows = reader.read(idx)
        feats, labels_col, texts, idxs = [], [], [], []
        for i, audio, text in rows:
            mel = logmel_ops.log_mel_np(logmel_ops.pad_or_trim(audio), n_mels)
            lab = tokenizer.build_labels(text, language, task)[:max_label_len]
            if lab and lab[0] == sp.sot:
                lab = lab[1:]  # stored sot-stripped, like training labels
            lab = lab + [IGNORE_ID] * (max_label_len - len(lab))
            feats.append(mel.astype(np.float32).reshape(-1))
            labels_col.append(np.asarray(lab, np.int32))
            texts.append(text)
            idxs.append(i)
        if not feats:
            continue
        table = pa.table({
            "idx": pa.array(idxs, pa.int32()),
            "input_features": pa.array([f for f in feats], pa.list_(pa.float32())),
            "labels": pa.array([l for l in labels_col], pa.list_(pa.int32())),
            "text": pa.array(texts, pa.string()),
            "n_frames": pa.array([logmel_ops.NUM_FRAMES] * len(feats), pa.int32()),
            "n_mels": pa.array([n_mels] * len(feats), pa.int32()),
        })
        path = os.path.join(out_dir, f"shard-{shard_start:08d}.parquet")
        pq.write_table(table, path)
        files.append(path)
    return files


class ParquetFeatureReader:
    """Reads materialized feature shards; presents the reader API the
    pipeline expects, returning pre-featurized rows."""

    def __init__(self, path_or_dir: str):
        if os.path.isdir(path_or_dir):
            self.files = sorted(glob.glob(os.path.join(path_or_dir, "*.parquet")))
        else:
            self.files = [path_or_dir]
        if not self.files:
            raise FileNotFoundError(f"no parquet shards under {path_or_dir}")
        self._tables = None
        self._offsets = None

    def _load(self):
        if self._tables is None:
            self._tables = [pq.read_table(f) for f in self.files]
            sizes = [t.num_rows for t in self._tables]
            self._offsets = np.cumsum([0] + sizes)
        return self._tables

    def __len__(self) -> int:
        self._load()
        return int(self._offsets[-1])

    def transcript_lengths(self) -> np.ndarray:
        """group_by_length sort key: true label token counts (excluding the
        -100 padding the materializer wrote)."""
        tables = self._load()
        out = []
        for t in tables:
            for row in t["labels"]:
                arr = np.asarray(row.as_py(), np.int32)
                out.append(int((arr != IGNORE_ID).sum()))
        return np.asarray(out, np.int32)

    def read_features(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Gather rows → dict of stacked arrays (mel, labels, text)."""
        tables = self._load()
        mels, labels, texts = [], [], []
        for gi in indices:
            ti = int(np.searchsorted(self._offsets, gi, side="right") - 1)
            ri = int(gi - self._offsets[ti])
            t = tables[ti]
            n_frames = t["n_frames"][ri].as_py()
            n_mels = t["n_mels"][ri].as_py()
            mels.append(np.asarray(t["input_features"][ri].as_py(),
                                   np.float32).reshape(n_frames, n_mels))
            labels.append(np.asarray(t["labels"][ri].as_py(), np.int32))
            texts.append(t["text"][ri].as_py())
        return {
            "mel": np.stack(mels),
            "labels": np.stack(labels),
            "text": np.asarray(texts, dtype=object),
        }


class ParquetCollator:
    """Adapter: sampler indices → batch, for materialized features.

    Builds decoder_input_ids by shifting labels right with sot (the trainer
    does this implicitly in the reference via model.shift_tokens_right)."""

    def __init__(self, reader: ParquetFeatureReader, sot: int, pad: int):
        self.reader = reader
        self.sot = sot
        self.pad = pad

    def read(self, indices):
        return indices  # pipeline reader pass-through

    def __call__(self, indices) -> Dict[str, np.ndarray]:
        data = self.reader.read_features(list(indices))
        labels = data["labels"]
        B, L = labels.shape
        dec_in = np.full((B, L), self.pad, np.int32)
        dec_in[:, 0] = self.sot
        shifted = labels[:, :-1]
        dec_in[:, 1:] = np.where(shifted == IGNORE_ID, self.pad, shifted)
        return {"mel": data["mel"], "labels": labels,
                "decoder_input_ids": dec_in, "text": data["text"],
                "idx": np.asarray(list(indices), np.int32)}
