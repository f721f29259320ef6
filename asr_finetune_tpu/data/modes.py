"""Data-mode registry: declarative map of mode name → train/val source types.

Capability parity with the reference's registry
(finetune/training/data_and_collator/data_modes.py:1-76): modes `h5`,
`parquet`, `parquet_h5` (parquet train + h5 val), `train_parquet`,
`val_parquet`, `val_h5`.
"""
from __future__ import annotations

from typing import Dict

DATA_MODES: Dict[str, Dict[str, str]] = {
    "h5":            {"train": "h5",      "val": "h5"},
    "parquet":       {"train": "parquet", "val": "parquet"},
    "parquet_h5":    {"train": "parquet", "val": "h5"},
    "train_parquet": {"train": "parquet", "val": "h5"},
    "val_parquet":   {"train": "h5",      "val": "parquet"},
    "val_h5":        {"train": "parquet", "val": "h5"},
    # audiofolder: directories of .wav + metadata.csv
    # (reference load_and_prepare_data_from_folders,
    # datasets_and_collators.py:329-412)
    "folder":        {"train": "folder",  "val": "folder"},
}


def get_data_mode(name: str) -> Dict[str, str]:
    if name not in DATA_MODES:
        raise ValueError(f"unknown data mode {name!r}; have {sorted(DATA_MODES)}")
    return DATA_MODES[name]
