"""Native parameter serialization: save/load param pytrees without HF.

Capability parity with the reference's model pre-download flow
(download_HF_model.py + whisper_models.py:20-50's
MODEL_PATH/{model,tokenizer,...} directory tree for air-gapped clusters):
`cli/prepare_model.py` converts an HF checkpoint directory ONCE into this
native format; training then loads it directly — no transformers/torch on
the training hosts.

Format: one .npz of flattened leaves keyed by "/"-joined tree paths, plus a
config.json carrying the WhisperConfig; loads are mmap-friendly and orders
of magnitude faster than torch .bin parsing.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .configs import WhisperConfig

PARAMS_FILE = "params.npz"
CONFIG_FILE = "config.json"


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        elif v is None:
            continue
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_params(path: str, params: Dict[str, Any], cfg: WhisperConfig) -> None:
    os.makedirs(path, exist_ok=True)
    flat = _flatten(params)
    np.savez(os.path.join(path, PARAMS_FILE), **flat)
    with open(os.path.join(path, CONFIG_FILE), "w") as f:
        json.dump({"whisper_config": dataclasses.asdict(cfg),
                   "format": "asr_finetune_tpu.native_io.v1"}, f, indent=2)


def load_params(path: str) -> Tuple[Dict[str, Any], WhisperConfig]:
    with open(os.path.join(path, CONFIG_FILE)) as f:
        meta = json.load(f)
    if "whisper_config" not in meta:
        raise ValueError(f"{path}: not a native checkpoint (no whisper_config)")
    cfg = WhisperConfig(**meta["whisper_config"])
    with np.load(os.path.join(path, PARAMS_FILE)) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat), cfg


def is_native_checkpoint(path: str) -> bool:
    return os.path.exists(os.path.join(path, PARAMS_FILE))
