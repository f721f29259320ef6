"""Metrics logging: JSONL history + TensorBoard scalars + config dumps.

Capability parity with the reference's observability (SURVEY.md §5.5):
- `report_to=["tensorboard"]` tfevents per trial (trainers.py:646,858)
- parsed-args dump appended to config.txt per run (train_hyper.py:218-222)
- trainer log_history (aggregated metrics reported to Tune,
  hf_to_ray_custom_utils.py:99-104) → metrics.jsonl
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict

logger = logging.getLogger(__name__)


def setup_logging(level: int = logging.INFO) -> None:
    # uniform format string, as in train_hyper.py:209-211
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")


class MetricsLogger:
    """Appends metric dicts to metrics.jsonl and mirrors them to TB."""

    def __init__(self, directory: str, use_tensorboard: bool = True):
        self.directory = directory
        # multi-host: only rank 0 writes (every rank computes identical
        # metrics; concurrent appends to one shared file would interleave)
        self._active = True
        try:
            import jax
            self._active = jax.process_index() == 0
        except Exception:  # noqa: BLE001
            pass
        os.makedirs(directory, exist_ok=True)
        self._jsonl = (open(os.path.join(directory, "metrics.jsonl"), "a")
                       if self._active else None)
        self._tb = None
        if use_tensorboard and self._active:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=directory)
            except Exception as e:  # noqa: BLE001
                logger.warning("tensorboard writer unavailable: %s", e)

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        if not self._active:
            return
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k in ("step", "time") or not isinstance(v, float):
                    continue
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def dump_config(directory: str, config: Dict[str, Any],
                filename: str = "config.txt") -> None:
    """Append the parsed config, one flag per line (reference
    training/utils.py:48-65 save_file semantics)."""
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, filename), "a") as f:
        f.write(f"# {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
        for k in sorted(config):
            f.write(f"{k} = {config[k]!r}\n")
        f.write("\n")


def read_metrics_history(directory: str):
    path = os.path.join(directory, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
