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
    """Appends metric dicts to metrics.jsonl and mirrors them to TB.

    Two channels:
    - global training metrics → `metrics.jsonl` + TB scalars, rank 0 only
      (every rank computes identical values; concurrent appends to one
      shared file would interleave);
    - per-host telemetry (RSS, HBM in use, device duty) → one
      `metrics_host<i>.jsonl` PER PROCESS via :meth:`log_host`, plus a
      `host<i>/` TensorBoard run per process — so a multi-host pod shows
      every node's utilization live, the capability the reference wires
      through Grafana/Prometheus/Ray-dashboard
      (finetune_large_debug_dashboard.sh:118-200). Rank 0's own host
      stats additionally ride in the global record as before.
    """

    def __init__(self, directory: str, use_tensorboard: bool = True):
        self.directory = directory
        self._active = True
        self._pi = 0
        try:
            import jax
            self._pi = jax.process_index()
            self._active = self._pi == 0
        except Exception:  # noqa: BLE001
            pass
        os.makedirs(directory, exist_ok=True)
        self._jsonl = (open(os.path.join(directory, "metrics.jsonl"), "a")
                       if self._active else None)
        self._host_jsonl = open(
            os.path.join(directory, f"metrics_host{self._pi}.jsonl"), "a")
        self._tb = None
        self._host_tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                if self._active:
                    self._tb = SummaryWriter(log_dir=directory)
                self._host_tb = SummaryWriter(
                    log_dir=os.path.join(directory, f"host{self._pi}"))
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

    def log_host(self, step: int, metrics: Dict[str, Any]) -> None:
        """Per-host telemetry series — called on EVERY process."""
        rec = {"step": int(step), "time": time.time(),
               "process_index": self._pi}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._host_jsonl.write(json.dumps(rec) + "\n")
        self._host_jsonl.flush()
        if self._host_tb is not None:
            for k, v in rec.items():
                if k in ("step", "time", "process_index") \
                        or not isinstance(v, float):
                    continue
                self._host_tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        self._host_jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._host_tb is not None:
            self._host_tb.close()


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
