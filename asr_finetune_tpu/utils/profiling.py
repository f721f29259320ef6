"""Profiling and telemetry.

Upgrades the reference's ad-hoc observability (SURVEY.md §5.1: wall-clock
samples/sec prints, psutil RSS, Ray dashboard) to first-class TPU tooling:

- `trace(logdir)`: jax.profiler context — produces a TensorBoard profile
  (XLA op breakdown, HBM usage, per-op FLOPs) viewable with the TB profile
  plugin; the TPU-native replacement for the Ray dashboard's utilization
  view (finetune_large_debug_dashboard.sh:194-200).
- `log_memory_usage`: psutil RSS logging (reference evaluation/utils.py:45-48)
  plus jax live-array device memory stats.
- `StepTimer`: rolling utt/s / tokens/s window, the structured version of
  the collator's samples/sec prints (datasets_and_collators.py:197-204).
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profile trace written to %s (view: tensorboard "
                    "--logdir %s, Profile tab)", logdir, logdir)


def log_memory_usage(tag: str = "", quiet: bool = False) -> Dict[str, float]:
    stats: Dict[str, float] = {}
    try:
        import psutil
        rss = psutil.Process().memory_info().rss
        stats["host_rss_gb"] = rss / 1e9
    except Exception:  # noqa: BLE001
        pass
    try:
        for d in jax.local_devices():
            ms = d.memory_stats()
            if ms:
                stats[f"{d.id}_bytes_in_use_gb"] = ms.get("bytes_in_use", 0) / 1e9
                stats[f"{d.id}_peak_gb"] = ms.get("peak_bytes_in_use", 0) / 1e9
    except Exception:  # noqa: BLE001
        pass
    if stats and not quiet:
        logger.info("memory%s: %s", f" [{tag}]" if tag else "",
                    {k: round(v, 3) for k, v in stats.items()})
    return stats


class StepTimer:
    """Rolling throughput window."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.time()
        self.utterances = 0
        self.tokens = 0

    def update(self, utterances: int, tokens: int):
        self.utterances += utterances
        self.tokens += tokens

    def rates(self) -> Dict[str, float]:
        dt = max(time.time() - self.t0, 1e-9)
        return {"utt_per_sec": self.utterances / dt,
                "tokens_per_sec": self.tokens / dt}
