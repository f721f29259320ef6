"""Checkpoint / resume via Orbax: full state, adapter-only saves,
metric-scored retention, step-exact resume.

Capability parity with the reference's checkpoint machinery (SURVEY.md §5.4):
- HF save every save_steps + Ray CheckpointConfig(num_to_keep,
  checkpoint_score_attribute, checkpoint_score_order)
  (train_hyper.py:374-378) → CheckpointManagerOptions(max_to_keep, best_fn,
  best_mode) with metrics recorded at save time
- SavePeftModelCallback's adapter-only saves that delete the full model
  weights to save disk (trainers/utils.py:10-31) → `save_adapters_only`
  stores just the adapter sub-tree
- trainer_state.json step restore + StepSyncCallback
  (trainers/utils.py:37-52) → the step is part of the state pytree, and the
  data pipeline resumes its exact stream position from it
  (data/pipeline.py batches_from_step) — stronger than the reference,
  which restarts the stream and only fixes the counter.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

Params = Dict[str, Any]


class CheckpointManager:
    """Wraps ocp.CheckpointManager with the reference's retention semantics."""

    def __init__(self, directory: str, max_to_keep: int = 2,
                 metric: Optional[str] = None, mode: str = "min",
                 save_interval_steps: int = 1,
                 adapter_only: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.metric = metric
        self.adapter_only = adapter_only
        best_fn = (lambda m: m[metric]) if metric else None
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=best_fn,
                best_mode=("min" if mode in ("min", "minimize") else "max"),
                keep_checkpoints_without_metrics=True,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def _to_save(self, state: Params) -> Params:
        if self.adapter_only:
            # reference SavePeftModelCallback: keep adapters + opt state,
            # drop the frozen base (trainers/utils.py:16-31)
            return {k: v for k, v in state.items() if k != "params"}
        return state

    def save(self, step: int, state: Params,
             metrics: Optional[Dict[str, float]] = None) -> bool:
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(self._to_save(state)),
            metrics=metrics or None)
        return bool(saved)

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state_like: Params, step: Optional[int] = None) -> Params:
        """Restore into the structure of `state_like` (a state pytree with
        correctly-shaped arrays). With adapter_only, the frozen base in
        state_like passes through untouched."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = self._to_save(state_like)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        out = dict(state_like)
        out.update(restored)
        return out

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.close()


def save_trial_manifest(directory: str, payload: Dict[str, Any]) -> None:
    """Reproducibility sidecar — the config.txt / params.json the reference
    dumps per run (train_hyper.py:218-222, train_single_model params.json)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, "trial_manifest.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=str)


def load_trial_manifest(directory: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(directory, "trial_manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
