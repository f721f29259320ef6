"""Export a trained checkpoint for deployment.

`python -m asr_finetune_tpu.cli.export -c configs/xxx.config
    --checkpoint_dir <trial>/checkpoints --export_dir merged_model/
    [--merge_adapters/--no-merge_adapters] [--adapter_path adapters.npz]`

The deployment half the reference leaves to PEFT (`merge_and_unload` +
`save_pretrained`; its evaluators re-attach adapters at load time instead,
evaluate_peft.py): loads a training checkpoint (full state or
adapter-only; best step by default), optionally folds the LoRA/AdaLoRA
deltas into the base weights (training/lora.merge_adapters — exact at
inference, rank masks applied first), and writes the air-gapped native
npz format (models/native_io.py) that `--model_path` accepts everywhere
in this framework (train, evaluate, transcribe). With --adapter_path the
raw adapter pytree is also written separately for PEFT-style shipping of
just the delta.
"""
from __future__ import annotations

import argparse
import logging
import sys

import jax
import numpy as np

from .. import config as config_lib
from .. import run as run_lib
from ..models import native_io
from ..training import lora as lora_lib
from ..training import optim as optim_lib
from ..training.checkpoint import CheckpointManager
from ..training.train_step import make_train_state
from ..utils.logging_utils import setup_logging

logger = logging.getLogger(__name__)


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--checkpoint_dir", type=str, required=True)
    extra.add_argument("--checkpoint_step", type=int, default=-1)
    extra.add_argument("--use_best_checkpoint", action="store_true",
                       default=True)
    extra.add_argument("--export_dir", type=str, required=True,
                       help="output directory (native format: params.npz "
                            "+ config.json; load anywhere via --model_path)")
    extra.add_argument("--merge_adapters",
                       action=argparse.BooleanOptionalAction, default=True,
                       help="fold LoRA/AdaLoRA deltas into the base "
                            "weights (PEFT merge_and_unload equivalent)")
    extra.add_argument("--adapter_path", type=str, default="",
                       help="also write the raw adapter pytree (npz)")
    ens, rest = extra.parse_known_args(argv)
    args = config_lib.parse_args(rest)
    setup_logging()

    built = run_lib.build_model(args)
    params, adapters = built.params, built.adapters

    mgr = CheckpointManager(ens.checkpoint_dir, adapter_only=args.peft)
    freeze = (optim_lib.adapter_freeze_mask(adapters, args.adalora)
              if adapters is not None else None)
    tx = optim_lib.make_optimizer(1e-4, max_steps=max(args.max_steps, 1),
                                  trainable_mask=freeze)
    state = make_train_state(params, tx, adapters=adapters,
                             adalora=bool(args.peft and args.adalora))
    step = ens.checkpoint_step if ens.checkpoint_step >= 0 else (
        mgr.best_step() if ens.use_best_checkpoint else None)
    state = mgr.restore(state, step=step)
    mgr.close()
    params = state["params"] if not args.peft else params
    adapters = state.get("adapters", adapters)
    if adapters is not None and state.get("rank_mask") is not None:
        adapters = lora_lib.apply_rank_mask(adapters, state["rank_mask"])
    logger.info("restored step %s from %s",
                step if step is not None else mgr.latest_step(),
                ens.checkpoint_dir)

    if ens.adapter_path and adapters is not None:
        flat = {k: np.asarray(v)
                for k, v in native_io._flatten(adapters).items()}
        np.savez(ens.adapter_path, **flat)
        logger.info("wrote adapters (%d arrays) to %s",
                    len(flat), ens.adapter_path)

    if ens.merge_adapters and adapters is not None:
        params = lora_lib.merge_adapters(params, adapters)
        logger.info("merged adapter deltas into the base weights")

    # deployment artifact in fp32 (the PEFT base may be bf16/int8 in
    # memory; npz round-trips fp32 losslessly and loaders re-cast)
    def to_np(x):
        a = np.asarray(x)
        if a.dtype.kind in ("f", "V"):
            a = np.asarray(jax.numpy.asarray(x).astype(jax.numpy.float32))
        return a

    params = jax.tree.map(to_np, params)
    native_io.save_params(ens.export_dir, params, built.cfg)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f'{{"export_dir": "{ens.export_dir}", "params": {n}}}')
    return 0


if __name__ == "__main__":
    main()
