"""Offline evaluation entry point.

`python -m asr_finetune_tpu.cli.evaluate -c configs/xxx.config
    --checkpoint_dir <trial>/checkpoints [--eval_output_dir out]`

The reference's `evaluate_model.py` / `evaluate_peft.py` analogue: loads a
training checkpoint (full state or adapter-only; best step by default),
streams the test set, runs batched decode, writes resumable per-utterance
transcripts + corpus WER (evaluation/evaluate.py). The tied-proj_out
reconstruction the full-model evaluator needs (evaluate_model.py:164-167)
does not exist here — the output projection is always the tied embedding.
"""
from __future__ import annotations

import argparse
import json
import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_lib
from .. import run as run_lib
from ..data.collator import Collator, CollatorConfig
from ..data.hdf5 import Hdf5AudioReader
from ..evaluation.evaluate import EvalConfig, OfflineEvaluator
from ..training import optim as optim_lib
from ..training.checkpoint import CheckpointManager
from ..training.train_step import make_train_state
from ..utils.logging_utils import setup_logging

logger = logging.getLogger(__name__)


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--checkpoint_dir", type=str, default="")
    extra.add_argument("--checkpoint_step", type=int, default=-1)
    extra.add_argument("--use_best_checkpoint", action="store_true")
    extra.add_argument("--eval_output_dir", type=str, default="./eval_out")
    extra.add_argument("--test_dataset_name", type=str, default="")
    ens, rest = extra.parse_known_args(argv)
    args = config_lib.parse_args(rest)
    setup_logging()

    built = run_lib.build_model(args)
    params, adapters = built.params, built.adapters

    if ens.checkpoint_dir:
        mgr = CheckpointManager(ens.checkpoint_dir, adapter_only=args.peft)
        # the optimizer must match training's (masked for PEFT) so the
        # restored opt_state template has the same structure
        freeze = (optim_lib.adapter_freeze_mask(adapters, args.adalora)
                  if adapters is not None else None)
        tx = optim_lib.make_optimizer(1e-4, max_steps=max(args.max_steps, 1),
                                      trainable_mask=freeze)
        state = make_train_state(params, tx, adapters=adapters,
                                 adalora=bool(args.peft and args.adalora))
        step = None
        if ens.checkpoint_step >= 0:
            step = ens.checkpoint_step
        elif ens.use_best_checkpoint:
            step = mgr.best_step()
        state = mgr.restore(state, step=step)
        params = state["params"] if not args.peft else params
        adapters = state.get("adapters", adapters)
        if adapters is not None and state.get("rank_mask") is not None:
            from ..training import lora as lora_lib
            adapters = lora_lib.apply_rank_mask(adapters, state["rank_mask"])
        logger.info("restored checkpoint step %s from %s",
                    step if step is not None else mgr.latest_step(),
                    ens.checkpoint_dir)

    test_name = ens.test_dataset_name or args.dataset_name
    reader = Hdf5AudioReader(run_lib._resolve_path(args, test_name),
                             copy_to_local=args.copy_to_local)
    collator = Collator(built.tokenizer, CollatorConfig(
        features="audio", n_mels=built.cfg.num_mel_bins,
        language=args.target_language, task=args.task))

    B = args.per_device_eval_batch_size
    n = len(reader)
    if args.limit_samples:
        n = min(n, args.limit_samples)

    def batches():
        for i in range(0, n, B):
            rows = reader.read(list(range(i, min(i + B, n))))
            if rows:
                yield collator(rows)

    ecfg = EvalConfig(language=args.target_language, task=args.task,
                      max_length=args.generation_max_length,
                      num_beams=args.generation_num_beams,
                      length_penalty=args.length_penalty,
                      suppress_tokens=built.suppress_tokens,
                      begin_suppress_tokens=built.begin_suppress_tokens,
                      return_timestamps=args.return_timestamps,
                      decode_kv_int8=getattr(args, "decode_kv_int8", False),
                      decode_w_int8=getattr(args, "decode_w_int8", False),
                      batch_size=B, output_dir=ens.eval_output_dir,
                      compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    ev = OfflineEvaluator(built.cfg, params, built.tokenizer, ecfg, adapters)
    final = ev.run(batches())
    print(json.dumps({"wer": final["wer"],
                      "n_utterances": final["n_utterances"]}))
    return final


if __name__ == "__main__":
    main()
