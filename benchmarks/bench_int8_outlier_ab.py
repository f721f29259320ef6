"""E2E A/B: --int8_outlier_cols 0 vs 8 vs 16 under --int8_matmul.

Decides the default outlier-decomposition width for --load_in_8bit
(VERDICT r3 next #2). The reference's load_in_8bit is bitsandbytes
LLM.int8() (whisper_models.py:42,69), which ALWAYS applies the
mixed-precision outlier decomposition (threshold 6.0); plain W8A8 is a
numerics divergence on outlier-heavy activations (measured 5.7% matmul
error vs 0.20% at k=8, bench_quant_numerics.py). This harness runs the
full PEFT trial loop (run.run_trial: int8 frozen base, LoRA adapters,
eval loss + WER decode) at each k and reports the end-to-end metrics so
the default is chosen from data.

Caveat documented with the results: no pretrained checkpoints exist in
this environment (air-gapped), so the runs use randomly initialized
weights + synthetic audio — activations here do NOT carry the emergent
outlier features of trained transformers (LLM.int8() §3 shows those
appear in TRAINED models at scale). The A/B therefore answers "does the
decomposition cost or corrupt anything e2e?" while the parity argument
for k>0 rests on matching bnb's always-on semantics.

Runs on CPU. Usage: python benchmarks/bench_int8_outlier_ab.py
  [--model test-nano] [--steps 16] [--ks 0,8,16]
Prints one JSON line per k.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="test-nano")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--ks", default="0,8,16")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from asr_finetune_tpu import config as config_lib
    from asr_finetune_tpu import run as run_lib
    from asr_finetune_tpu.data.hdf5 import make_synthetic_dataset

    with tempfile.TemporaryDirectory() as td:
        h5 = os.path.join(td, "ab.h5")
        make_synthetic_dataset(h5, n=24, seed=args.seed,
                               min_sec=0.5, max_sec=1.5)
        for k in [int(v) for v in args.ks.split(",")]:
            targs = config_lib.parse_args([
                "--model_type", args.model,
                "--dataset_name", h5,
                "--output_dir", os.path.join(td, f"k{k}"),
                "--output_tag", "ab",
                "--max_steps", str(args.steps),
                "--eval_steps", str(args.steps),
                "--save_steps", str(args.steps),
                "--logging_steps", str(args.steps),
                "--per_device_train_batch_size", str(args.batch),
                "--per_device_eval_batch_size", str(args.batch),
                "--learning_rate", "1e-3",
                "--val_split", "0.3",
                "--eval_sample_fraction", "1.0",
                "--generation_max_length", "24",
                "--random_seed", str(args.seed),
                "--peft", "--lora_rank", "4", "--lora_alpha", "8",
                "--load_in_8bit", "--int8_matmul",
                "--int8_outlier_cols", str(k),
            ])
            t0 = time.time()
            result = run_lib.run_trial(targs)
            print(json.dumps({
                "k": k, "model": args.model, "steps": args.steps,
                "eval_loss": round(float(result["eval_loss"]), 6),
                "eval_wer": round(float(result.get("eval_wer", -1)), 4),
                "wall_s": round(time.time() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
