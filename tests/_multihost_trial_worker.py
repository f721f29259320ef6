"""Worker for the 2-process FULL-TRIAL multi-host test.

Runs the complete trial loop — train steps, random-shard eval (loss + WER
decode), Orbax checkpointing, and a resumed continuation run — through
run_trial under jax.distributed with 2 processes x 4 virtual CPU devices.
The reference capability: the full Ray-Train trial loop ran multi-node
(train_hyper.py:312-332). Both ranks must report identical metrics.
"""
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
nproc = int(sys.argv[2])
coord = sys.argv[3]
h5_path = sys.argv[4]
out_dir = sys.argv[5]

jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=rank)
assert len(jax.devices()) == 8, len(jax.devices())

from asr_finetune_tpu import config as config_lib
from asr_finetune_tpu.run import run_trial

args = config_lib.parse_args([
    "--model_type", "test-nano", "--dataset_name", h5_path,
    "--data_mode", "h5",
    "--per_device_train_batch_size", "1",   # global 8, 4 rows per process
    "--per_device_eval_batch_size", "8",
    "--max_steps", "4", "--eval_steps", "2", "--save_steps", "4",
    "--logging_steps", "2", "--generation_max_length", "8",
    "--eval_sample_fraction", "1.0", "--val_split", "0.4",
    "--num_to_keep", "3", "--random_seed", "7",
    "--learning_rate", "1e-3",
])

r1 = run_trial(args, trial_dir=out_dir)
print(f"RANK{rank}_R1=" + json.dumps(
    {k: round(float(v), 6) for k, v in r1.items()}), flush=True)
assert r1["final_step"] == 4, r1

# resume from the step-4 checkpoint and continue to step 6
r2 = run_trial(args, trial_dir=out_dir, max_steps_override=6,
               resume_override=True)
print(f"RANK{rank}_R2=" + json.dumps(
    {k: round(float(v), 6) for k, v in r2.items()}), flush=True)
assert r2["final_step"] == 6, r2
print(f"RANK{rank}_DONE", flush=True)
