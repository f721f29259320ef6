"""Concurrent trial packing on disjoint chip subsets (the reference's
fractional-GPU equivalent): 2 trials x 4 chips on the virtual 8-CPU mesh."""
import pytest
import json

from asr_finetune_tpu import config as config_lib
from asr_finetune_tpu.data.hdf5 import make_synthetic_dataset
from asr_finetune_tpu.hpo import controller


@pytest.mark.slow  # multi-minute on CPU (tests/README.md timings)
def test_packed_trials_run_concurrently(tmp_path):
    make_synthetic_dataset(str(tmp_path / "d.h5"), n=48, seed=0,
                           min_sec=0.5, max_sec=1.0)
    args = config_lib.parse_args([
        "--model_type", "test-nano",
        "--dataset_name", str(tmp_path / "d.h5"),
        "--output_dir", str(tmp_path / "out"),
        "--storage_path", str(tmp_path / "scratch"),
        "--output_tag", "packed",
        "--num_samples", "2",
        "--max_steps", "3", "--eval_steps", "3", "--save_steps", "3",
        "--logging_steps", "3",
        "--per_device_train_batch_size", "1",
        "--per_device_eval_batch_size", "2",
        "--val_split", "0.2",
        "--chips_per_trial", "4",
        "--max_concurrent_trials", "2",
        "--hyperparameters", "learning_rate",
        "--search_schedule_mode", "small_small",
        "--grace_period", "5",
        "--skip_wer_eval",
        "--random_seed", "0",
    ])
    summary = controller.run_experiment(args)
    assert summary["best_trial"] is not None
    st = json.loads((tmp_path / "scratch" / "packed" /
                     "experiment_state.json").read_text())
    assert sum(1 for t in st["trials"].values()
               if t["status"] == "completed") == 2
