"""End-to-end smoke runs mirroring the reference's debug configs
(largev3_peft_debug.config / largev3_debug.config scale, SURVEY.md §4):
full fine-tune and PEFT on a synthetic HDF5 set, with eval, WER,
checkpointing and resume, driven through the config system."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # mini-trainings: minutes each on CPU

from asr_finetune_tpu import config as config_lib
from asr_finetune_tpu import run as run_lib
from asr_finetune_tpu.data.hdf5 import make_synthetic_dataset
from asr_finetune_tpu.utils.logging_utils import read_metrics_history


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    make_synthetic_dataset(str(d / "train.h5"), n=24, seed=0,
                           min_sec=0.5, max_sec=1.5)
    return d


def _args(data_dir, out, extra=()):
    return config_lib.parse_args([
        "--model_type", "test-nano",
        "--dataset_name", str(data_dir / "train.h5"),
        "--output_dir", str(out),
        "--output_tag", "smoke",
        "--max_steps", "8",
        "--eval_steps", "4",
        "--save_steps", "4",
        "--logging_steps", "2",
        "--per_device_train_batch_size", "2",
        "--per_device_eval_batch_size", "2",
        "--learning_rate", "1e-3",
        "--val_split", "0.3",
        "--eval_sample_fraction", "1.0",
        "--wer_weight", "0.7",
        "--generation_max_length", "24",
        "--target_language", "german",
        "--random_seed", "0",
        *extra,
    ])


def test_full_finetune_e2e(data_dir, tmp_path):
    args = _args(data_dir, tmp_path)
    result = run_lib.run_trial(args)
    assert result["final_step"] == 8
    assert "eval_loss" in result and np.isfinite(result["eval_loss"])
    assert "eval_wer" in result
    assert result["eval_loss_wer"] == pytest.approx(
        0.3 * result["eval_loss"] + 0.7 * result["eval_wer"], rel=1e-6)

    out = tmp_path / "smoke"
    hist = read_metrics_history(str(out))
    assert any("eval_loss" in h for h in hist)
    assert any("loss" in h for h in hist)
    assert os.path.exists(out / "config.txt")
    assert os.path.exists(out / "trial_manifest.json")
    ckpts = os.listdir(out / "checkpoints")
    assert len([c for c in ckpts if c.isdigit()]) >= 1


def test_resume_continues(data_dir, tmp_path):
    args = _args(data_dir, tmp_path)
    run_lib.run_trial(args)
    args2 = _args(data_dir, tmp_path, extra=["--max_steps", "12",
                                             "--resume_training"])
    result = run_lib.run_trial(args2)
    assert result["final_step"] == 12


def test_peft_e2e(data_dir, tmp_path):
    args = _args(data_dir, tmp_path, extra=[
        "--peft", "--lora_rank", "4", "--lora_alpha", "8"])
    result = run_lib.run_trial(args)
    assert result["final_step"] == 8
    assert np.isfinite(result["eval_loss"])


def test_peft_offload_e2e(data_dir, tmp_path):
    """--offload_optimizer/--offload_param through the full run.py wiring:
    host placements built in run_trial, gathered inside the jitted step,
    eval decodes from an HBM copy of the host-resident base (ZeRO-offload
    analogue; unit-level numerics in tests/test_host_offload.py)."""
    import jax
    args = _args(data_dir, tmp_path, extra=[
        "--peft", "--lora_rank", "4", "--lora_alpha", "8",
        "--offload_optimizer", "--offload_param"])
    result = run_lib.run_trial(args)
    assert result["final_step"] == 8
    assert np.isfinite(result["eval_loss"])
    assert "eval_wer" in result
