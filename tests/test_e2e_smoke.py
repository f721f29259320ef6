"""Minimal UNMARKED e2e smoke: one tiny run_trial through the full config →
data → train → eval → checkpoint wiring, kept in the CI subset so the
end-to-end path never loses regular coverage (the thorough e2e matrix —
resume, offload, full-FT — is `slow`, tests/test_e2e.py)."""
import numpy as np

from asr_finetune_tpu import config as config_lib
from asr_finetune_tpu import run as run_lib
from asr_finetune_tpu.data.hdf5 import make_synthetic_dataset


def test_peft_trial_smoke(tmp_path):
    make_synthetic_dataset(str(tmp_path / "train.h5"), n=24, seed=0,
                           min_sec=0.5, max_sec=1.0)
    args = config_lib.parse_args([
        "--model_type", "test-nano",
        "--dataset_name", str(tmp_path / "train.h5"),
        "--output_dir", str(tmp_path / "out"),
        "--output_tag", "smoke",
        "--peft", "--lora_rank", "2", "--lora_alpha", "4",
        "--max_steps", "2",
        "--eval_steps", "2",
        "--save_steps", "2",
        "--logging_steps", "1",
        "--per_device_train_batch_size", "2",
        "--per_device_eval_batch_size", "2",
        "--learning_rate", "1e-3",
        "--val_split", "0.3",
        "--eval_sample_fraction", "1.0",
        "--generation_max_length", "12",
        "--target_language", "german",
        "--random_seed", "0",
    ])
    result = run_lib.run_trial(args)
    assert result["final_step"] == 2
    assert np.isfinite(result["eval_loss"])
    assert "eval_wer" in result
