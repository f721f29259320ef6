"""Deployment export (cli/export.py): checkpoint -> merged native npz.

Covers the PEFT merge path end-to-end: train a nano PEFT trial, export
with adapters folded in, reload via models/native_io, and assert the
merged standalone model reproduces the (base + adapters) forward.
"""
import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from asr_finetune_tpu import config as config_lib
from asr_finetune_tpu import run as run_lib
from asr_finetune_tpu.cli import export as export_cli
from asr_finetune_tpu.data.hdf5 import make_synthetic_dataset
from asr_finetune_tpu.models import native_io
from asr_finetune_tpu.models import whisper as W


@pytest.mark.slow  # multi-minute on CPU (tests/README.md timings)
def test_export_merged_model_matches_adapter_forward(tmp_path):
    data = str(tmp_path / "train.h5")
    make_synthetic_dataset(data, n=48, seed=0, min_sec=0.5, max_sec=1.0)
    base_args = [
        "--model_type", "test-nano",
        "--dataset_name", data,
        "--output_dir", str(tmp_path),
        "--output_tag", "exp",
        "--max_steps", "4", "--eval_steps", "4", "--save_steps", "4",
        "--per_device_train_batch_size", "2",
        "--per_device_eval_batch_size", "2",
        "--val_split", "0.25", "--eval_sample_fraction", "1.0",
        "--generation_max_length", "8",
        "--peft", "--lora_rank", "4", "--lora_alpha", "8",
        "--random_seed", "0",
    ]
    args = config_lib.parse_args(base_args)
    run_lib.run_trial(args)
    ckpt_dir = os.path.join(str(tmp_path), "exp", "checkpoints")

    out = str(tmp_path / "merged_model")
    adp = str(tmp_path / "adapters.npz")
    export_cli.main(["--checkpoint_dir", ckpt_dir,
                     "--export_dir", out,
                     "--adapter_path", adp] + base_args)
    assert os.path.exists(os.path.join(out, "params.npz"))
    assert os.path.exists(adp)

    merged, cfg = native_io.load_params(out)
    assert cfg.d_model > 0

    # reference forward: raw base + restored adapters
    from asr_finetune_tpu.training import lora as lora_lib
    from asr_finetune_tpu.training import optim as optim_lib
    from asr_finetune_tpu.training.checkpoint import CheckpointManager
    from asr_finetune_tpu.training.train_step import make_train_state
    built = run_lib.build_model(args)
    freeze = optim_lib.adapter_freeze_mask(built.adapters, False)
    tx = optim_lib.make_optimizer(1e-4, max_steps=4, trainable_mask=freeze)
    state = make_train_state(built.params, tx, adapters=built.adapters)
    mgr = CheckpointManager(ckpt_dir, adapter_only=True)
    state = mgr.restore(state, step=mgr.best_step())
    mgr.close()

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (2, 60, built.cfg.num_mel_bins)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 200, (2, 6)).astype(np.int32))
    ref = W.forward(built.params, mel, toks, built.cfg,
                    adapters=state["adapters"],
                    compute_dtype=jnp.float32, remat=False)
    got = W.forward(merged, mel, toks, cfg, adapters=None,
                    compute_dtype=jnp.float32, remat=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # the adapters actually trained: the merged weights differ from the
    # untouched base on at least one adapted projection
    base_q = np.asarray(
        built.params["decoder"]["layers"]["self_attn"]["q"]["w"])
    merged_q = np.asarray(
        merged["decoder"]["layers"]["self_attn"]["q"]["w"])
    assert np.abs(base_q - merged_q).max() > 0
