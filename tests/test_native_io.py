"""Native checkpoint format: roundtrip + prepare_model CLI from an HF dir."""
import json
import os

import jax
import numpy as np
import pytest

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import get_config
from asr_finetune_tpu.models.native_io import (is_native_checkpoint,
                                               load_params, save_params)


def test_roundtrip(tmp_path):
    cfg = get_config("test-nano")
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    save_params(str(tmp_path / "ckpt"), params, cfg)
    assert is_native_checkpoint(str(tmp_path / "ckpt"))
    params2, cfg2 = load_params(str(tmp_path / "ckpt"))
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prepare_model_cli(tmp_path):
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    hf_dir = tmp_path / "hf"
    hf_cfg = WhisperConfig(
        vocab_size=300, num_mel_bins=80, d_model=64, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=256, decoder_ffn_dim=256, max_source_positions=150,
        max_target_positions=64, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=3)
    torch.manual_seed(0)
    WhisperForConditionalGeneration(hf_cfg).save_pretrained(str(hf_dir))

    from asr_finetune_tpu.cli import prepare_model
    out = tmp_path / "native"
    prepare_model.main(["--hf_dir", str(hf_dir), "--output", str(out),
                        "--verify"])
    assert is_native_checkpoint(str(out))
    params, cfg = load_params(str(out))
    assert cfg.d_model == 64
