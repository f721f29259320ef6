"""The real-checkpoint parity gauntlet (cli/verify_parity.py).

Two layers:
- mechanics: the whole 6-stage gauntlet runs green against a TINY
  random-init HF checkpoint dir written with save_pretrained — the same
  convert → f64 logits → frontend → greedy/beam token parity → WER chain
  a first hardware user will run against real whisper-large-v3 weights;
- real weights: skipped unless ASR_TPU_HF_CKPT points at a downloaded HF
  Whisper checkpoint dir (this build environment is air-gapped). See
  MIGRATION.md "Verifying parity on real weights".
"""
import os

import pytest

REAL_CKPT = os.environ.get("ASR_TPU_HF_CKPT")


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    import torch
    from transformers import (WhisperConfig, WhisperFeatureExtractor,
                              WhisperForConditionalGeneration)

    d = tmp_path_factory.mktemp("tiny_hf_ckpt")
    hf_cfg = WhisperConfig(
        vocab_size=120, num_mel_bins=80, d_model=64, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=64, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=[], begin_suppress_tokens=[],
    )
    torch.manual_seed(0)
    m = WhisperForConditionalGeneration(hf_cfg).eval()
    m.generation_config.suppress_tokens = None
    m.generation_config.begin_suppress_tokens = None
    m.generation_config.forced_decoder_ids = None
    m.generation_config.no_timestamps_token_id = 110
    m.save_pretrained(d)
    WhisperFeatureExtractor(feature_size=80).save_pretrained(d)
    return str(d)


def test_gauntlet_mechanics_tiny_checkpoint(tiny_hf_dir, capsys):
    from asr_finetune_tpu.cli import verify_parity

    rc = verify_parity.main(["--hf_dir", tiny_hf_dir, "--rows", "2",
                             "--max_length", "12", "--beams", "2"])
    out = capsys.readouterr().out
    assert rc == 0, out
    for stage in ("convert", "f64_logits", "frontend", "greedy", "beam",
                  "wer_smoke"):
        assert f"[PASS] {stage}" in out, out


@pytest.mark.skipif(
    not REAL_CKPT,
    reason="set ASR_TPU_HF_CKPT=<downloaded HF whisper dir> to certify "
           "parity on real pretrained weights (air-gapped build env)")
def test_gauntlet_on_real_checkpoint():
    from asr_finetune_tpu.cli import verify_parity

    assert verify_parity.main(["--hf_dir", REAL_CKPT, "--rows", "2"]) == 0
