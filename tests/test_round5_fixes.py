"""Round-5 fix regressions: driver-parseable bench output, calibrated
outlier flags, beam-width routing, multi-host telemetry gather."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bench_emit_record_is_compact_and_parseable(tmp_path, monkeypatch):
    """BENCH_r04 parsed as null: the single fat JSON line outgrew the
    driver's tail capture. emit_record must keep the final stdout line
    under 900 bytes (full matrix goes to bench_matrix.json) and carry the
    headline + one number per matrix entry."""
    import bench

    result = {
        "metric": "utterances/sec/chip (large-v3 LoRA [enc+dec q/v] "
                  "fine-tune, int8 W8A8 base, bs=8, labels=192, "
                  "on-device log-mel)",
        "value": 14.7, "unit": "utt/s/chip", "vs_baseline": 2.45,
        "mfu": 0.44, "model_tflops_per_step": 47.18,
        "baseline": "est. 6 utt/s/A100 " + "x" * 200,  # fat headline row
    }
    matrix = {
        "peft_parity": dict(result),  # main() copies the headline row
        "peft_decoder": {**result, "value": 33.0},
        "full_ft": {**result, "value": 51.0},
        "decode_beam": {"bs8": {"value": 1.7, "seconds_per_batch": 4.7},
                        "bs16": {"skipped": "budget (10s left)"},
                        "bs8_int8": {"error": "RESOURCE_EXHAUSTED: ..."}},
        "decode_greedy": {"bs32": {"value": 6.8}},
    }
    result["matrix"] = matrix  # main() embeds the matrix in the full record
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _p: str(tmp_path))
    line = bench.emit_record(result, matrix)
    assert len(line) < 900, len(line)
    rec = json.loads(line)
    assert rec["value"] == 14.7 and rec["unit"] == "utt/s/chip"
    assert rec["summary"]["peft_decoder"] == 33.0
    assert rec["summary"]["beam_bs8"] == 1.7
    assert rec["summary"]["beam_bs16"] == "skipped"
    assert rec["summary"]["beam_bs8_int8"] == "error"
    assert rec["summary"]["greedy_bs32"] == 6.8
    # the full record landed on disk with the whole matrix
    full = json.loads((tmp_path / "bench_matrix.json").read_text())
    assert full["matrix"] is matrix or full["matrix"] == matrix


def test_int8_outlier_calibrate_flags_default():
    """--int8_outlier_calibrate defaults ON (bnb threshold semantics) with
    threshold 6.0 (bitsandbytes Linear8bitLt default)."""
    from asr_finetune_tpu.config import build_parser
    args = build_parser().parse_args([])
    assert args.int8_outlier_calibrate is True
    assert args.int8_outlier_threshold == 6.0
    assert args.int8_outlier_cols == 8


def test_beam_decode_wide_beam_routes_off_fused_kernel():
    """num_beams > 8 must not reach the quadratic ancestry kernel: auto
    routing picks the cache-reorder path, and an explicit fused=True is
    rejected with a clear error (round-4 advisor finding)."""
    import jax.numpy as jnp

    from asr_finetune_tpu.evaluation import decode as D
    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import WhisperConfig

    cfg = WhisperConfig(
        vocab_size=64, num_mel_bins=16, d_model=8, encoder_layers=1,
        decoder_layers=1, encoder_heads=2, decoder_heads=2,
        d_ff=16, max_source_positions=32, max_target_positions=16,
        eos_token_id=2, sot_token_id=1, translate_token_id=3,
        transcribe_token_id=4, no_timestamps_token_id=5,
        pad_token_id=0)
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((1, 64, 16))
    with pytest.raises(ValueError, match="num_beams <= 8"):
        D.beam_decode(params, mel, cfg, [1], max_length=4, num_beams=9,
                      fused=True, compute_dtype=jnp.float32)
    # auto (fused=None) silently takes the reorder path and works
    toks, _ = D.beam_decode(params, mel, cfg, [1], max_length=4,
                            num_beams=9, compute_dtype=jnp.float32)
    assert np.asarray(toks).shape[0] == 1


def test_flash_available_not_poisoned_by_calibration_env(monkeypatch):
    """int8-outlier calibration temporarily sets ASR_TPU_ATTN_IMPL=xla
    around a CPU-backend forward (run.py, bench.py). When the whole
    _flash_available predicate was lru_cached, any dispatch inside that
    window cached False for the REST OF THE PROCESS, so the subsequent
    real train-step trace silently lost the Pallas attention kernels —
    a deterministic ~2x parity-step regression (7.56 vs 14.7 utt/s/chip,
    round 5). The env-var escape hatch must be re-read on every call."""
    from asr_finetune_tpu.ops import attention as A

    monkeypatch.setattr(A, "_flash_import_ok", lambda: True)
    monkeypatch.delenv("ASR_TPU_ATTN_IMPL", raising=False)
    assert A._flash_available() is True
    # calibration window: env set, dispatch happens (the poisoning call)
    monkeypatch.setenv("ASR_TPU_ATTN_IMPL", "xla")
    assert A._flash_available() is False
    # window closed: the next trace must get the kernels back
    monkeypatch.delenv("ASR_TPU_ATTN_IMPL")
    assert A._flash_available() is True


import jax  # noqa: E402  (used by the routing test above)


def test_device_prefetch_reraises_producer_exception():
    """A pipeline error inside the prefetch producer thread must surface
    to the training loop as the ORIGINAL exception, not a bare
    StopIteration (found via the unmarked e2e smoke: the per-process-shard
    < global-batch ValueError died silently in the thread)."""
    from asr_finetune_tpu.data.pipeline import device_prefetch

    def bad_iter():
        yield {"labels": np.zeros((2, 4), np.int32)}
        raise ValueError("shard smaller than batch")

    it = device_prefetch(bad_iter(), sharding=None)
    next(it)  # the good batch flows through
    with pytest.raises(ValueError, match="shard smaller"):
        next(it)
