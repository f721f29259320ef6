"""Observability utils: metrics jsonl, config dumps, throughput timer,
memory stats, step-count bookkeeping."""
import json
import os
import time

from asr_finetune_tpu.utils.logging_utils import (MetricsLogger, dump_config,
                                                  read_metrics_history)
from asr_finetune_tpu.utils.misc import (num_checkpoint_iterations,
                                         steps_per_epoch, total_steps)
from asr_finetune_tpu.utils.profiling import StepTimer, log_memory_usage


def test_metrics_logger_roundtrip(tmp_path):
    ml = MetricsLogger(str(tmp_path), use_tensorboard=False)
    ml.log(10, {"loss": 1.5, "note": "x"})
    ml.log(20, {"loss": 1.2, "eval_wer": 55.0})
    ml.close()
    hist = read_metrics_history(str(tmp_path))
    assert len(hist) == 2
    assert hist[0]["step"] == 10 and hist[0]["loss"] == 1.5
    assert hist[1]["eval_wer"] == 55.0


def test_dump_config_appends(tmp_path):
    dump_config(str(tmp_path), {"lr": 1e-4, "peft": True})
    dump_config(str(tmp_path), {"lr": 2e-4})
    text = (tmp_path / "config.txt").read_text()
    assert text.count("lr = ") == 2
    assert "peft = True" in text


def test_step_timer():
    t = StepTimer()
    t.update(8, 1024)
    t.update(8, 1024)
    time.sleep(0.01)
    r = t.rates()
    assert r["utt_per_sec"] > 0
    assert r["tokens_per_sec"] > r["utt_per_sec"]


def test_log_memory_usage():
    stats = log_memory_usage("test")
    assert isinstance(stats, dict)
    assert stats.get("host_rss_gb", 0) > 0


def test_step_formulas():
    # reference README.md:95-97 formulas
    assert steps_per_epoch(161048, 8) == 20131
    assert total_steps(100, 8, 3) == 39
    assert num_checkpoint_iterations(20131, 2000) == 11
