"""Trainer.evaluate semantics: fused metric math, loss-only fallback when
WER fails (reference custom_seq2seq_trainers.py:125-137), random shard
selection determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import get_config
from asr_finetune_tpu.models.tokenizer import ByteFallbackTokenizer
from asr_finetune_tpu.training.train_step import TrainStepConfig, make_train_state
from asr_finetune_tpu.training.trainer import Trainer, TrainerConfig

CFG = get_config("test-nano")


def _mk_trainer(tmp_path, texts, wer_weight=0.7):
    params = W.init_params(jax.random.PRNGKey(0), CFG)
    tx = optax.sgd(1e-3)
    tok = ByteFallbackTokenizer()
    step_cfg = TrainStepConfig(mode="full", compute_dtype=jnp.float32,
                               remat=False)
    state = make_train_state(params, tx)
    rng = np.random.default_rng(0)
    B = len(texts)
    batch = {
        "mel": rng.standard_normal((B, 60, CFG.num_mel_bins)).astype(np.float32),
        "decoder_input_ids": rng.integers(0, 200, (B, 6)).astype(np.int32),
        "labels": rng.integers(0, 200, (B, 6)).astype(np.int32),
        "text": np.asarray(texts, dtype=object),
    }
    tcfg = TrainerConfig(max_steps=1, eval_steps=1, save_steps=1,
                         wer_weight=wer_weight, generation_max_length=8,
                         eval_num_shards=3, output_dir=str(tmp_path),
                         seed=7)
    return Trainer(CFG, state, tx, step_cfg, tcfg, tok,
                   train_iter=lambda s: iter([]),
                   eval_batches_fn=lambda shard: [batch])


def test_fused_metric_math(tmp_path):
    tr = _mk_trainer(tmp_path, ["hallo welt", "guten tag"])
    m = tr.evaluate(step=4)
    assert set(m) >= {"eval_loss", "eval_wer", "eval_loss_wer", "eval_shard"}
    assert m["eval_loss_wer"] == (0.3 * m["eval_loss"] + 0.7 * m["eval_wer"])


def test_wer_failure_falls_back_to_loss(tmp_path):
    # empty references → corpus WER undefined → loss-only fallback
    tr = _mk_trainer(tmp_path, ["", ""])
    m = tr.evaluate(step=4)
    assert "eval_wer" not in m
    assert m["eval_loss_wer"] == m["eval_loss"]


def test_shard_selection_is_step_seeded(tmp_path):
    tr = _mk_trainer(tmp_path, ["a b"])
    s1 = tr.evaluate(step=10)["eval_shard"]
    s2 = tr.evaluate(step=10)["eval_shard"]
    assert s1 == s2  # deterministic per step
    shards = {tr.evaluate(step=s)["eval_shard"] for s in range(12)}
    assert len(shards) > 1  # varies across steps


def test_eval_with_beam_search(tmp_path):
    tr = _mk_trainer(tmp_path, ["hallo welt", "guten tag"])
    tr.cfg.generation_num_beams = 2
    from asr_finetune_tpu.evaluation import decode as decode_lib
    forced = tr.tokenizer.prefix_tokens(tr.cfg.language, tr.cfg.task)
    tr._decode = decode_lib.make_decode_fn(
        CFG, forced, tr.cfg.generation_max_length, num_beams=2,
        compute_dtype=jnp.float32)
    m = tr.evaluate(step=1)
    assert np.isfinite(m["eval_wer"])
