"""Round-2 fidelity fixes: config boolean flags, length-grouped batching,
exact batch sizes under bad rows, eval-shard tail padding, int8 TP layout."""
import os

import jax
import numpy as np
import pytest

from asr_finetune_tpu import config as config_lib


# ------------------------------------------------------------------ config

def test_config_file_false_disables_default_true_flag(tmp_path):
    cfg = tmp_path / "t.config"
    cfg.write_text("bf16 = false\ngradient_checkpointing = false\n"
                   "on_device_logmel = false\npeft = true\n")
    args = config_lib.parse_args(["-c", str(cfg)])
    assert args.bf16 is False
    assert args.gradient_checkpointing is False
    assert args.on_device_logmel is False
    assert args.peft is True


def test_cli_no_flag_overrides_config_true(tmp_path):
    cfg = tmp_path / "t.config"
    cfg.write_text("bf16 = true\n")
    args = config_lib.parse_args(["-c", str(cfg), "--no-bf16"])
    assert args.bf16 is False


# ---------------------------------------------------------------- sampler

def test_length_grouped_batches_reduce_padding():
    from asr_finetune_tpu.data.pipeline import IndexSampler

    rng = np.random.default_rng(0)
    lengths = rng.integers(1, 400, size=512)
    B = 8

    def padding_waste(sampler):
        waste = 0
        for batch in sampler.batches(epoch=0):
            l = lengths[batch]
            waste += int((l.max() - l).sum())
        return waste

    plain = IndexSampler(512, B, seed=1)
    grouped = IndexSampler(512, B, seed=1, lengths=lengths)
    w_plain, w_grouped = padding_waste(plain), padding_waste(grouped)
    assert w_grouped < 0.35 * w_plain, (w_plain, w_grouped)
    # still a permutation (every row exactly once)
    seen = np.concatenate(list(grouped.batches(0)))
    assert sorted(seen.tolist()) == list(range(512))
    # different epochs give different orders (shuffle still active)
    e0 = np.concatenate(list(grouped.batches(0)))
    e1 = np.concatenate(list(grouped.batches(1)))
    assert not np.array_equal(e0, e1)


def test_pipeline_pads_short_reads_to_exact_batch():
    from asr_finetune_tpu.data.pipeline import DataPipeline, IndexSampler

    class FlakyReader:
        def read(self, idx):
            # drop every index divisible by 3 ("bad rows")
            return [(int(i), np.zeros(16, np.float32), "hallo welt")
                    for i in idx if int(i) % 3 != 0]

    def collator(rows):
        return {"x": np.stack([r[1] for r in rows]),
                "idx": np.asarray([r[0] for r in rows])}

    pipe = DataPipeline(FlakyReader(), collator, IndexSampler(64, 8, seed=0),
                        telemetry_every=0)
    it = pipe.iter_from_step(0)
    for _ in range(6):
        batch = next(it)
        assert batch["x"].shape[0] == 8, batch["x"].shape


# -------------------------------------------------------------- eval tails

def test_eval_batches_cover_all_utterances_with_padded_tail(tmp_path):
    from asr_finetune_tpu.data.hdf5 import make_synthetic_dataset

    h5 = str(tmp_path / "d.h5")
    make_synthetic_dataset(h5, n=21, max_sec=2.0)
    args = config_lib.parse_args([
        "--model_type", "test-nano", "--dataset_name", h5,
        "--per_device_eval_batch_size", "8", "--eval_sample_fraction", "1.0",
        "--val_split", "0.99"])  # nearly all rows to val → 20 val rows
    from asr_finetune_tpu.models.configs import get_config
    from asr_finetune_tpu.models.tokenizer import load_tokenizer
    from asr_finetune_tpu.run import build_data

    tok = load_tokenizer(None)
    _, eval_fn, _, num_shards = build_data(args, tok, get_config("test-nano"))
    batches = eval_fn(0)
    # all batches share one compiled shape
    assert all(b["labels"].shape[0] == 8 for b in batches)
    n_valid = sum(int(b["n_valid"]) for b in batches)
    total_rows = sum(b["labels"].shape[0] for b in batches)
    assert n_valid == 20, n_valid          # nothing dropped
    assert total_rows % 8 == 0
    # padded rows are masked out of the loss
    tail = batches[-1]
    nv = int(tail["n_valid"])
    if nv < 8:
        assert (tail["labels"][nv:] == -100).all()


# ------------------------------------------------------------- int8 x TP

def test_tp_shards_int8_base():
    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import get_config
    from asr_finetune_tpu.ops import quant
    from asr_finetune_tpu.parallel import mesh as mesh_lib
    from asr_finetune_tpu.parallel import sharding as sh

    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    cfg = get_config("test-nano")
    params = quant.quantize_tree_int8(
        W.init_params(jax.random.PRNGKey(0), cfg))
    mesh = mesh_lib.create_mesh(data=jax.device_count() // 2, model=2)
    shardings = sh.param_shardings(params, mesh)
    q = shardings["decoder"]["layers"]["self_attn"]["q"]
    from jax.sharding import PartitionSpec as P
    assert q["w_q8"].spec == P(None, None, "model"), q["w_q8"].spec
    assert q["w_scale"].spec == P(None, None, "model")
    o = shardings["decoder"]["layers"]["self_attn"]["o"]
    assert o["w_q8"].spec == P(None, "model", None)
    # sharded int8 step still runs and matches the replicated result
    sharded = sh.shard_tree(params, shardings)
    import jax.numpy as jnp
    mel = jnp.zeros((2, 60, cfg.num_mel_bins), jnp.float32)
    toks = jnp.zeros((2, 8), jnp.int32)
    out_sharded = W.forward(sharded, mel, toks, cfg, compute_dtype=jnp.float32)
    out_repl = W.forward(params, mel, toks, cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_repl),
                               atol=2e-4)
