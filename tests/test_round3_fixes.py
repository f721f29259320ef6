"""Round-3 fixes (VERDICT r2):

#1  Reference-parity adapter placement — --lora_targets all adapts encoder
    self-attention q/v too (PEFT target_modules=["q_proj","v_proj"]
    suffix-matches the whole model, reference trainers.py:525), and those
    encoder adapters actually receive non-zero updates.
#3  The training-step RNG (SpecAugment + LoRA dropout) is seeded from the
    trial seed: different seeds => different augmentation noise, same seed
    => bit-identical replay.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from asr_finetune_tpu.config import parse_args
from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import get_config
from asr_finetune_tpu.training import lora as lora_lib
from asr_finetune_tpu.training import optim
from asr_finetune_tpu.training.train_step import (
    TrainStepConfig, make_train_state, make_train_step)
from asr_finetune_tpu.utils import flops as F

CFG = get_config("test-nano")


def _batch(rng, B=4, T=8, frames=60):
    mel = jnp.asarray(
        rng.standard_normal((B, frames, CFG.num_mel_bins)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 200, (B, T)).astype(np.int32))
    labels = jnp.concatenate(
        [toks[:, 1:], jnp.full((B, 1), 256, jnp.int32)], axis=1)
    return {"mel": mel, "decoder_input_ids": toks, "labels": labels}


def _peft_state_and_step(lcfg, seed=0, encoder=True, steps_cfg=None):
    params = jax.tree.map(lambda x: x.astype(jnp.float32),
                          W.init_params(jax.random.PRNGKey(0), CFG))
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), CFG, lcfg,
                                      encoder=encoder)
    tx = optim.make_optimizer(
        1e-3, max_steps=50, scheduler="constant",
        trainable_mask=optim.adapter_freeze_mask(adapters, lcfg.adalora))
    cfg = steps_cfg or TrainStepConfig(
        mode="peft", compute_dtype=jnp.float32, remat=False, lora=lcfg,
        seed=seed)
    state = make_train_state(params, tx, adapters=adapters)
    return state, jax.jit(make_train_step(CFG, tx, cfg))


def test_lora_targets_all_is_default_flag():
    args = parse_args(["--peft"])
    assert args.lora_targets == "all"
    args = parse_args(["--peft", "--lora_targets", "decoder"])
    assert args.lora_targets == "decoder"


def test_encoder_adapters_receive_nonzero_updates():
    """VERDICT r2 task 1 'done' criterion: under --peft --lora_targets all
    the ENCODER adapters move (b starts at exactly zero, so any nonzero b
    proves a real gradient reached it through the encoder backward)."""
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0, dropout=0.0)
    state, step = _peft_state_and_step(lcfg, encoder=True)
    assert "encoder" in state["adapters"]
    base0 = jax.tree.map(np.asarray, state["params"])
    for _ in range(5):
        state, m = step(state, _batch(np.random.default_rng(0)))
    for t in ("q", "v"):
        enc_ad = state["adapters"]["encoder"][t]
        assert float(jnp.abs(enc_ad["b"]).max()) > 0.0, t
        assert float(jnp.abs(enc_ad["a"]).max()) > 0.0, t
    # frozen base still untouched
    for a, b in zip(jax.tree.leaves(base0), jax.tree.leaves(state["params"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert np.isfinite(float(m["loss"]))


def test_decoder_only_placement_leaves_encoder_unadapted():
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), CFG, lcfg,
                                      encoder=False)
    assert "encoder" not in adapters


@pytest.mark.slow  # multi-minute on CPU (tests/README.md timings)
def test_step_rng_seed_controls_augmentation():
    """Same seed => bit-identical adapters after a dropout-active step;
    different seed => different adapters (the dropout masks differ)."""
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0, dropout=0.5)
    batch = _batch(np.random.default_rng(0))

    def run(seed):
        state, step = _peft_state_and_step(lcfg, seed=seed, encoder=True)
        state, _ = step(state, batch)
        return jax.tree.map(np.asarray, state["adapters"])

    a0, a0_replay, a1 = run(0), run(0), run(1)
    for x, y in zip(jax.tree.leaves(a0), jax.tree.leaves(a0_replay)):
        np.testing.assert_array_equal(x, y)
    diffs = [np.abs(x - y).max()
             for x, y in zip(jax.tree.leaves(a0), jax.tree.leaves(a1))]
    assert max(diffs) > 0.0


@pytest.mark.slow  # multi-minute on CPU (tests/README.md timings)
def test_spec_augment_rng_seed_varies():
    """Full fine-tune with SpecAugment: different TrainStepConfig.seed =>
    different masks => different first-step grads/params."""
    params = jax.tree.map(lambda x: x.astype(jnp.float32),
                          W.init_params(jax.random.PRNGKey(0), CFG))
    import optax as ox
    tx = ox.sgd(1e-2)
    batch = _batch(np.random.default_rng(1), frames=64)

    def run(seed):
        cfg = TrainStepConfig(mode="full", compute_dtype=jnp.float32,
                              remat=False, spec_augment=True, seed=seed)
        state = make_train_state(params, tx)
        state, _ = jax.jit(make_train_step(CFG, tx, cfg))(state, batch)
        return jax.tree.map(np.asarray, state["params"])

    p0, p0_replay, p1 = run(0), run(0), run(7)
    for x, y in zip(jax.tree.leaves(p0), jax.tree.leaves(p0_replay)):
        np.testing.assert_array_equal(x, y)
    diffs = [np.abs(x - y).max()
             for x, y in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))]
    assert max(diffs) > 0.0


def test_flops_account_for_encoder_backward():
    enc = F.encoder_flops(CFG, batch=8, frames=3000)
    dec = F.decoder_flops(CFG, batch=8, label_len=192)
    all_f = F.train_step_flops(CFG, 8, 192, mode="peft", encoder_adapted=True)
    dec_f = F.train_step_flops(CFG, 8, 192, mode="peft", encoder_adapted=False)
    assert np.isclose(all_f, 2.0 * (enc + dec))
    assert np.isclose(dec_f, enc + 2.0 * dec)
    assert all_f > dec_f
    assert np.isclose(F.train_step_flops(CFG, 8, 192, mode="full"),
                      3.0 * (enc + dec))


def test_run_trial_threads_trial_seed():
    """run.run_trial folds trial_index into TrainStepConfig.seed (smoke:
    signature accepts trial_index; the arithmetic is trivially distinct)."""
    import inspect
    from asr_finetune_tpu import run as run_lib
    sig = inspect.signature(run_lib.run_trial)
    assert "trial_index" in sig.parameters


# ---------------------------------------------------------------------------
# ADVICE r2 fixes: fused-decode head-dim gating, env parsing, w_scale dtype
# ---------------------------------------------------------------------------

def test_fused_decode_rejects_non64_head_dim():
    """ADVICE r2 (medium): explicit fused=True with head_dim != 64 must fail
    loudly instead of silently mis-grouping heads."""
    import pytest
    from asr_finetune_tpu.evaluation import decode as Dec
    assert CFG.d_model // CFG.decoder_heads != 64  # test-nano: 32-dim heads
    params = W.init_params(jax.random.PRNGKey(0), CFG)
    mel = jnp.zeros((1, 2 * CFG.max_source_positions, CFG.num_mel_bins))
    with pytest.raises(ValueError, match="64-dim heads"):
        Dec.greedy_decode(params, mel, CFG, [CFG.sot_token_id], 8,
                          compute_dtype=jnp.float32, fused=True)


def test_fused_default_gates_on_head_dim(monkeypatch):
    from asr_finetune_tpu.evaluation import decode as Dec
    monkeypatch.setenv("ASR_TPU_FUSED_DECODE", "1")
    import warnings
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert Dec._fused_default(CFG) is False  # head_dim 32 -> fall back
        assert any("head_dim" in str(x.message) for x in w)
    import dataclasses
    cfg64 = dataclasses.replace(CFG, encoder_heads=1, decoder_heads=1)
    assert Dec._fused_default(cfg64) is True
    monkeypatch.setenv("ASR_TPU_FUSED_DECODE", "off")
    assert Dec._fused_default(cfg64) is False
    monkeypatch.setenv("ASR_TPU_FUSED_DECODE", "maybe")
    import pytest
    with pytest.raises(ValueError, match="ASR_TPU_FUSED_DECODE"):
        Dec._fused_default(cfg64)


def test_cast_decoder_weights_keeps_int8_scales_fp32():
    """ADVICE r2 (low): fp32 int8 dequant scales must not be rounded to the
    compute dtype by the fused path's weight pre-cast."""
    from asr_finetune_tpu.evaluation.decode import _cast_decoder_weights
    from asr_finetune_tpu.ops.quant import quantize_tree_int8
    params = W.init_params(jax.random.PRNGKey(0), CFG)
    dec = dict(params["decoder"])
    dec["layers"] = quantize_tree_int8(dec["layers"])
    params = {**params, "decoder": dec}
    cast = _cast_decoder_weights(params, jnp.bfloat16)
    q = cast["decoder"]["layers"]["self_attn"]["q"]
    assert q["w_q8"].dtype == jnp.int8
    assert q["w_scale"].dtype == jnp.float32
    assert cast["decoder"]["embed"].dtype == jnp.bfloat16


# ---------------------------------------------------------------------------
# VERDICT r2 task 6: multi-host eval reads are sharded per process
# ---------------------------------------------------------------------------

def test_multihost_eval_reads_are_sharded(tmp_path, monkeypatch):
    """Each process reads audio for ~1/process_count of the eval shard; the
    assembled local slices of the two processes reproduce the full-read
    batch exactly (so global metrics are unchanged)."""
    from asr_finetune_tpu import config as config_lib
    from asr_finetune_tpu import run as run_lib
    from asr_finetune_tpu.data.hdf5 import (Hdf5AudioReader,
                                            make_synthetic_dataset)
    from asr_finetune_tpu.models.configs import get_config

    make_synthetic_dataset(str(tmp_path / "d.h5"), n=32, seed=0,
                           min_sec=0.3, max_sec=0.6)
    args = config_lib.parse_args([
        "--model_type", "test-nano",
        "--dataset_name", str(tmp_path / "d.h5"),
        "--per_device_eval_batch_size", "8",
        "--val_split", "0.5",
        "--eval_sample_fraction", "1.0",
        "--random_seed", "0",
    ])
    from asr_finetune_tpu.models.tokenizer import load_tokenizer
    tok = load_tokenizer(None)

    counts = {"rows": 0}
    orig_read = Hdf5AudioReader.read

    def counting_read(self, indices):
        indices = list(indices)
        counts["rows"] += len(indices)
        return orig_read(self, indices)

    monkeypatch.setattr(Hdf5AudioReader, "read", counting_read)
    _, eval_fn, _, _ = run_lib.build_data(args, tok, get_config("test-nano"))

    counts["rows"] = 0
    full = eval_fn(0)
    n_full = counts["rows"]
    assert n_full >= 16

    counts["rows"] = 0
    p0 = eval_fn(0, process_index=0, process_count=2)
    n_p0 = counts["rows"]
    counts["rows"] = 0
    p1 = eval_fn(0, process_index=1, process_count=2)
    n_p1 = counts["rows"]
    # audio reads halve per process (transcript reads don't go through read)
    assert n_p0 == n_full // 2, (n_p0, n_full)
    assert n_p1 == n_full // 2

    assert len(full) == len(p0) == len(p1)
    for fb, b0, b1 in zip(full, p0, p1):
        half = fb["audio"].shape[0] // 2
        np.testing.assert_array_equal(b0["audio"][:half], fb["audio"][:half])
        np.testing.assert_array_equal(b1["audio"][half:], fb["audio"][half:])
        # non-local rows carry no real audio
        assert float(np.abs(b0["audio"][half:]).max()) == 0.0
        assert float(np.abs(b1["audio"][:half]).max()) == 0.0
        # labels/texts identical everywhere (consistent buckets + WER refs)
        np.testing.assert_array_equal(b0["labels"], fb["labels"])
        np.testing.assert_array_equal(b1["labels"], fb["labels"])
        assert list(b0["text"]) == list(fb["text"]) == list(b1["text"])
        assert b0["n_valid"] == fb["n_valid"] == b1["n_valid"]
