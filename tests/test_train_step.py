"""Train step semantics: loss decreases, PEFT trains only adapters,
grad accumulation matches large-batch grads, schedules behave."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import get_config
from asr_finetune_tpu.training import lora as lora_lib
from asr_finetune_tpu.training import optim
from asr_finetune_tpu.training.train_step import (
    TrainStepConfig, make_train_state, make_train_step)

CFG = get_config("test-nano")


def _batch(rng, B=4, T=8, frames=60):
    mel = jnp.asarray(rng.standard_normal((B, frames, CFG.num_mel_bins)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 200, (B, T)).astype(np.int32))
    labels = jnp.concatenate([toks[:, 1:], jnp.full((B, 1), 256, jnp.int32)], axis=1)
    return {"mel": mel, "decoder_input_ids": toks, "labels": labels}


@pytest.mark.slow  # multi-minute on CPU (tests/README.md timings)
def test_full_finetune_loss_decreases():
    params = W.init_params(jax.random.PRNGKey(0), CFG)
    tx = optim.make_optimizer(1e-3, max_steps=50, scheduler="constant")
    cfg = TrainStepConfig(mode="full", compute_dtype=jnp.float32, remat=False)
    state = make_train_state(params, tx)
    step = jax.jit(make_train_step(CFG, tx, cfg))
    batch = _batch(np.random.default_rng(0))
    state, m0 = step(state, batch)
    for _ in range(30):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"]) * 0.6, (float(m0["loss"]), float(m["loss"]))
    assert int(state["step"]) == 31


def test_peft_only_adapters_change():
    params = W.init_params(jax.random.PRNGKey(0), CFG)
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), CFG, lcfg)
    tx = optim.make_optimizer(1e-3, max_steps=50, scheduler="constant")
    cfg = TrainStepConfig(mode="peft", compute_dtype=jnp.float32, remat=False, lora=lcfg)
    state = make_train_state(params, tx, adapters=adapters)
    step = jax.jit(make_train_step(CFG, tx, cfg))
    batch = _batch(np.random.default_rng(0))
    s0_params = jax.tree.map(lambda x: np.asarray(x), state["params"])
    state, m0 = step(state, batch)
    for _ in range(10):
        state, m = step(state, batch)
    # base params untouched
    for a, b in zip(jax.tree.leaves(s0_params), jax.tree.leaves(state["params"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    # adapters moved, loss decreased
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree.leaves(adapters), jax.tree.leaves(state["adapters"]))]
    assert max(diffs) > 0
    assert float(m["loss"]) < float(m0["loss"])


@pytest.mark.slow  # multi-minute on CPU (tests/README.md timings)
def test_grad_accum_matches_full_batch():
    params = W.init_params(jax.random.PRNGKey(0), CFG)
    import optax as ox
    tx = ox.sgd(1e-2)
    rng = np.random.default_rng(0)
    big = _batch(rng, B=8)

    cfg1 = TrainStepConfig(mode="full", compute_dtype=jnp.float32, remat=False)
    state1 = make_train_state(params, tx)
    s1, _ = jax.jit(make_train_step(CFG, tx, cfg1))(state1, big)

    micro = jax.tree.map(lambda x: x.reshape((4, 2) + x.shape[1:]), big)
    cfg2 = TrainStepConfig(mode="full", compute_dtype=jnp.float32, remat=False,
                           accum_steps=4)
    state2 = make_train_state(params, tx)
    s2, _ = jax.jit(make_train_step(CFG, tx, cfg2))(state2, micro)

    for a, b in zip(jax.tree.leaves(s1["params"]), jax.tree.leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_lr_schedules():
    s = optim.make_lr_schedule(1e-3, 100, "linear", warmup_steps=10)
    assert float(s(0)) < 2e-4
    assert abs(float(s(10)) - 1e-3) < 1e-6
    assert float(s(100)) < 1e-5
    c = optim.make_lr_schedule(1e-3, 100, "cosine", warmup_ratio=0.1)
    assert abs(float(c(10)) - 1e-3) < 1e-6
    assert float(c(100)) < float(c(50))


def test_w8a8_train_step_matches_dequant_structure():
    """--int8_matmul: the W8A8 step runs, produces a finite loss close to
    the dequant-path loss (same quantized weights, extra activation
    rounding only), and updates ONLY the adapters."""
    from asr_finetune_tpu.ops import quant
    from asr_finetune_tpu.training import lora as lora_lib

    cfg = get_config("test-nano")
    tx = optim.make_optimizer(1e-3, max_steps=10)
    rng = np.random.default_rng(11)
    audio = jnp.asarray(rng.standard_normal((2, 48000)).astype(np.float32) * 0.1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size - 20, (2, 8)).astype(np.int32))
    batch = {"audio": audio, "decoder_input_ids": toks, "labels": toks}
    lcfg = lora_lib.LoraConfig(rank=2, alpha=4.0, dropout=0.0)

    losses = {}
    for int8c in (False, True):
        params = quant.quantize_tree_int8(W.init_params(jax.random.PRNGKey(0), cfg))
        adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), cfg, lcfg)
        quant.set_int8_compute(int8c)
        try:
            tcfg = TrainStepConfig(mode="peft", compute_dtype=jnp.float32,
                                   remat=False, on_device_logmel=True,
                                   n_mels=cfg.num_mel_bins, lora=lcfg,
                                   max_steps=10)
            state = make_train_state(params, tx, adapters=adapters)
            step = jax.jit(make_train_step(cfg, tx, tcfg))
            state, metrics = step(state, batch)
            losses[int8c] = float(metrics["loss"])
            # frozen base untouched; adapters moved
            np.testing.assert_array_equal(
                np.asarray(state["params"]["decoder"]["layers"]["self_attn"]["q"]["w_q8"]),
                np.asarray(params["decoder"]["layers"]["self_attn"]["q"]["w_q8"]))
            # b (zero-init) gets the first nonzero gradient ((x@A)^T dy);
            # a's grad is dy@B^T = 0 until b moves
            b0 = adapters["decoder"]["self_attn"]["q"]["b"]
            b1 = state["adapters"]["decoder"]["self_attn"]["q"]["b"]
            assert not np.allclose(np.asarray(b0), np.asarray(b1))
        finally:
            quant.set_int8_compute(False)
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=0.02)
