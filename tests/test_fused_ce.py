"""Fused chunked cross-entropy: loss and gradient parity with the naive
full-logits path (models/whisper.py cross_entropy), including -100 masking,
label smoothing, non-divisible chunk tails, and the frozen-embed mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.ops.fused_ce import fused_cross_entropy

B, T, D, V = 3, 17, 32, 211  # deliberately ragged vs chunk sizes


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32) * 0.1)
    labels = rng.integers(0, V, (B, T)).astype(np.int32)
    labels[0, -5:] = -100
    labels[2, :3] = -100
    return x, e, jnp.asarray(labels)


def naive(x, e, labels, smoothing=0.0):
    logits = jnp.einsum("btd,vd->btv", x, e,
                        preferred_element_type=jnp.float32)
    return W.cross_entropy(logits, labels, smoothing)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("chunk", [8, 16, 64])
def test_loss_matches_naive(smoothing, chunk):
    x, e, labels = _data()
    l0, n0 = naive(x, e, labels, smoothing)
    l1, n1 = fused_cross_entropy(x, e, labels, smoothing, chunk)
    assert int(n0) == int(n1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_grads_match_naive(smoothing):
    x, e, labels = _data(1)

    g0 = jax.grad(lambda x_, e_: naive(x_, e_, labels, smoothing)[0],
                  argnums=(0, 1))(x, e)
    g1 = jax.grad(lambda x_, e_: fused_cross_entropy(
        x_, e_, labels, smoothing, 16)[0], argnums=(0, 1))(x, e)
    np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]),
                               atol=1e-5, rtol=1e-4)


def test_frozen_embed_mode_matches_dx():
    x, e, labels = _data(2)
    dx_full = jax.grad(lambda x_: fused_cross_entropy(
        x_, e, labels, 0.0, 16, True)[0])(x)
    dx_frozen = jax.grad(lambda x_: fused_cross_entropy(
        x_, e, labels, 0.0, 16, False)[0])(x)
    np.testing.assert_allclose(np.asarray(dx_full), np.asarray(dx_frozen),
                               atol=1e-6)


def test_train_step_fused_vs_naive_loss():
    """End-to-end: fused_ce=True and False produce the same loss and the
    same adapter update on a nano PEFT step."""
    import optax
    from asr_finetune_tpu.models.configs import get_config
    from asr_finetune_tpu.training import lora as lora_lib
    from asr_finetune_tpu.training.train_step import (
        TrainStepConfig, make_train_state, make_train_step)

    cfg = get_config("test-nano")
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0, dropout=0.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), cfg, lcfg)
    tx = optax.sgd(1e-2)
    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (2, 60, cfg.num_mel_bins)).astype(np.float32)),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 200, (2, 10)).astype(np.int32)),
        "labels": jnp.asarray(rng.integers(0, 200, (2, 10)).astype(np.int32)),
    }

    losses, deltas = [], []
    for fused in (True, False):
        tcfg = TrainStepConfig(mode="peft", compute_dtype=jnp.float32,
                               remat=False, lora=lcfg, fused_ce=fused)
        state = make_train_state(params, tx,
                                 adapters=jax.tree.map(lambda x: x, adapters))
        step = make_train_step(cfg, tx, tcfg)
        new_state, m = step(state, batch)
        losses.append(float(m["loss"]))
        deltas.append(np.asarray(
            new_state["adapters"]["decoder"]["self_attn"]["q"]["a"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    np.testing.assert_allclose(deltas[0], deltas[1], atol=1e-5, rtol=1e-4)
