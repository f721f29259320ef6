"""LoRA/AdaLoRA mechanics: zero-init delta, scaling, rank budget schedule,
sensitivity masking, orthogonality regularizer."""
import jax
import jax.numpy as jnp
import numpy as np

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import get_config
from asr_finetune_tpu.training import lora as lora_lib

CFG = get_config("test-nano")


def test_fresh_adapters_are_identity():
    """b=0 init → adapter delta is zero → forward equals no-adapter forward."""
    params = W.init_params(jax.random.PRNGKey(0), CFG)
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), CFG, lcfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 60, CFG.num_mel_bins)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 200, (1, 6)).astype(np.int32))
    base = W.forward(params, mel, toks, CFG, compute_dtype=jnp.float32)
    with_ad = W.forward(params, mel, toks, CFG, adapters=adapters,
                        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_ad), atol=1e-6)


def test_scaling_is_alpha_over_rank():
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0)
    assert lcfg.scaling == 2.0
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(0), CFG, lcfg)
    s = adapters["decoder"]["self_attn"]["q"]["scaling"]
    assert s.shape == (CFG.decoder_layers,)
    assert float(s[0]) == 2.0


def test_rank_budget_schedule():
    lcfg = lora_lib.LoraConfig(rank=8, adalora=True, target_rank=2,
                               tinit_frac=0.1, tfinal_frac=0.8)
    max_steps = 1000
    # before tinit: full rank
    assert float(lora_lib.rank_budget(jnp.int32(50), max_steps, lcfg)) == 8.0
    # after tfinal: target rank
    assert float(lora_lib.rank_budget(jnp.int32(900), max_steps, lcfg)) == 2.0
    # monotone decreasing in between
    mid = [float(lora_lib.rank_budget(jnp.int32(s), max_steps, lcfg))
           for s in (100, 300, 500, 700, 800)]
    assert all(a >= b for a, b in zip(mid, mid[1:]))
    assert 2.0 <= mid[2] <= 8.0


def test_adalora_masking_prunes_e():
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0, adalora=True, target_rank=1,
                               tinit_frac=0.0, tfinal_frac=0.1, delta_t=1)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(0), CFG, lcfg)
    sens = lora_lib.init_sensitivity(adapters)
    mask0 = lora_lib.init_rank_mask(adapters)
    def fake_grad(x):
        g = jnp.full_like(x, 1e-4)
        return g
    grads = jax.tree.map(fake_grad, adapters)
    step = jnp.int32(500)  # past tfinal → budget = target_rank = 1
    new_mask, new_sens = lora_lib.adalora_update_mask(
        adapters, grads, sens, mask0, step, max_steps=1000, cfg=lcfg)
    masked = lora_lib.apply_rank_mask(adapters, new_mask)
    # e entries got masked down to ~budget fraction IN THE FORWARD VIEW...
    total_e = sum(np.asarray(x["e"] != 0).sum()
                  for x in [masked["decoder"]["self_attn"]["q"],
                            masked["decoder"]["self_attn"]["v"],
                            masked["decoder"]["cross_attn"]["q"],
                            masked["decoder"]["cross_attn"]["v"]])
    n_adapters = 4 * CFG.decoder_layers
    # budget 1 per (adapter, layer) → about n_adapters entries survive
    # (ties can keep a few extra)
    assert total_e <= n_adapters * 2, total_e
    assert total_e >= n_adapters // 2
    # ...but the stored adapters are untouched (recoverable pruning)
    stored_e = np.asarray(adapters["decoder"]["self_attn"]["q"]["e"])
    assert (stored_e == 1.0).all()


def test_lora_dropout_active_in_train_deterministic_in_eval():
    """Two train forwards with different rngs differ; no-rng forward is
    deterministic and equals the dropout-free forward in expectation-free
    eval mode (reference trains with lora_dropout=0.05, trainers.py:527)."""
    params = W.init_params(jax.random.PRNGKey(0), CFG)
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0, dropout=0.5)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), CFG, lcfg)
    # make the adapter delta nonzero so dropout is observable
    adapters = jax.tree.map(
        lambda x: x + 0.05 if x.ndim == 3 else x, adapters)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 60, CFG.num_mel_bins)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 200, (1, 6)).astype(np.int32))

    def fwd(drop_rng):
        return np.asarray(W.forward(
            params, mel, toks, CFG, adapters=adapters,
            compute_dtype=jnp.float32, lora_dropout=lcfg.dropout,
            dropout_rng=drop_rng))

    out_a = fwd(jax.random.PRNGKey(10))
    out_b = fwd(jax.random.PRNGKey(20))
    out_eval1 = fwd(None)
    out_eval2 = fwd(None)
    assert not np.allclose(out_a, out_b), "dropout rng has no effect"
    np.testing.assert_array_equal(out_eval1, out_eval2)
    assert not np.allclose(out_a, out_eval1)


def test_scaling_and_plain_lora_e_are_frozen_by_optimizer_mask():
    """optax.masked freezes 'scaling' always and 'e' under plain LoRA, so
    weight decay can't drift them (reference PEFT trains only A/B)."""
    import optax
    from asr_finetune_tpu.training import optim as optim_lib

    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(0), CFG, lcfg)
    mask = optim_lib.adapter_freeze_mask(adapters, adalora=False)
    tx = optim_lib.make_optimizer(1e-2, max_steps=10, scheduler="constant",
                                  weight_decay=0.1, trainable_mask=mask)
    opt_state = tx.init(adapters)
    grads = jax.tree.map(lambda x: jnp.ones_like(x), adapters)
    updates, _ = tx.update(grads, opt_state, adapters)
    new = optax.apply_updates(adapters, updates)
    q = new["decoder"]["self_attn"]["q"]
    np.testing.assert_array_equal(np.asarray(q["scaling"]),
                                  np.full(CFG.decoder_layers, 2.0, np.float32))
    np.testing.assert_array_equal(np.asarray(q["e"]), np.asarray(
        adapters["decoder"]["self_attn"]["q"]["e"]))
    # a/b did move
    assert not np.allclose(np.asarray(q["a"]),
                           np.asarray(adapters["decoder"]["self_attn"]["q"]["a"]))

    # under AdaLoRA, e IS trainable
    mask2 = optim_lib.adapter_freeze_mask(adapters, adalora=True)
    tx2 = optim_lib.make_optimizer(1e-2, max_steps=10, scheduler="constant",
                                   trainable_mask=mask2)
    updates2, _ = tx2.update(grads, tx2.init(adapters), adapters)
    new2 = optax.apply_updates(adapters, updates2)
    assert not np.allclose(
        np.asarray(new2["decoder"]["self_attn"]["q"]["e"]),
        np.asarray(adapters["decoder"]["self_attn"]["q"]["e"]))


def test_orth_regularizer_zero_for_orthogonal():
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(0), CFG, lcfg)

    def orthify(ad):
        L, d, r = ad["a"].shape
        q, _ = jnp.linalg.qr(ad["a"][0])
        a = jnp.tile(q[None, :, :r], (L, 1, 1))
        qb, _ = jnp.linalg.qr(ad["b"][0].T)
        b = jnp.tile(qb[None, :, :r].transpose(0, 2, 1), (L, 1, 1))
        return {**ad, "a": a, "b": b}

    ortho = jax.tree.map(lambda x: x, adapters)
    for attn in ("self_attn", "cross_attn"):
        for t in ("q", "v"):
            ortho["decoder"][attn][t] = orthify(ortho["decoder"][attn][t])
    reg = float(lora_lib.orth_regularizer(ortho, weight=0.8))
    assert reg < 1e-8, reg
    reg_rand = float(lora_lib.orth_regularizer(adapters, weight=0.8))
    assert reg_rand > reg
