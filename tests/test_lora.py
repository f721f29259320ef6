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
    # fake grads: rank 0 "important" (large grads on a), others tiny
    def fake_grad(x):
        g = jnp.full_like(x, 1e-4)
        return g
    grads = jax.tree.map(fake_grad, adapters)
    step = jnp.int32(500)  # past tfinal → budget = target_rank = 1
    new_ad, new_sens = lora_lib.adalora_update_masks(
        adapters, grads, sens, step, max_steps=1000, cfg=lcfg)
    # e entries got masked down to ~budget fraction
    total_e = sum(np.asarray(x["e"] != 0).sum()
                  for x in [new_ad["decoder"]["self_attn"]["q"],
                            new_ad["decoder"]["self_attn"]["v"],
                            new_ad["decoder"]["cross_attn"]["q"],
                            new_ad["decoder"]["cross_attn"]["v"]])
    n_adapters = 4 * CFG.decoder_layers
    # budget 1 per (adapter, layer) → about n_adapters entries survive
    # (ties can keep a few extra)
    assert total_e <= n_adapters * 2, total_e
    assert total_e >= n_adapters // 2


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
