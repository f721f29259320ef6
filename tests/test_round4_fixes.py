"""Regression tests for the round-4 advisor findings (ADVICE.md r3).

1. medium — packed-layout dispatch must gate on the BACKWARD grouping
   (cap=2): shapes that only group at cap=4 (H=4, hd=32) previously took
   the packed forward and crashed at jax.grad trace time.
2. low — _fuse_qkv_weights must reject mixed int8/float q/k/v trees
   instead of KeyError-ing.
3. low — the fused-qkv encoder scan must not carry the dead per-layer
   q/k/v weights (only the output projection survives in attn).
4. low — ASR_TPU_FUSED_QKV=1 must yield to an explicit attn_impl
   xla/flash; only =force overrides it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_finetune_tpu.ops.attention import xla_attention
from asr_finetune_tpu.ops.encoder_attention import encoder_attention


def test_grad_through_cap4_only_shape():
    """H=4, hd=32 groups at cap=4 but not cap=2 — dispatch must fall back
    to the transpose layout so the VJP traces and matches XLA."""
    rng = np.random.default_rng(0)
    B, T, H, hd = 2, 150, 4, 32
    q, k, v = [jnp.asarray(rng.standard_normal((B, T, H, hd)).astype(
        np.float32) * 0.3) for _ in range(3)]

    def loss_new(q, k, v):
        return jnp.sum(encoder_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gn, gr in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(gn), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_fuse_qkv_weights_rejects_mixed_tree():
    from asr_finetune_tpu.models.whisper import _fuse_qkv_weights
    d = 8
    w = jnp.zeros((2, d, d))
    attn = {
        "q": {"w_q8": jnp.zeros((2, d, d), jnp.int8),
              "w_scale": jnp.ones((2, 1, d))},
        "k": {"w": w},
        "v": {"w": w},
    }
    with pytest.raises(AssertionError, match="mixed"):
        _fuse_qkv_weights(attn)


def test_fused_scan_drops_dead_qkv_weights(monkeypatch):
    """With fused qkv active, encode()'s scanned layer tree must keep only
    the output projection in attn — correctness must not rely on XLA DCE
    of dead xs slices. Verified indirectly: fused output still matches the
    unfused path bit-for-... well, to fp32 tolerance."""
    import dataclasses

    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import get_config

    # widen to hd=64 so the fused path is shape-eligible
    cfg = dataclasses.replace(get_config("test-nano"), d_model=128)
    p = W.init_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 256, cfg.num_mel_bins),
                            jnp.float32)
    monkeypatch.setenv("ASR_TPU_FUSED_QKV", "0")
    ref = W.encode(p, mel, cfg, compute_dtype=jnp.float32)
    monkeypatch.setenv("ASR_TPU_FUSED_QKV", "1")
    out = W.encode(p, mel, cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int8_outlier_cols_defaults_to_bnb_parity():
    """--int8_outlier_cols defaults to 8: the reference's load_in_8bit is
    bitsandbytes LLM.int8(), which ALWAYS applies the outlier
    decomposition (threshold 6.0) — plain W8A8 (k=0) measured 5.7% matmul
    error on outlier-heavy activations vs 0.20% at k=8
    (benchmarks/bench_quant_numerics.py), and k=8 is loss-neutral e2e
    (benchmarks/bench_int8_outlier_ab.py). VERDICT r3 weak #1."""
    from asr_finetune_tpu import config as config_lib
    args = config_lib.parse_args(["--model_type", "test-nano",
                                  "--dataset_name", "x.h5"])
    assert args.int8_outlier_cols == 8


def test_fused_qkv_env_yields_to_explicit_impl(monkeypatch):
    import dataclasses

    from asr_finetune_tpu.models.configs import get_config
    from asr_finetune_tpu.models.whisper import _fused_qkv_ok

    # test-nano's hd=32 is not fused-qkv-eligible; widen to hd=64
    cfg = dataclasses.replace(get_config("test-nano"), d_model=128)
    monkeypatch.setenv("ASR_TPU_FUSED_QKV", "1")
    assert _fused_qkv_ok(cfg, 256, "dense")
    assert not _fused_qkv_ok(cfg, 256, "xla")
    assert not _fused_qkv_ok(cfg, 256, "flash")
    monkeypatch.setenv("ASR_TPU_FUSED_QKV", "force")
    assert _fused_qkv_ok(cfg, 256, "xla")
