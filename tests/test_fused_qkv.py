"""Fused-QKV encoder path: ONE wide q/k/v projection feeding the packed
dense kernel directly (models/whisper._mha_fused_qkv +
ops/encoder_attention.dense_attention_qkv).

Parity target is the regular per-projection path (which on CPU runs the
XLA attention reference), covering: adapter grads, the int8 base, exact
dropout-mask parity (same rng split as mha), and full-finetune grads
through the fused weight concat. Kernels run in interpret mode on CPU;
TPU-compiled parity rides the bench/train path like the other dense
kernels (tests/test_encoder_attention_tpu.py pattern).

Reference for the capability being accelerated: the encoder q/v adapter
placement of /root/reference/finetune/training/trainers/trainers.py:525
(target_modules=["q_proj","v_proj"] matches encoder attention too).
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import get_config
from asr_finetune_tpu.training import lora as lora_lib

CFG = dataclasses.replace(get_config("test-nano"), d_model=128,
                          encoder_heads=2, decoder_heads=2, d_ff=256)


@pytest.fixture
def setup():
    p = W.init_params(jax.random.PRNGKey(0), CFG)
    adp = lora_lib.init_adapters(jax.random.PRNGKey(1), CFG,
                                 lora_lib.LoraConfig(rank=4, alpha=8.0),
                                 encoder=True)
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 256, CFG.num_mel_bins),
                            jnp.float32)
    return p, adp, mel


def _fused(monkeypatch, on: bool):
    monkeypatch.setenv("ASR_TPU_FUSED_QKV", "1" if on else "0")


def test_kernel_fused_qkv_matches_xla():
    from asr_finetune_tpu.ops import encoder_attention as EA
    from asr_finetune_tpu.ops.attention import xla_attention
    B, T, H, hd = 2, 256, 2, 64
    q, k, v = [jax.random.normal(jax.random.PRNGKey(i), (B, T, H, hd),
                                 jnp.float32) for i in range(3)]
    D = H * hd
    qkv = jnp.concatenate([t.reshape(B, T, D) for t in (q, k, v)], -1)
    out = EA.dense_attention_qkv(qkv, hd, True)
    ref = xla_attention(q, k, v).reshape(B, T, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    g1 = jax.grad(lambda x: jnp.sum(EA.dense_attention_qkv(x, hd, True)
                                    ** 2))(qkv)
    def ref_loss(x):
        qq, kk, vv = [x[..., i * D:(i + 1) * D].reshape(B, T, H, hd)
                      for i in range(3)]
        return jnp.sum(xla_attention(qq, kk, vv) ** 2)
    g2 = jax.grad(ref_loss)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=5e-3, atol=5e-2)


def test_encode_parity_with_adapter_grads(setup, monkeypatch):
    p, adp, mel = setup

    def loss(a, fused):
        _fused(monkeypatch, fused)
        out = W.encode(p, mel, CFG, adapters=a, compute_dtype=jnp.float32,
                       remat=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(loss)(adp, False)
    l1, g1 = jax.value_and_grad(loss)(adp, True)
    assert abs(float(l1 - l0)) / abs(float(l0)) < 1e-4
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        tol = 5e-3 * float(jnp.max(jnp.abs(a))) + 1e-5
        assert float(jnp.max(jnp.abs(a - b))) < tol


def test_encode_parity_int8_base(setup, monkeypatch):
    from asr_finetune_tpu.ops import quant
    p, adp, mel = setup
    pq = quant.quantize_tree_int8(p)

    def run(fused):
        _fused(monkeypatch, fused)
        return W.encode(pq, mel, CFG, adapters=adp,
                        compute_dtype=jnp.float32, remat=True)

    a, b = run(False), run(True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_dropout_masks_identical(setup, monkeypatch):
    """The fused path splits the per-layer dropout rng exactly as mha does
    (rq, rv = split(rng)), so the masks — and hence the outputs — must be
    BIT-identical between the two paths up to attention-kernel numerics."""
    p, adp, mel = setup
    rng = jax.random.PRNGKey(7)

    def run(fused):
        _fused(monkeypatch, fused)
        return W.encode(p, mel, CFG, adapters=adp, compute_dtype=jnp.float32,
                        remat=True, lora_dropout=0.3, dropout_rng=rng)

    a, b = run(False), run(True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_full_finetune_grads_through_weight_concat(setup, monkeypatch):
    """Grads must flow through the fused (L, d, 3d) concat back to the
    separate q/k/v weight leaves (concat VJP slices)."""
    p, _, mel = setup

    def loss(pp, fused):
        _fused(monkeypatch, fused)
        return jnp.sum(W.encode(pp, mel, CFG, compute_dtype=jnp.float32,
                                remat=True) ** 2)

    g0 = jax.grad(loss)(p, False)
    g1 = jax.grad(loss)(p, True)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        tol = 5e-3 * float(jnp.max(jnp.abs(a))) + 1e-5
        assert float(jnp.max(jnp.abs(a - b))) < tol


def test_gate_requires_supported_shape(monkeypatch):
    """Odd head-groupings (no lane-aligned packing) must fall back."""
    monkeypatch.setenv("ASR_TPU_FUSED_QKV", "1")
    bad = dataclasses.replace(CFG, d_model=64, encoder_heads=2)  # hd=32
    assert not W._fused_qkv_ok(bad, 256, "auto")
    assert W._fused_qkv_ok(CFG, 256, "auto")
    monkeypatch.setenv("ASR_TPU_FUSED_QKV", "0")
    assert not W._fused_qkv_ok(CFG, 256, "auto")
    # auto only engages where the dense dispatch would run (TPU backend)
    monkeypatch.setenv("ASR_TPU_FUSED_QKV", "auto")
    import asr_finetune_tpu.ops.attention as A
    monkeypatch.setattr(A, "_flash_available", lambda: False)
    assert not W._fused_qkv_ok(CFG, 256, "auto")
