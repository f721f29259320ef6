"""Compiled-on-TPU parity for the dense whole-row attention kernel
(ops/encoder_attention.py): forward and the single-pass fused backward at
the real Whisper encoder shapes, in bf16, against the fp32 XLA reference.

Runs on the bench chip (skipped automatically on CPU):
    JAX_PLATFORMS= python -m pytest tests/test_encoder_attention_tpu.py
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_finetune_tpu.ops import attention as A
from asr_finetune_tpu.ops.encoder_attention import encoder_attention

pytestmark = pytest.mark.skipif(
    not A._flash_available(), reason="needs a TPU")


def _qkv(B, Tq, H, hd, seed=0, Tk=None):
    rng = np.random.default_rng(seed)
    Tk = Tk or Tq
    q = jnp.asarray(rng.standard_normal((B, Tq, H, hd)).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.standard_normal((B, Tk, H, hd)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.standard_normal((B, Tk, H, hd)).astype(np.float32) * 0.5)
    return q, k, v


def _close(a, b, atol=2e-2):
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               atol=atol, rtol=2e-2)


@pytest.mark.parametrize("shape", [
    (2, 1500, 8, 64),   # whisper encoder frames: NOT a 128-multiple → padded
    (2, 1536, 4, 64),   # aligned: no padding path
    (1, 448, 4, 64, 1500),  # teacher-forced cross-attn (Tq labels, Tk frames)
])
def test_dense_forward_compiled(shape):
    B, Tq, H, hd = shape[:4]
    Tk = shape[4] if len(shape) > 4 else None
    q, k, v = _qkv(B, Tq, H, hd, seed=sum(shape), Tk=Tk)
    bf = lambda x: x.astype(jnp.bfloat16)
    out = jax.jit(lambda a, b, c: encoder_attention(a, b, c, interpret=False)
                  )(bf(q), bf(k), bf(v))
    ref = A.xla_attention(q, k, v)
    _close(out, ref)


def test_dense_backward_compiled():
    q, k, v = _qkv(1, 1500, 4, 64, seed=7)
    bf = lambda x: x.astype(jnp.bfloat16)

    def loss_new(q, k, v):
        return jnp.sum(encoder_attention(q, k, v, interpret=False)
                       .astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(A.xla_attention(q, k, v).astype(jnp.float32) ** 2)

    g_new = jax.jit(jax.grad(loss_new, argnums=(0, 1, 2)))(bf(q), bf(k), bf(v))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_new, g_ref):
        # bf16 inputs + fp32 accumulation; grads are O(100) here so the
        # tolerance is relative in practice
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-2, atol=0.5, err_msg=f"d{name}")


def test_packed_vs_transpose_compiled(monkeypatch):
    """Both block layouts, compiled on the real chip, must agree exactly
    (same kernel math, different walk) at the large-v3 encoder shape."""
    q, k, v = _qkv(2, 1500, 20, 64, seed=11)
    bf = lambda x: x.astype(jnp.bfloat16)

    def run(packed):
        monkeypatch.setenv("ASR_TPU_DENSE_PACKED", "1" if packed else "0")
        return jax.jit(lambda a, b, c: encoder_attention(
            a, b, c, interpret=False))(bf(q), bf(k), bf(v))

    np.testing.assert_array_equal(
        np.asarray(run(True), np.float32), np.asarray(run(False), np.float32))
