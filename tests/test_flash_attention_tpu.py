"""TPU-only parity test for the padded/masked flash attention path
(ops/attention.py flash): block-size or SegmentIds regressions previously
could only be caught by manual bench runs (VERDICT r1, weak #5).

Runs on the bench chip (skipped automatically on CPU):
    JAX_PLATFORMS= python -m pytest tests/test_flash_attention_tpu.py
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_finetune_tpu.ops import attention as A

pytestmark = pytest.mark.skipif(
    not A._flash_available(), reason="needs a TPU with Pallas flash attention")


def _qkv(B, T, H, hd, seed=0, Tk=None):
    rng = np.random.default_rng(seed)
    Tk = Tk or T
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.standard_normal((B, Tk, H, hd)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.standard_normal((B, Tk, H, hd)).astype(np.float32) * 0.5)
    to = lambda x: x.astype(jnp.bfloat16)
    return to(q), to(k), to(v)


def _assert_close(a, b, atol=2e-2):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, atol=atol, rtol=2e-2)


@pytest.mark.parametrize("shape", [
    (2, 1500, 8, 64),   # whisper encoder frames: NOT a 128-multiple → padded
    (2, 1536, 8, 64),   # aligned: no padding path
    (1, 448, 8, 64),    # label-bucket length
])
def test_flash_matches_xla_unmasked(shape):
    B, T, H, hd = shape
    q, k, v = _qkv(B, T, H, hd)
    out_f = jax.jit(lambda q, k, v: A.flash(q, k, v))(q, k, v)
    out_x = jax.jit(lambda q, k, v: A.xla_attention(q, k, v))(q, k, v)
    _assert_close(out_f, out_x)


def test_flash_matches_xla_causal_padded():
    q, k, v = _qkv(2, 448, 8, 64, seed=1)
    out_f = jax.jit(lambda q, k, v: A.flash(q, k, v, causal=True))(q, k, v)
    out_x = jax.jit(lambda q, k, v: A.xla_attention(q, k, v, causal=True))(q, k, v)
    _assert_close(out_f, out_x)


def test_flash_cross_shape_matches_xla():
    # decoder cross-attention shape: short queries vs 1500 keys
    q, k, v = _qkv(2, 192, 8, 64, seed=2, Tk=1500)
    out_f = jax.jit(lambda q, k, v: A.flash(q, k, v))(q, k, v)
    out_x = jax.jit(lambda q, k, v: A.xla_attention(q, k, v))(q, k, v)
    _assert_close(out_f, out_x)


def test_flash_grads_match_xla():
    q, k, v = _qkv(1, 1500, 4, 64, seed=3)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(lambda q, k, v: loss(A.flash, q, k, v),
                          argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(lambda q, k, v: loss(A.xla_attention, q, k, v),
                          argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gf, gx):
        _assert_close(a, b, atol=5e-2)


def test_padding_region_does_not_leak():
    """Changing K/V content is irrelevant beyond Tk: pad masking works."""
    q, k, v = _qkv(1, 1500, 4, 64, seed=4)
    out1 = jax.jit(lambda q, k, v: A.flash(q, k, v))(q, k, v)
    # flash pads to 1536 internally; poison what WOULD be padding by
    # appending rows and re-calling with the same logical Tk via slicing
    k2 = jnp.concatenate([k, 100.0 + jnp.zeros((1, 36, 4, 64), k.dtype)], 1)
    v2 = jnp.concatenate([v, 100.0 + jnp.zeros((1, 36, 4, 64), v.dtype)], 1)
    out2 = jax.jit(lambda q, k, v: A.flash(q, k[:, :1500], v[:, :1500]))(q, k2, v2)
    _assert_close(out1, out2, atol=1e-6)
