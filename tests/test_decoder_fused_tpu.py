"""TPU-only COMPILED parity tests for the fused Pallas decoder-step kernels
(ops/decoder_fused.py). The CPU suite runs the same kernels in interpret
mode (test_decoder_fused.py); this file pins the Mosaic-compiled path on
the bench chip so tiling or DMA regressions can't ship silently.

Tolerances are 1e-2: the MXU's DEFAULT precision computes f32 matmuls via
bf16 passes (~1e-3 drift vs exact fp32) — logic regressions (masking,
indexing, online-softmax bookkeeping) produce O(1) errors and still fail.

Run on the bench chip:
    JAX_PLATFORMS= python -m pytest tests/test_decoder_fused_tpu.py
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_finetune_tpu.ops import decoder_fused as DF

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a TPU (compiled Mosaic path)")

D, H, HD = 768, 12, 64
B, T, S, L = 4, 256, 384, 2


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.3


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(3), 24)


def _ln_ref(x, s, b):
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, -1, keepdims=True)
    v = jnp.var(x32, -1, keepdims=True)
    return (x32 - m) * jax.lax.rsqrt(v + 1e-5) * s + b


def _sq_attn(q, k, v, mask, precision=None):
    qh = q.reshape(B, 1, H, HD)
    kh = k.reshape(B, -1, H, HD)
    vh = v.reshape(B, -1, H, HD)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, precision=precision)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh,
                      precision=precision).reshape(B, D)


def test_compiled_qkv(keys):
    x = _rand(keys[0], B, D)
    lns, lnb = 1.0 + 0.1 * _rand(keys[1], D), 0.1 * _rand(keys[2], D)
    wq, wk, wv = (_rand(keys[3], D, D), _rand(keys[4], D, D),
                  _rand(keys[5], D, D))
    bq, bv = _rand(keys[6], D), _rand(keys[7], D)
    q, k, v = DF.fused_qkv(x, lns, lnb, wq, bq, wk, wv, bv, interpret=False)
    h = _ln_ref(x, lns, lnb)
    np.testing.assert_allclose(q, (h @ wq + bq) * HD ** -0.5,
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(k, h @ wk, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(v, h @ wv + bv, rtol=1e-2, atol=1e-2)


def test_compiled_self_attn(keys):
    x = _rand(keys[0], B, D)
    q = _rand(keys[1], B, D)
    k = _rand(keys[2], B, T, D)
    v = _rand(keys[3], B, T, D)
    wo, bo = _rand(keys[4], D, D), _rand(keys[5], D)
    for pos in (0, 127, 200):
        out = DF.fused_attn(x, k, v, wo, bo, q=q, pos=jnp.int32(pos),
                            interpret=False)
        mask = (jnp.arange(T) <= pos)[None, None, None, :]
        ref = x + _sq_attn(q, k, v, mask) @ wo + bo
        np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2,
                                   err_msg=f"pos={pos}")


def test_compiled_cross_attn_stacked(keys):
    """Stacked (L, ...) weights + scalar-prefetch layer indexing, compiled."""
    s_valid = 300
    x = _rand(keys[6], B, D)
    lns = 1.0 + 0.1 * _rand(keys[7], L, D)
    lnb = 0.1 * _rand(keys[8], L, D)
    wq, bq = _rand(keys[9], L, D, D), _rand(keys[10], L, D)
    k = _rand(keys[11], L, B, S, D)
    v = _rand(keys[12], L, B, S, D)
    wo, bo = _rand(keys[13], L, D, D), _rand(keys[14], L, D)
    hi = jax.lax.Precision.HIGHEST  # exact-f32 reference on the MXU
    for l in (0, L - 1):
        out = DF.fused_attn(x, k, v, wo, bo, s_valid=s_valid,
                            ln_scale=lns, ln_bias=lnb, wq=wq, bq=bq,
                            layer_idx=l, interpret=False)
        h = _ln_ref(x, lns[l], lnb[l])
        qv = (jnp.dot(h, wq[l], precision=hi) + bq[l]) * HD ** -0.5
        mask = (jnp.arange(S) < s_valid)[None, None, None, :]
        ref = x + jnp.dot(_sq_attn(qv, k[l], v[l], mask, precision=hi),
                          wo[l], precision=hi) + bo[l]
        # 3e-2 bound: the kernel's in-kernel q->softmax->pv->o chain runs
        # f32 matmuls at the MXU's DEFAULT (bf16-pass) precision; masking
        # or indexing regressions produce O(1) errors and still fail.
        np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2,
                                   err_msg=f"layer={l}")


def test_compiled_beam_attn(keys):
    """Ancestry-masked beam self-attention (unpermuted cache), compiled.

    The mask build inside _attn_beam_kernel is layout-sensitive (Mosaic
    rejects lane-major->sublane-major shape casts); this pins the compiled
    path so a relayout regression can't ship on the strength of the
    interpret-mode suite alone."""
    Bg, K = 2, 4
    N = Bg * K
    x = _rand(keys[0], N, D)
    q = _rand(keys[1], N, D)
    k = _rand(keys[2], N, T, D)
    v = _rand(keys[3], N, T, D)
    wo, bo = _rand(keys[4], D, D), _rand(keys[5], D)
    anc = jax.random.randint(keys[6], (Bg, K, T), 0, K)

    kn, vn, an = np.asarray(k), np.asarray(v), np.asarray(anc)
    kg, vg = np.zeros_like(kn), np.zeros_like(vn)
    for b in range(Bg):
        for kq in range(K):
            rows = b * K + an[b, kq]
            kg[b * K + kq] = kn[rows, np.arange(T)]
            vg[b * K + kq] = vn[rows, np.arange(T)]

    for pos in (0, 127, 200):
        out = DF.fused_attn_beam(x, k, v, wo, bo, q=q, pos=jnp.int32(pos),
                                 ancestry=anc, interpret=False)
        qh = np.asarray(q).reshape(N, 1, H, HD)
        logits = np.einsum("bqhd,bkhd->bhqk", qh, kg.reshape(N, T, H, HD))
        logits = np.where((np.arange(T) <= pos)[None, None, None, :],
                          logits, -np.inf)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        attn = np.einsum("bhqk,bkhd->bqhd", p,
                         vg.reshape(N, T, H, HD)).reshape(N, D)
        ref = np.asarray(x) + attn @ np.asarray(wo) + np.asarray(bo)
        # 3e-2 like the cross-attn test: the in-kernel qk->softmax->pv->wo
        # chain runs f32 matmuls at the MXU's DEFAULT (bf16-pass) precision
        # vs an exact numpy reference (measured drift max 1.9e-2); masking
        # or ancestry-indexing regressions produce O(1) errors and still
        # fail.
        np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2,
                                   err_msg=f"pos={pos}")


def test_compiled_mlp(keys):
    ff = 4 * D
    x = _rand(keys[15], B, D)
    lns, lnb = 1.0 + 0.1 * _rand(keys[16], D), 0.1 * _rand(keys[17], D)
    w1, b1 = _rand(keys[18], D, ff) * 0.1, _rand(keys[19], ff)
    w2, b2 = _rand(keys[20], ff, D) * 0.1, _rand(keys[21], D)
    out = DF.fused_mlp(x, lns, lnb, w1, b1, w2, b2, interpret=False)
    h = _ln_ref(x, lns, lnb)
    ref = x + jax.nn.gelu(h @ w1 + b1, approximate=False) @ w2 + b2
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2)
