"""Dense whole-row Pallas attention (ops/encoder_attention.py): forward and
fused-backward parity vs the XLA reference, padding mask semantics, and the
dispatch rules in ops/attention.attention. CPU suite runs the kernels in
interpret mode; TPU parity is exercised by the bench/train path."""
import jax
import jax.numpy as jnp
import numpy as np

from asr_finetune_tpu.ops.attention import xla_attention
from asr_finetune_tpu.ops.encoder_attention import (dense_attention,
                                                    encoder_attention)


def _qkv(rng, B=2, Tq=150, Tk=150, H=4, hd=64, scale=0.3):
    q = jnp.asarray(rng.standard_normal((B, Tq, H, hd)).astype(np.float32) * scale)
    k = jnp.asarray(rng.standard_normal((B, Tk, H, hd)).astype(np.float32) * scale)
    v = jnp.asarray(rng.standard_normal((B, Tk, H, hd)).astype(np.float32) * scale)
    return q, k, v


def test_forward_matches_xla_with_padding_mask():
    """Tk=150 pads to 256 in-kernel; masked cols must not leak."""
    q, k, v = _qkv(np.random.default_rng(0))
    out = encoder_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_cross_shape():
    q, k, v = _qkv(np.random.default_rng(1), Tq=40, Tk=150)
    out = encoder_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_odd_head_count():
    """BH=5 exercises the heads-per-program g=1 fallback (5 % 4 != 0,
    5 % 2 != 0); BH=6 the g=2 path; the default shapes cover g=4."""
    for B, H in ((5, 1), (3, 2)):
        q, k, v = _qkv(np.random.default_rng(10 + B), B=B, H=H)
        out = encoder_attention(q, k, v, interpret=True)
        ref = xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_fused_backward_matches_xla_grads():
    """The single-pass bwd kernel's dq/dk/dv against autodiff through the
    XLA reference — including the di = rowsum(p*dp) identity."""
    q, k, v = _qkv(np.random.default_rng(2))

    def loss_new(q, k, v):
        return jnp.sum(encoder_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"d{name}")


def test_backward_no_residuals_beyond_qkv():
    """The custom VJP's residuals are exactly (q, k, v): no out/lse tensors
    survive to the backward, so layer remat never re-runs attention."""
    q, k, v = _qkv(np.random.default_rng(3), B=1, H=1)
    qf = q.transpose(0, 2, 1, 3).reshape(1, q.shape[1], 64)
    qf = jnp.pad(qf, ((0, 0), (0, 256 - qf.shape[1]), (0, 0)))
    kf = vf = qf
    _, vjp = jax.vjp(lambda a, b, c: dense_attention(a, b, c, 150, True),
                     qf, kf, vf)
    # residual leaves are the three inputs only
    leaves = jax.tree.leaves(vjp)
    assert len(leaves) == 3
    for leaf, src in zip(leaves, (qf, kf, vf)):
        assert leaf.shape == src.shape


def test_dispatch_prefers_dense_then_falls_back(monkeypatch):
    from asr_finetune_tpu.ops import attention as A

    calls = {}
    monkeypatch.setattr(A, "_flash_available", lambda: True)

    def fake_dense(q, k, v, save_tag=None):
        calls["dense"] = True
        return jnp.zeros(q.shape, q.dtype)

    import asr_finetune_tpu.ops.encoder_attention as EA
    monkeypatch.setattr(EA, "encoder_attention", fake_dense)

    q, k, v = _qkv(np.random.default_rng(4), Tq=1500, Tk=1500, H=1)
    A.attention(q, k, v, causal=False, impl="auto")
    assert calls.get("dense")

    # causal -> not dense (flash or xla); tiny rows -> xla
    calls.clear()
    out = A.attention(*_qkv(np.random.default_rng(5), Tq=8, Tk=8),
                      causal=False, impl="auto")
    assert "dense" not in calls and out.shape[1] == 8

    # oversize rows exceed the VMEM guard -> not dense
    calls.clear()
    q2 = jnp.zeros((1, 8192, 1, 64))
    k2 = jnp.zeros((1, 8192, 1, 64))
    try:
        A.attention(q2, k2, k2, causal=False, impl="auto")
    except Exception:
        pass  # upstream flash may reject on CPU; dispatch mattered, not result
    assert "dense" not in calls


def test_packed_layout_matches_transpose_layout(monkeypatch):
    """The packed (B, T, H*hd) kernels and the (BH, T, hd) transpose-layout
    kernels must agree exactly on forward and grads — same math, different
    block walk. H=4, hd=64 picks the g=4 packed grouping."""
    q, k, v = _qkv(np.random.default_rng(6), B=2, Tq=150, Tk=150, H=4)

    # pin the 128-aligned row pad: bit-exactness across layouts requires
    # identical reduction lengths (native-T reduces over 150, the padded
    # kernels over 256-with-zeros — a 1-ulp accumulation-order delta)
    monkeypatch.setenv("ASR_TPU_DENSE_NATIVE_T", "0")

    def run(packed):
        monkeypatch.setenv("ASR_TPU_DENSE_PACKED", "1" if packed else "0")

        def loss(q, k, v):
            return jnp.sum(encoder_attention(q, k, v, interpret=True) ** 2)

        out = encoder_attention(q, k, v, interpret=True)
        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return out, grads

    out_p, g_p = run(True)
    out_t, g_t = run(False)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_t))
    for name, a, b in zip("qkv", g_p, g_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=f"d{name}")


def test_native_t_matches_padded(monkeypatch):
    """The native-T packed path (no XLA row pad; Mosaic tiles the odd T
    internally) must agree with the 128-aligned padded form to float
    accumulation-order tolerance, forward and grads. On TPU the two
    measured bit-identical at the large-v3 shape (benchmarks)."""
    q, k, v = _qkv(np.random.default_rng(7), B=2, Tq=150, Tk=150, H=4)
    monkeypatch.setenv("ASR_TPU_DENSE_PACKED", "1")

    def run(native):
        monkeypatch.setenv("ASR_TPU_DENSE_NATIVE_T", "1" if native else "0")

        def loss(q, k, v):
            return jnp.sum(encoder_attention(q, k, v, interpret=True) ** 2)

        out = encoder_attention(q, k, v, interpret=True)
        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return out, grads

    out_n, g_n = run(True)
    out_f, g_f = run(False)
    assert out_n.shape == out_f.shape
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_f),
                               rtol=2e-6, atol=2e-6)
    for name, a, b in zip("qkv", g_n, g_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6, err_msg=f"d{name}")


def test_packed_grouping_rules():
    """_group_packed: lane width must be a 128 multiple and divide H."""
    from asr_finetune_tpu.ops.encoder_attention import _group_packed
    assert _group_packed(20, 64, 1536, 1536) == 4   # large-v3
    assert _group_packed(6, 64, 256, 256) == 2      # tiny
    assert _group_packed(5, 64, 256, 256) is None   # odd heads -> fallback
    assert _group_packed(4, 32, 256, 256) == 4      # 4*32 = 128 lanes
    assert _group_packed(1, 64, 256, 256) is None   # 64 lanes misaligned
