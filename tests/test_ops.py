"""ops: int8 quantization fidelity and SpecAugment behavior."""
import jax
import jax.numpy as jnp
import numpy as np

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import get_config
from asr_finetune_tpu.ops import quant
from asr_finetune_tpu.ops.spec_augment import SpecAugmentConfig, spec_augment

CFG = get_config("test-nano")


def test_quantize_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 64, 64)).astype(np.float32) * 0.1)
    q = quant.quantize_weight(w)
    assert q["w_q8"].dtype == jnp.int8
    deq = quant.dequantize_weight(q, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w)).max()
    assert err < np.abs(np.asarray(w)).max() / 100  # <1% of range


def test_quantized_forward_close_to_fp():
    params = W.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quant.quantize_tree_int8(params)
    # layer weights replaced, embeddings kept
    assert "w_q8" in qparams["encoder"]["layers"]["attn"]["q"]
    assert "w" not in qparams["encoder"]["layers"]["attn"]["q"]
    assert hasattr(qparams["decoder"]["embed"], "dtype")
    assert quant.quantized_size_bytes(qparams) < quant.quantized_size_bytes(params)

    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, 60, CFG.num_mel_bins)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 200, (2, 8)).astype(np.int32))
    full = W.forward(params, mel, toks, CFG, compute_dtype=jnp.float32)
    q8 = W.forward(qparams, mel, toks, CFG, compute_dtype=jnp.float32)
    # logits close in a relative sense (int8 base is an approximation)
    denom = np.abs(np.asarray(full)).mean() + 1e-6
    rel = np.abs(np.asarray(q8) - np.asarray(full)).mean() / denom
    assert rel < 0.15, rel


def test_spec_augment_masks_and_shapes():
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 100, 80)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    out = spec_augment(key, mel, SpecAugmentConfig(
        freq_mask_param=20, n_freq_masks=2, time_mask_param=30, n_time_masks=2))
    assert out.shape == mel.shape
    changed = np.asarray(out != mel)
    assert changed.any()            # something masked
    assert not changed.all()        # not everything
    # deterministic per key
    out2 = spec_augment(key, mel, SpecAugmentConfig(
        freq_mask_param=20, n_freq_masks=2, time_mask_param=30, n_time_masks=2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # jittable
    jout = jax.jit(lambda k, m: spec_augment(k, m))(key, mel)
    assert jout.shape == mel.shape


def test_int8_matmul_w8a8_close_to_dequant():
    """W8A8 forward (ops/quant.int8_matmul) vs the dequantized matmul:
    vector-wise activation quantization adds <1% relative error on
    well-scaled activations (reference computes the bnb LLM.int8 matmul in
    int8 the same way, trainers.py:499-507)."""
    from asr_finetune_tpu.ops import quant
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 128)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((128, 256)) * 0.05).astype(np.float32))
    q = quant.quantize_weight(w)
    ref = x @ quant.dequantize_weight(q, jnp.float32)
    out = quant.int8_matmul(x, q["w_q8"], q["w_scale"])
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.01, rel


def test_int8_matmul_gradient_is_dequant_backward():
    """The custom VJP routes dx through the dequantized weight exactly
    (straight-through on the activation round; frozen weight untouched)."""
    from asr_finetune_tpu.ops import quant
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((128, 256)) * 0.05).astype(np.float32))
    q = quant.quantize_weight(w)
    dy = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))

    def f(x):
        return jnp.sum(quant.int8_matmul(x, q["w_q8"], q["w_scale"]) * dy)

    dx = jax.grad(f)(x)
    w_deq = quant.dequantize_weight(q, jnp.float32)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dy @ w_deq.T),
                               rtol=1e-5, atol=1e-5)


def test_int8_matmul_outlier_decomposition_recovers_accuracy():
    """Fixed-k outlier decomposition (quant.set_int8_outlier_cols — the
    jit-friendly form of bnb LLM.int8()'s fp16 outlier columns,
    trainers.py:499-507 load_in_8bit): activation outliers in a few
    features crush the per-row int8 scale; routing the top-k features
    through the float side-matmul recovers near-inlier accuracy."""
    from asr_finetune_tpu.ops import quant
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 16, 128)).astype(np.float32)
    x[..., [5, 77, 120]] *= 60.0  # LLM.int8()-style emergent outlier features
    x = jnp.asarray(x)
    w = jnp.asarray((rng.standard_normal((128, 256)) * 0.05).astype(np.float32))
    q = quant.quantize_weight(w)
    ref = x @ quant.dequantize_weight(q, jnp.float32)

    def rel_err(out):
        return float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))

    plain = rel_err(quant.int8_matmul(x, q["w_q8"], q["w_scale"]))
    try:
        quant.set_int8_outlier_cols(4)
        # jit to prove the top_k/gather/scatter path traces with static shapes
        decomposed = rel_err(jax.jit(quant.int8_matmul)(
            x, q["w_q8"], q["w_scale"]))

        # gradient path is unchanged: dx still flows through the full
        # dequantized weight (decomposition is forward-only)
        dy = jnp.asarray(rng.standard_normal((4, 16, 256)).astype(np.float32))
        dx = jax.grad(lambda a: jnp.sum(
            quant.int8_matmul(a, q["w_q8"], q["w_scale"]) * dy))(x)
        np.testing.assert_allclose(
            np.asarray(dx),
            np.asarray(dy @ quant.dequantize_weight(q, jnp.float32).T),
            rtol=1e-4, atol=1e-4)
    finally:
        quant.set_int8_outlier_cols(0)

    # outliers really did degrade plain W8A8 (2% here, vs <0.1% on the
    # well-scaled activations above), and decomposition wins it back ~30x
    assert plain > 0.01, plain
    assert decomposed < plain / 10, (plain, decomposed)
    assert decomposed < 0.002, (plain, decomposed)
    # k=0 (default) is exactly the plain path
    assert rel_err(quant.int8_matmul(x, q["w_q8"], q["w_scale"])) == plain


def test_int8_outlier_matmul_form_matches_gather_form():
    """Round-5 perf rewrite guard: the MXU-friendly outlier path (one-hot
    selection matmuls, native-dtype ranking pass, mask = 1 - sum(one_hot))
    must be numerically identical to the round-4 gather/scatter
    formulation it replaced (quant.py round-4 `jnp.take` + `.at[].set`).
    One-hot products are x_i*{0,1} (exact in any dtype) and int8 weight
    values are exact in bf16, so the two forms agree to f32 exactness."""
    from asr_finetune_tpu.ops import quant

    def gather_form(x, w_q8, w_scale, k):
        # verbatim round-4 formulation
        x32 = x.astype(jnp.float32)
        d_in = x32.shape[-1]
        col_amax = jnp.max(jnp.abs(x32.reshape(-1, d_in)), axis=0)
        _, idx = jax.lax.top_k(col_amax, k)
        x_outl = jnp.take(x32, idx, axis=-1)
        w_outl = (jnp.take(w_q8, idx, axis=0).astype(jnp.float32)
                  * w_scale.reshape(1, -1).astype(jnp.float32))
        y_out = jax.lax.dot_general(
            x_outl, w_outl, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        keep = jnp.ones((d_in,), jnp.float32).at[idx].set(0.0)
        x32 = x32 * keep
        amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        xs = jnp.maximum(amax, 1e-8) / 127.0
        x8 = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
        y32 = jax.lax.dot_general(
            x8, w_q8, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (y32.astype(jnp.float32) * xs
             * w_scale.reshape(-1).astype(jnp.float32)) + y_out
        return y.astype(x.dtype)

    rng = np.random.default_rng(7)
    for dtype in (np.float32, jnp.bfloat16):
        x = rng.standard_normal((4, 24, 160)).astype(np.float32)
        x[..., [3, 90, 141]] *= 40.0
        x = jnp.asarray(x).astype(dtype)
        w = jnp.asarray(
            (rng.standard_normal((160, 192)) * 0.05).astype(np.float32))
        q = quant.quantize_weight(w)
        ref = gather_form(x, q["w_q8"], q["w_scale"], 4)
        try:
            quant.set_int8_outlier_cols(4)
            got = jax.jit(quant.int8_matmul)(x, q["w_q8"], q["w_scale"])
        finally:
            quant.set_int8_outlier_cols(0)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-6, atol=2e-6)


def test_calibrated_outliers_match_dynamic():
    """bnb-faithful calibration (quant.calibrate_int8_outliers): recording
    one forward installs static per-shape-class outlier columns; on
    stationary outliers the static path picks the same columns as the
    per-matmul dynamic top-k and produces the same result — without the
    per-matmul ranking pass. Recording must work under jit + lax.scan
    (the model's layer loop)."""
    from asr_finetune_tpu.ops import quant
    rng = np.random.default_rng(11)
    OUTL = [5, 77, 120]

    def make_x():
        x = rng.standard_normal((4, 16, 128)).astype(np.float32)
        x[..., OUTL] *= 30.0  # stationary emergent features, amax >> 6.0
        return jnp.asarray(x)

    x = make_x()
    w = jnp.asarray((rng.standard_normal((2, 128, 64)) * 0.05)
                    .astype(np.float32))
    q = quant.quantize_weight(w)  # stacked (L=2, 128, 64)

    def make_fwd():
        # a NEW function object each time: jax caches traces by function
        # identity, and calibration recording is baked in at trace time
        def fwd(x):
            def body(c, lw):
                w_q8, w_s = lw
                # scan over layers, recording fires once per layer
                y = quant.int8_matmul(c, w_q8, w_s)
                return c, jnp.sum(y)
            _ = jax.lax.scan(body, x, (q["w_q8"], q["w_scale"]))
            return quant.int8_matmul(x, q["w_q8"][0], q["w_scale"][0])
        return jax.jit(fwd)

    try:
        quant.set_int8_outlier_cols(3)
        dynamic = np.asarray(make_fwd()(x))
        idx_map = quant.calibrate_int8_outliers(lambda: make_fwd()(x),
                                                threshold=6.0)
        assert idx_map == {(128, 64): tuple(OUTL)}, idx_map
        static = np.asarray(jax.jit(
            lambda x: quant.int8_matmul(x, q["w_q8"][0],
                                        q["w_scale"][0]))(x))
        np.testing.assert_allclose(static, dynamic, rtol=2e-6, atol=2e-6)

        # no outliers anywhere -> empty calibrated set -> pure int8 path,
        # identical to k=0
        x_clean = jnp.asarray(
            rng.standard_normal((4, 16, 128)).astype(np.float32))
        quant.calibrate_int8_outliers(
            lambda: quant.int8_matmul(x_clean, q["w_q8"][0],
                                      q["w_scale"][0]), threshold=6.0)
        assert quant._INT8_STATIC_IDX == {(128, 64): ()}
        with_calib = np.asarray(
            quant.int8_matmul(x_clean, q["w_q8"][0], q["w_scale"][0]))
        quant.set_int8_outlier_cols(0)
        quant.set_int8_outlier_static_idx(None)
        plain = np.asarray(
            quant.int8_matmul(x_clean, q["w_q8"][0], q["w_scale"][0]))
        np.testing.assert_array_equal(with_calib, plain)
    finally:
        quant.set_int8_outlier_cols(0)
        quant.set_int8_outlier_static_idx(None)


def test_dense_int8_compute_toggle():
    """dense() uses the W8A8 path only while the global toggle is on."""
    from asr_finetune_tpu.ops import quant
    from asr_finetune_tpu.models.whisper import dense
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 128)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((128, 128)) * 0.05).astype(np.float32))
    p = dict(quant.quantize_weight(w))
    p["b"] = jnp.zeros((128,), jnp.float32)
    ref = np.asarray(dense(x, p))
    try:
        quant.set_int8_compute(True)
        out = np.asarray(dense(x, p))
    finally:
        quant.set_int8_compute(False)
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert 0.0 < rel < 0.01, rel
    # composes with outlier decomposition: dense() reads both globals
    try:
        quant.set_int8_compute(True)
        quant.set_int8_outlier_cols(4)
        out2 = np.asarray(dense(x, p))
    finally:
        quant.set_int8_compute(False)
        quant.set_int8_outlier_cols(0)
    rel2 = np.linalg.norm(out2 - ref) / np.linalg.norm(ref)
    assert 0.0 < rel2 < 0.01, rel2


def test_fused_w8a8_matches_xla_formulation():
    """ops/w8a8_fused.fused_w8a8 (quant prologue + s8xs8 dot + dequant
    epilogue in one Pallas kernel) computes bit-identically to the XLA
    formulation in ops/quant._w8a8_impl — same f32 per-row scales, same
    int8 rounding, same epilogue order. Interpret mode on CPU; the TPU
    compile is exercised by bench.py's --int8_matmul headline config."""
    import os
    from asr_finetune_tpu.ops import quant, w8a8_fused
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((48, 128)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((128, 256)) * 0.05).astype(np.float32))
    q = quant.quantize_weight(w)
    os.environ["ASR_TPU_FUSED_W8A8"] = "0"
    try:
        ref = quant._w8a8_impl(x, q["w_q8"], q["w_scale"])
    finally:
        os.environ.pop("ASR_TPU_FUSED_W8A8")
    out = w8a8_fused.fused_w8a8(x, q["w_q8"], q["w_scale"], mt=8,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))


def test_fused_w8a8_dispatch_boundary():
    """Under ASR_TPU_FUSED_W8A8=1 (opt-in; default off after the fused
    kernel measured -3.5% e2e — see ops/w8a8_fused.py), _w8a8_impl routes
    the MLP shapes where the kernel measured ahead in isolation (see
    pick_mt) to Pallas and keeps attention-projection shapes, decoder-m
    fc1, and the outlier path on the XLA formulation."""
    from asr_finetune_tpu.ops import w8a8_fused
    assert w8a8_fused.pick_mt(12000, 1280, 5120) == 1200  # encoder fc1
    assert w8a8_fused.pick_mt(12000, 5120, 1280) == 480   # encoder fc2
    assert w8a8_fused.pick_mt(3584, 5120, 1280) == 448    # decoder fc2
    assert w8a8_fused.pick_mt(3584, 1280, 5120) is None   # decoder fc1: XLA
    assert w8a8_fused.pick_mt(12000, 1280, 3840) is None  # qkv
    assert w8a8_fused.pick_mt(12000, 1280, 1280) is None  # o proj
    assert w8a8_fused.pick_mt(7, 5120, 1280) is None      # indivisible m
