"""Parity tests for the fused Pallas decoder-step kernels.

Runs in interpret mode on the CPU suite (ops/decoder_fused.py auto-detects);
the same kernels compile on TPU (tests/test_decoder_fused_tpu.py). Every
kernel is checked in fp32 against the plain-XLA decode path it replaces
(models/whisper.py decode_step), and the end-to-end greedy/beam streams must
match the non-fused path token for token.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import WhisperConfig
from asr_finetune_tpu.ops import decoder_fused as DF

D, H, HD = 256, 4, 64
B, T, S = 3, 256, 384


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.3


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(0), 24)


def test_fused_qkv_matches_dense(keys):
    x = _rand(keys[0], B, D)
    lns, lnb = 1.0 + 0.1 * _rand(keys[1], D), 0.1 * _rand(keys[2], D)
    wq, wk, wv = _rand(keys[3], D, D), _rand(keys[4], D, D), _rand(keys[5], D, D)
    bq, bv = _rand(keys[6], D), _rand(keys[7], D)

    q, k, v = DF.fused_qkv(x, lns, lnb, wq, bq, wk, wv, bv)
    h = W.layer_norm(x, {"scale": lns, "bias": lnb})
    np.testing.assert_allclose(q, (h @ wq + bq) * HD ** -0.5,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(k, h @ wk, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(v, h @ wv + bv, rtol=1e-5, atol=1e-5)


def _xla_single_query_attn(q, k, v, mask):
    """q (B, d) pre-scaled; k/v (B, T, d) dense → (B, d)."""
    qh = q.reshape(B, 1, H, HD)
    kh = k.reshape(B, -1, H, HD)
    vh = v.reshape(B, -1, H, HD)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, D)


def test_fused_self_attn_matches_xla(keys):
    x = _rand(keys[0], B, D)
    q = _rand(keys[1], B, D)
    k = _rand(keys[2], B, T, D)
    v = _rand(keys[3], B, T, D)
    wo, bo = _rand(keys[4], D, D), _rand(keys[5], D)
    for pos in (0, 1, 127, 128, 200, T - 1):
        out = DF.fused_attn(x, k, v, wo, bo, q=q, pos=jnp.int32(pos))
        mask = (jnp.arange(T) <= pos)[None, None, None, :]
        ref = x + _xla_single_query_attn(q, k, v, mask) @ wo + bo
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"pos={pos}")


def test_fused_cross_attn_matches_xla(keys):
    s_valid = 300  # padded tail 300..S must be ignored
    x = _rand(keys[6], B, D)
    lns, lnb = 1.0 + 0.1 * _rand(keys[7], D), 0.1 * _rand(keys[8], D)
    wq, bq = _rand(keys[9], D, D), _rand(keys[10], D)
    k = _rand(keys[11], B, S, D)
    v = _rand(keys[12], B, S, D)
    wo, bo = _rand(keys[13], D, D), _rand(keys[14], D)

    out = DF.fused_attn(x, k, v, wo, bo, s_valid=s_valid,
                        ln_scale=lns, ln_bias=lnb, wq=wq, bq=bq)
    h = W.layer_norm(x, {"scale": lns, "bias": lnb})
    q = (h @ wq + bq) * HD ** -0.5
    mask = (jnp.arange(S) < s_valid)[None, None, None, :]
    ref = x + _xla_single_query_attn(q, k, v, mask) @ wo + bo
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_cross_attn_int8_dequant(keys):
    """int8 KV with dense per-(batch, head) scales dequantizes in-kernel."""
    x = _rand(keys[0], B, D)
    q = _rand(keys[1], B, D)
    kf = _rand(keys[2], B, S, D)
    vf = _rand(keys[3], B, S, D)
    wo, bo = _rand(keys[4], D, D), _rand(keys[5], D)

    def quant(a):  # per (batch, head) symmetric int8
        ah = a.reshape(B, S, H, HD)
        scale = jnp.max(jnp.abs(ah), axis=(1, 3), keepdims=True) / 127.0
        q8 = jnp.clip(jnp.round(ah / scale), -127, 127).astype(jnp.int8)
        dense_scale = jnp.repeat(scale[:, 0, :, 0], HD, axis=-1)  # (B, D)
        return q8.reshape(B, S, D), dense_scale, (q8 * scale).reshape(B, S, D)

    k8, ks, k_deq = quant(kf)
    v8, vs, v_deq = quant(vf)
    out = DF.fused_attn(x, k8, v8, wo, bo, q=q, s_valid=S,
                        k_scale=ks, v_scale=vs)
    ref = x + _xla_single_query_attn(q, k_deq, v_deq, None) @ wo + bo
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_cross_attn_kv_group_matches_replicated(keys):
    """Shared-KV beam cross-attention: kv_group=G over (B, S, d) KV must
    equal kv_group=1 over KV replicated per beam row — the grouped layout
    only changes HOW the chunks are streamed, never the math."""
    G = 4
    N = B * G
    s_valid = 300
    x = _rand(keys[6], N, D)
    lns, lnb = 1.0 + 0.1 * _rand(keys[7], D), 0.1 * _rand(keys[8], D)
    wq, bq = _rand(keys[9], D, D), _rand(keys[10], D)
    k = _rand(keys[11], B, S, D)
    v = _rand(keys[12], B, S, D)
    wo, bo = _rand(keys[13], D, D), _rand(keys[14], D)

    out = DF.fused_attn(x, k, v, wo, bo, s_valid=s_valid,
                        ln_scale=lns, ln_bias=lnb, wq=wq, bq=bq,
                        kv_group=G)
    ref = DF.fused_attn(x, jnp.repeat(k, G, axis=0), jnp.repeat(v, G, axis=0),
                        wo, bo, s_valid=s_valid,
                        ln_scale=lns, ln_bias=lnb, wq=wq, bq=bq)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # and with a pre-computed query + int8 KV scales (the beam decode path)
    q = _rand(keys[15], N, D)

    def quant(a):
        ah = a.reshape(B, S, H, HD)
        scale = jnp.max(jnp.abs(ah), axis=(1, 3), keepdims=True) / 127.0
        q8 = jnp.clip(jnp.round(ah / scale), -127, 127).astype(jnp.int8)
        dense_scale = jnp.repeat(scale[:, 0, :, 0], HD, axis=-1)  # (B, D)
        return q8.reshape(B, S, D), dense_scale

    k8, ks = quant(k)
    v8, vs = quant(v)
    out = DF.fused_attn(x, k8, v8, wo, bo, q=q, s_valid=s_valid,
                        k_scale=ks, v_scale=vs, kv_group=G)
    ref = DF.fused_attn(x, jnp.repeat(k8, G, axis=0), jnp.repeat(v8, G, axis=0),
                        wo, bo, q=q, s_valid=s_valid,
                        k_scale=jnp.repeat(ks, G, axis=0),
                        v_scale=jnp.repeat(vs, G, axis=0))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_attn_beam_matches_xla(keys):
    """Beam self-attention over an UNPERMUTED cache: masking scores with the
    ancestry map must equal gathering each hypothesis' history rows first
    and running plain single-query attention over the contiguous result."""
    Bg, K = 2, 4
    N = Bg * K
    x = _rand(keys[0], N, D)
    q = _rand(keys[1], N, D)
    k = _rand(keys[2], N, T, D)
    v = _rand(keys[3], N, T, D)
    wo, bo = _rand(keys[4], D, D), _rand(keys[5], D)
    anc = jax.random.randint(keys[6], (Bg, K, T), 0, K)

    for pos in (0, 127, 128, 200, T - 1):
        out = DF.fused_attn_beam(x, k, v, wo, bo, q=q, pos=jnp.int32(pos),
                                 ancestry=anc)
        # reference: materialize each hypothesis' history by gathering its
        # ancestry rows, then plain causal single-query attention
        kn, vn, an = np.asarray(k), np.asarray(v), np.asarray(anc)
        kg = np.zeros_like(kn)
        vg = np.zeros_like(vn)
        for b in range(Bg):
            for kq in range(K):
                rows = b * K + an[b, kq]                 # (T,)
                kg[b * K + kq] = kn[rows, np.arange(T)]
                vg[b * K + kq] = vn[rows, np.arange(T)]
        qh = np.asarray(q).reshape(N, 1, H, HD)
        kh = kg.reshape(N, T, H, HD)
        vh = vg.reshape(N, T, H, HD)
        logits = np.einsum("bqhd,bkhd->bhqk", qh, kh)
        logits = np.where((np.arange(T) <= pos)[None, None, None, :],
                          logits, -np.inf)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        attn = np.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(N, D)
        ref = np.asarray(x) + attn @ np.asarray(wo) + np.asarray(bo)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"pos={pos}")


def test_fused_mlp_matches_xla(keys):
    ff = 512
    x = _rand(keys[15], B, D)
    lns, lnb = 1.0 + 0.1 * _rand(keys[16], D), 0.1 * _rand(keys[17], D)
    w1, b1 = _rand(keys[18], D, ff), _rand(keys[19], ff)
    w2, b2 = _rand(keys[20], ff, D), _rand(keys[21], D)

    out = DF.fused_mlp(x, lns, lnb, w1, b1, w2, b2)
    h = W.layer_norm(x, {"scale": lns, "bias": lnb})
    ref = x + jax.nn.gelu(h @ w1 + b1, approximate=False) @ w2 + b2
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# full-step and full-decode parity
# ---------------------------------------------------------------------------

TINY = WhisperConfig(vocab_size=613, num_mel_bins=16, d_model=D,
                     encoder_layers=2, encoder_heads=H, decoder_layers=2,
                     decoder_heads=H, d_ff=4 * D, max_source_positions=48,
                     max_target_positions=64, eos_token_id=607,
                     sot_token_id=608, translate_token_id=609,
                     transcribe_token_id=610, no_timestamps_token_id=611,
                     timestamp_begin_id=612, pad_token_id=607,
                     first_language_token_id=609)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = TINY
    params = W.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)).astype(np.float32))
    return cfg, params, mel


def test_decode_step_fused_matches_decode_step(tiny_setup):
    cfg, params, mel = tiny_setup
    Bt = mel.shape[0]
    enc = W.encode(params, mel, cfg, compute_dtype=jnp.float32)
    ckv = W.precompute_cross_kv(params, enc, cfg)
    s_real = enc.shape[1]
    s_pad = ((s_real + 127) // 128) * 128
    ckv_pad = {k: jnp.pad(v, [(0, 0), (0, 0), (0, s_pad - s_real),
                              (0, 0), (0, 0)]).reshape(
                    v.shape[0], v.shape[1], s_pad, -1)
               for k, v in ckv.items()}
    cache_x = W.init_cache(cfg, Bt, 128, dtype=jnp.float32)
    cache_f = W.init_cache(cfg, Bt, 128, dtype=jnp.float32, dense=True)

    rng = np.random.default_rng(3)
    for pos in range(4):
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, Bt), jnp.int32)
        lx, cache_x = W.decode_step(params, tok, jnp.int32(pos), cache_x,
                                    ckv, cfg, None, jnp.float32)
        lf, cache_f = W.decode_step_fused(params, tok, jnp.int32(pos),
                                          cache_f, ckv_pad, cfg, s_real,
                                          jnp.float32)
        np.testing.assert_allclose(lf, lx, rtol=2e-4, atol=2e-4,
                                   err_msg=f"pos={pos}")
    np.testing.assert_allclose(
        cache_f["k"], cache_x["k"][:, :, :128].reshape(cache_f["k"].shape),
        rtol=1e-5, atol=1e-5)


def test_greedy_fused_matches_unfused(tiny_setup):
    from asr_finetune_tpu.evaluation import decode as Dec
    cfg, params, mel = tiny_setup
    forced = [cfg.sot_token_id, cfg.transcribe_token_id,
              cfg.no_timestamps_token_id]
    t_ref, l_ref = Dec.greedy_decode(params, mel, cfg, forced, max_length=24,
                                     compute_dtype=jnp.float32, fused=False)
    t_fus, l_fus = Dec.greedy_decode(params, mel, cfg, forced, max_length=24,
                                     compute_dtype=jnp.float32, fused=True)
    np.testing.assert_array_equal(np.asarray(t_fus), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(l_fus), np.asarray(l_ref))


def test_beam_fused_matches_unfused(tiny_setup):
    from asr_finetune_tpu.evaluation import decode as Dec
    cfg, params, mel = tiny_setup
    forced = [cfg.sot_token_id, cfg.transcribe_token_id,
              cfg.no_timestamps_token_id]
    t_ref, _ = Dec.beam_decode(params, mel, cfg, forced, max_length=16,
                               num_beams=2, compute_dtype=jnp.float32,
                               fused=False)
    t_fus, _ = Dec.beam_decode(params, mel, cfg, forced, max_length=16,
                               num_beams=2, compute_dtype=jnp.float32,
                               fused=True)
    np.testing.assert_array_equal(np.asarray(t_fus), np.asarray(t_ref))


def test_beam_fused_reorder_ab_matches_ancestry(tiny_setup, monkeypatch):
    """ASR_TPU_BEAM_REORDER=1 (the A/B escape hatch: fused kernels +
    conventional full-cache reorder instead of the ancestry kernel) must
    produce the exact ancestry-path token stream."""
    from asr_finetune_tpu.evaluation import decode as Dec
    cfg, params, mel = tiny_setup
    forced = [cfg.sot_token_id, cfg.transcribe_token_id,
              cfg.no_timestamps_token_id]
    t_anc, _ = Dec.beam_decode(params, mel, cfg, forced, max_length=16,
                               num_beams=2, compute_dtype=jnp.float32,
                               fused=True)
    monkeypatch.setenv("ASR_TPU_BEAM_REORDER", "1")
    t_reo, _ = Dec.beam_decode(params, mel, cfg, forced, max_length=16,
                               num_beams=2, compute_dtype=jnp.float32,
                               fused=True)
    np.testing.assert_array_equal(np.asarray(t_reo), np.asarray(t_anc))


def test_greedy_fused_with_adapters_merged(tiny_setup):
    """Fused decode with LoRA adapters = non-fused with adapters applied."""
    from asr_finetune_tpu.evaluation import decode as Dec
    from asr_finetune_tpu.training.lora import (LoraConfig, init_adapters,
                                                merge_adapters)
    cfg, params, mel = tiny_setup
    lcfg = LoraConfig(rank=4, alpha=8.0)
    adapters = init_adapters(jax.random.PRNGKey(7), cfg, lcfg)
    # give b non-zero values so the delta actually changes the output
    adapters = jax.tree.map(lambda a: a + 0.01, adapters)
    forced = [cfg.sot_token_id, cfg.transcribe_token_id,
              cfg.no_timestamps_token_id]
    t_ref, _ = Dec.greedy_decode(params, mel, cfg, forced, max_length=16,
                                 adapters=adapters,
                                 compute_dtype=jnp.float32, fused=False)
    t_fus, _ = Dec.greedy_decode(params, mel, cfg, forced, max_length=16,
                                 adapters=adapters,
                                 compute_dtype=jnp.float32, fused=True)
    np.testing.assert_array_equal(np.asarray(t_fus), np.asarray(t_ref))

    merged = merge_adapters(params, adapters)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 5)).astype(np.int32) % cfg.vocab_size)
    enc = W.encode(params, mel, cfg, adapters, jnp.float32)
    lg_ad = W.decode_train(params, x, enc[:1], cfg, adapters, jnp.float32)
    enc_m = W.encode(merged, mel, cfg, None, jnp.float32)
    lg_m = W.decode_train(merged, x, enc_m[:1], cfg, None, jnp.float32)
    np.testing.assert_allclose(lg_m, lg_ad, rtol=2e-4, atol=2e-4)


def test_fused_kernels_int8_weights(keys):
    """int8 weight streaming: post-matmul column scales must reproduce the
    dequantize-then-matmul reference in every kernel."""
    from asr_finetune_tpu.ops.quant import quantize_weight, dequantize_weight

    x = _rand(keys[0], B, D)
    lns, lnb = 1.0 + 0.1 * _rand(keys[1], D), 0.1 * _rand(keys[2], D)
    qw = {n: quantize_weight(_rand(k, D, D))
          for n, k in zip("qkvo", keys[3:7])}
    deq = {n: dequantize_weight(p, jnp.float32) for n, p in qw.items()}
    bq, bv, bo = _rand(keys[7], D), _rand(keys[8], D), _rand(keys[9], D)

    q, k, v = DF.fused_qkv(
        x, lns, lnb, qw["q"]["w_q8"], bq, qw["k"]["w_q8"],
        qw["v"]["w_q8"], bv, wq_scale=qw["q"]["w_scale"],
        wk_scale=qw["k"]["w_scale"], wv_scale=qw["v"]["w_scale"])
    h = W.layer_norm(x, {"scale": lns, "bias": lnb})
    np.testing.assert_allclose(q, (h @ deq["q"] + bq) * HD ** -0.5,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(v, h @ deq["v"] + bv, rtol=2e-5, atol=2e-5)

    kv_k, kv_v = _rand(keys[10], B, T, D), _rand(keys[11], B, T, D)
    out = DF.fused_attn(x, kv_k, kv_v, qw["o"]["w_q8"], bo,
                        q=q, pos=jnp.int32(100),
                        wo_scale=qw["o"]["w_scale"])
    mask = (jnp.arange(T) <= 100)[None, None, None, :]
    ref = x + _xla_single_query_attn(q, kv_k, kv_v, mask) @ deq["o"] + bo
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # cross-attn with in-kernel q projection from int8 wq
    out2 = DF.fused_attn(x, kv_k, kv_v, qw["o"]["w_q8"], bo, s_valid=200,
                         ln_scale=lns, ln_bias=lnb, wq=qw["q"]["w_q8"],
                         bq=bq, wq_scale=qw["q"]["w_scale"],
                         wo_scale=qw["o"]["w_scale"])
    mask2 = (jnp.arange(T) < 200)[None, None, None, :]
    ref2 = x + _xla_single_query_attn(
        (h @ deq["q"] + bq) * HD ** -0.5, kv_k, kv_v, mask2) @ deq["o"] + bo
    np.testing.assert_allclose(out2, ref2, rtol=2e-5, atol=2e-5)

    ff = 512
    q1 = quantize_weight(_rand(keys[12], D, ff))
    q2 = quantize_weight(_rand(keys[13], ff, D))
    b1, b2 = _rand(keys[14], ff), _rand(keys[15], D)
    out3 = DF.fused_mlp(x, lns, lnb, q1["w_q8"], b1, q2["w_q8"], b2,
                        w1_scale=q1["w_scale"], w2_scale=q2["w_scale"])
    ref3 = x + jax.nn.gelu(
        h @ dequantize_weight(q1, jnp.float32) + b1,
        approximate=False) @ dequantize_weight(q2, jnp.float32) + b2
    # fc2's column scale is applied after the chunk sum (vs per-chunk in the
    # reference), so allow a slightly wider associativity tolerance
    np.testing.assert_allclose(out3, ref3, rtol=2e-5, atol=5e-5)


def test_greedy_w_int8_runs(tiny_setup):
    """w_int8 decode produces a valid stream in both paths (int8 weight
    rounding may legitimately flip tokens vs full precision, so this checks
    the two int8 paths against each other)."""
    from asr_finetune_tpu.evaluation import decode as Dec
    cfg, params, mel = tiny_setup
    forced = [cfg.sot_token_id, cfg.transcribe_token_id,
              cfg.no_timestamps_token_id]
    t_x, _ = Dec.greedy_decode(params, mel, cfg, forced, max_length=16,
                               compute_dtype=jnp.float32, fused=False,
                               w_int8=True)
    t_f, _ = Dec.greedy_decode(params, mel, cfg, forced, max_length=16,
                               compute_dtype=jnp.float32, fused=True,
                               w_int8=True)
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_x))


def test_decode_step_fused_mixed_int8_merged_adapters(tiny_setup):
    """--peft --load_in_8bit eval path: merge_adapters dequantizes the
    adapted q/v projections while the rest of the base stays int8, so the
    fused kernels must handle PER-WEIGHT quantization flags (regression:
    round-2 found _scale_rows(None) crashing on exactly this mix)."""
    from asr_finetune_tpu.ops import quant
    from asr_finetune_tpu.training import lora as lora_lib

    cfg, params, mel = tiny_setup
    Bt = mel.shape[0]
    qparams = dict(params)
    qparams["decoder"] = dict(params["decoder"])
    qparams["decoder"]["layers"] = quant.quantize_tree_int8(
        params["decoder"]["layers"])
    lcfg = lora_lib.LoraConfig(rank=2, alpha=4.0, dropout=0.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(7), cfg, lcfg)
    # make the deltas nonzero so the merge visibly changes q/v
    adapters = jax.tree.map(
        lambda a: a + 0.01 if a.ndim == 3 else a, adapters)
    merged = lora_lib.merge_adapters(qparams, adapters)
    dl = merged["decoder"]["layers"]
    assert "w" in dl["self_attn"]["q"], "adapted q should be dequantized fp"
    assert "w_q8" in dl["self_attn"]["o"], "o should remain int8"

    enc = W.encode(params, mel, cfg, compute_dtype=jnp.float32)
    ckv = W.precompute_cross_kv(merged, enc, cfg)
    s_real = enc.shape[1]
    s_pad = ((s_real + 127) // 128) * 128
    ckv_pad = {k: jnp.pad(v, [(0, 0), (0, 0), (0, s_pad - s_real),
                              (0, 0), (0, 0)]).reshape(
                    v.shape[0], v.shape[1], s_pad, -1)
               for k, v in ckv.items()}
    cache_x = W.init_cache(cfg, Bt, 128, dtype=jnp.float32)
    cache_f = W.init_cache(cfg, Bt, 128, dtype=jnp.float32, dense=True)

    rng = np.random.default_rng(5)
    for pos in range(3):
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, Bt), jnp.int32)
        lx, cache_x = W.decode_step(merged, tok, jnp.int32(pos), cache_x,
                                    ckv, cfg, None, jnp.float32)
        lf, cache_f = W.decode_step_fused(merged, tok, jnp.int32(pos),
                                          cache_f, ckv_pad, cfg, s_real,
                                          jnp.float32)
        np.testing.assert_allclose(lf, lx, rtol=2e-4, atol=2e-4,
                                   err_msg=f"pos={pos}")


def test_fused_decode_multichip_shard_map(tiny_setup):
    """Pure-DP multi-chip fused decode: make_decode_fn(mesh=...) runs the
    Pallas kernels per-shard under shard_map (batch over 'data'), matching
    the single-device XLA decode token-for-token. On the CPU suite the
    kernels run in interpret mode inside the shard_map body."""
    from asr_finetune_tpu.evaluation import decode as Dec
    from jax.sharding import Mesh

    cfg, params, mel = tiny_setup        # B = 2
    forced = [cfg.sot_token_id, cfg.transcribe_token_id,
              cfg.no_timestamps_token_id]
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.array(devs[:2]), ("data",))

    fn = Dec.make_decode_fn(cfg, forced, max_length=16, num_beams=1,
                            compute_dtype=jnp.float32, fused=True, mesh=mesh)
    t_mc, l_mc = fn(params, mel)
    t_ref, l_ref = Dec.greedy_decode(params, mel, cfg, forced, max_length=16,
                                     compute_dtype=jnp.float32, fused=False)
    np.testing.assert_array_equal(np.asarray(t_mc), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(l_mc), np.asarray(l_ref))


def test_use_fused_multichip_mesh_guards():
    """shard_map fused decode activates only on pure-DP multi-device
    meshes; model-parallel meshes keep the auto-sharded XLA path (the
    Pallas kernels are single-device and TP-sharded params would gather)."""
    from asr_finetune_tpu.evaluation.decode import _use_fused_multichip
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    if devs.size < 4:
        pytest.skip("needs >= 4 devices")
    dp = Mesh(devs[:4], ("data",))
    assert _use_fused_multichip(dp, True)
    assert not _use_fused_multichip(dp, False)
    tp = Mesh(devs[:4].reshape(2, 2), ("data", "model"))
    assert not _use_fused_multichip(tp, True)
    one = Mesh(devs[:1], ("data",))
    assert not _use_fused_multichip(one, True)


def test_fused_decode_multichip_with_kv_int8(tiny_setup):
    """shard_map fused decode composes with int8 cross-KV streaming: the
    per-shard kernels consume the quantized form and match the XLA path's
    int8 decode token-for-token."""
    from asr_finetune_tpu.evaluation import decode as Dec
    from jax.sharding import Mesh

    cfg, params, mel = tiny_setup
    forced = [cfg.sot_token_id, cfg.transcribe_token_id,
              cfg.no_timestamps_token_id]
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.array(devs[:2]), ("data",))

    fn = Dec.make_decode_fn(cfg, forced, max_length=16, num_beams=1,
                            compute_dtype=jnp.float32, fused=True,
                            kv_int8=True, mesh=mesh)
    t_mc, l_mc = fn(params, mel)
    t_ref, l_ref = Dec.greedy_decode(params, mel, cfg, forced, max_length=16,
                                     compute_dtype=jnp.float32, fused=False,
                                     kv_int8=True)
    np.testing.assert_array_equal(np.asarray(t_mc), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(l_mc), np.asarray(l_ref))
