"""Model forward parity against HF WhisperForConditionalGeneration.

An offline-constructible random HF model is the golden target: convert its
state_dict with models/convert_hf.py and require logit agreement. This pins
the weight layout conversion AND the forward math (conv stem, pre-LN blocks,
tied output projection) to the semantics the reference trains with
(finetune/training/models/whisper_models.py:79-113).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import get_config
from asr_finetune_tpu.models.convert_hf import from_hf_state_dict, config_from_hf


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    hf_cfg = WhisperConfig(
        vocab_size=300,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=150,
        max_target_positions=64,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
    )
    torch.manual_seed(0)
    hf_model = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = from_hf_state_dict(hf_model.state_dict(), cfg)
    return hf_model, params, cfg


def test_forward_matches_hf(hf_pair):
    import torch

    hf_model, params, cfg = hf_pair
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 300, cfg.num_mel_bins)).astype(np.float32)
    toks = rng.integers(0, cfg.vocab_size, (2, 10)).astype(np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_features=torch.tensor(mel).transpose(1, 2),  # HF wants (B, mels, T)
            decoder_input_ids=torch.tensor(toks),
        ).logits.numpy()

    ours = np.asarray(
        W.forward(params, jnp.asarray(mel), jnp.asarray(toks.astype(np.int32)),
                  cfg, compute_dtype=jnp.float32)
    )
    # fp32 tolerance covers torch-oneDNN vs XLA accumulation-order noise only;
    # exact-math parity is pinned by test_forward_matches_hf_f64 (5.7e-15).
    np.testing.assert_allclose(ours, hf_out, atol=5e-3, rtol=5e-2)


def test_forward_matches_hf_f64():
    import subprocess, sys, pathlib

    script = pathlib.Path(__file__).parent / "_f64_parity_script.py"
    out = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, cwd=str(script.parent.parent), timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "F64_MAXDIFF" in out.stdout


def test_incremental_decode_matches_teacher_forced(hf_pair):
    _, params, cfg = hf_pair
    rng = np.random.default_rng(1)
    B, T = 2, 7
    mel = jnp.asarray(rng.standard_normal((B, 300, cfg.num_mel_bins)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32))

    enc = W.encode(params, mel, cfg, compute_dtype=jnp.float32)
    full = W.decode_train(params, toks, enc, cfg, compute_dtype=jnp.float32)

    cache = W.init_cache(cfg, B, T, dtype=jnp.float32)
    cross = W.precompute_cross_kv(params, enc, cfg)
    step_fn = jax.jit(
        lambda tok, pos, cache: W.decode_step(params, tok, pos, cache, cross,
                                              cfg, compute_dtype=jnp.float32))
    step_logits = []
    for t in range(T):
        lg, cache = step_fn(toks[:, t], jnp.int32(t), cache)
        step_logits.append(np.asarray(lg))
    inc = np.stack(step_logits, axis=1)
    # fp32 tolerance: layernorm rsqrt amplifies accumulation-order noise on the
    # random-init test model; exact agreement is pinned in the f64 subprocess.
    np.testing.assert_allclose(inc, np.asarray(full), atol=1e-2, rtol=1e-1)


def test_loss_masking():
    cfg = get_config("test-nano")
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((1, 60, cfg.num_mel_bins))
    toks = jnp.array([[5, 6, 7, 8]], jnp.int32)
    logits = W.forward(params, mel, toks, cfg, compute_dtype=jnp.float32)
    labels_all = jnp.array([[6, 7, 8, 9]], jnp.int32)
    labels_masked = jnp.array([[6, 7, W.IGNORE_ID, W.IGNORE_ID]], jnp.int32)
    loss_all, n_all = W.cross_entropy(logits, labels_all)
    loss_m, n_m = W.cross_entropy(logits, labels_masked)
    assert int(n_all) == 4 and int(n_m) == 2
    assert not np.allclose(float(loss_all), float(loss_m))


def test_asymmetric_decoder_depth_forward_and_decode():
    """turbo/distil-style configs have decoder_layers != encoder_layers;
    forward and the (fused and XLA) decode paths must use each depth in
    the right place (large-v3-turbo: 32 enc / 4 dec)."""
    import dataclasses
    from asr_finetune_tpu.evaluation import decode as Dec
    from asr_finetune_tpu.models.configs import get_config

    # single 64-dim head: the fused kernels require head_dim == 64
    # (ops/decoder_fused.HEAD_DIM; explicit fused=True now raises otherwise)
    cfg = dataclasses.replace(get_config("test-nano"),
                              encoder_layers=3, decoder_layers=1,
                              encoder_heads=1, decoder_heads=1)
    params = W.init_params(jax.random.PRNGKey(5), cfg)
    assert params["encoder"]["layers"]["mlp"]["fc1"]["w"].shape[0] == 3
    assert params["decoder"]["layers"]["mlp"]["fc1"]["w"].shape[0] == 1
    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)).astype(np.float32))
    forced = [cfg.sot_token_id, cfg.transcribe_token_id,
              cfg.no_timestamps_token_id]
    t_x, _ = Dec.greedy_decode(params, mel, cfg, forced, max_length=12,
                               compute_dtype=jnp.float32, fused=False)
    t_f, _ = Dec.greedy_decode(params, mel, cfg, forced, max_length=12,
                               compute_dtype=jnp.float32, fused=True)
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_x))
