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
