"""Subprocess script: strict float64 logit parity vs HF Whisper.

Run in its own process because jax_enable_x64 is a process-global flag that
must not leak into the other (f32/bf16, production-dtype) tests.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["HF_HUB_OFFLINE"] = "1"
os.environ["TRANSFORMERS_OFFLINE"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import torch
from transformers import WhisperConfig, WhisperForConditionalGeneration

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.convert_hf import from_hf_state_dict, config_from_hf

hf_cfg = WhisperConfig(
    vocab_size=300, num_mel_bins=80, d_model=64, encoder_layers=2,
    decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=256, decoder_ffn_dim=256, max_source_positions=150,
    max_target_positions=64, pad_token_id=0, bos_token_id=1, eos_token_id=2,
    decoder_start_token_id=3,
)
torch.manual_seed(0)
m = WhisperForConditionalGeneration(hf_cfg).double().eval()
cfg = config_from_hf(hf_cfg)
params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float64),
                      from_hf_state_dict(m.state_dict(), cfg))

rng = np.random.default_rng(0)
mel = rng.standard_normal((2, 300, 80))
toks = rng.integers(0, 300, (2, 10))
with torch.no_grad():
    hf = m(input_features=torch.tensor(mel).transpose(1, 2),
           decoder_input_ids=torch.tensor(toks)).logits.numpy()
ours = np.asarray(W.forward(params, jnp.asarray(mel),
                            jnp.asarray(toks.astype(np.int32)), cfg,
                            compute_dtype=jnp.float64))
maxdiff = float(np.abs(ours - hf).max())
print(f"F64_MAXDIFF={maxdiff:.3e}")
assert maxdiff < 1e-10, maxdiff

# incremental KV-cache decode must match teacher-forced decode exactly
B, T = 2, 5
mel_j = jnp.asarray(mel)
toks_j = jnp.asarray(toks[:, :T].astype(np.int32))
enc = W.encode(params, mel_j, cfg, compute_dtype=jnp.float64)
full = np.asarray(W.decode_train(params, toks_j, enc, cfg, compute_dtype=jnp.float64))
cache = W.init_cache(cfg, B, T, dtype=jnp.float64)
cross = W.precompute_cross_kv(params, enc, cfg)
step_fn = jax.jit(lambda tok, pos, cache: W.decode_step(
    params, tok, pos, cache, cross, cfg, compute_dtype=jnp.float64))
inc = []
for t in range(T):
    lg, cache = step_fn(toks_j[:, t], jnp.int32(t), cache)
    inc.append(np.asarray(lg))
inc_diff = float(np.abs(np.stack(inc, 1) - full).max())
print(f"F64_INCREMENTAL_MAXDIFF={inc_diff:.3e}")
assert inc_diff < 1e-10, inc_diff
