"""Import HF Whisper checkpoints into the framework's param pytree.

Capability parity with the reference's model loading
(finetune/training/models/whisper_models.py:20-77 — `from_pretrained` over a
local directory tree for air-gapped clusters, or the HF hub). Here the import
is an explicit, testable weight-layout conversion: HF torch/safetensors
state_dict → stacked-layer pytree (models/whisper.py). Also handles the
reference's tied `proj_out` reconstruction concern (evaluate_model.py:164-167)
for free: our output projection is always the tied embedding.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from .configs import WhisperConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch here
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _stack(sd: Mapping[str, Any], fmt: str, n: int, transpose: bool = False) -> jnp.ndarray:
    arrs = []
    for i in range(n):
        a = _np(sd[fmt.format(i)]).astype(np.float32)
        arrs.append(a.T if transpose else a)
    return jnp.asarray(np.stack(arrs, 0))


def _ln(sd, fmt):
    return {"scale": jnp.asarray(_np(sd[fmt + ".weight"]).astype(np.float32)),
            "bias": jnp.asarray(_np(sd[fmt + ".bias"]).astype(np.float32))}


def from_hf_state_dict(sd: Mapping[str, Any], cfg: WhisperConfig) -> Dict[str, Any]:
    """Convert an HF WhisperForConditionalGeneration state_dict → our pytree."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    Le, Ld = cfg.encoder_layers, cfg.decoder_layers

    encoder = {
        # torch Conv1d weight is (out, in, k); ours is (k, in, out)
        "conv1": {"w": jnp.asarray(_np(sd["encoder.conv1.weight"]).astype(np.float32).transpose(2, 1, 0)),
                  "b": jnp.asarray(_np(sd["encoder.conv1.bias"]).astype(np.float32))},
        "conv2": {"w": jnp.asarray(_np(sd["encoder.conv2.weight"]).astype(np.float32).transpose(2, 1, 0)),
                  "b": jnp.asarray(_np(sd["encoder.conv2.bias"]).astype(np.float32))},
        "layers": {
            "ln1": _ln_fmt(sd, "encoder.layers.{}.self_attn_layer_norm", Le),
            "attn": _attn_fmt(sd, "encoder.layers.{}.self_attn", Le),
            "ln2": _ln_fmt(sd, "encoder.layers.{}.final_layer_norm", Le),
            "mlp": _mlp_fmt(sd, "encoder.layers.{}", Le),
        },
        "ln_post": _ln(sd, "encoder.layer_norm"),
    }

    decoder = {
        "embed": jnp.asarray(_np(sd["decoder.embed_tokens.weight"]).astype(np.float32)),
        "pos": jnp.asarray(_np(sd["decoder.embed_positions.weight"]).astype(np.float32)),
        "layers": {
            "ln1": _ln_fmt(sd, "decoder.layers.{}.self_attn_layer_norm", Ld),
            "self_attn": _attn_fmt(sd, "decoder.layers.{}.self_attn", Ld),
            "ln2": _ln_fmt(sd, "decoder.layers.{}.encoder_attn_layer_norm", Ld),
            "cross_attn": _attn_fmt(sd, "decoder.layers.{}.encoder_attn", Ld),
            "ln3": _ln_fmt(sd, "decoder.layers.{}.final_layer_norm", Ld),
            "mlp": _mlp_fmt(sd, "decoder.layers.{}", Ld),
        },
        "ln_post": _ln(sd, "decoder.layer_norm"),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "encoder_pos": jnp.asarray(_np(sd["encoder.embed_positions.weight"]).astype(np.float32)),
    }


def _attn_fmt(sd, prefix_fmt, n):
    def fmt(name):
        return prefix_fmt + "." + name

    return {
        "q": {"w": _stack(sd, fmt("q_proj.weight"), n, True),
              "b": _stack(sd, fmt("q_proj.bias"), n)},
        "k": {"w": _stack(sd, fmt("k_proj.weight"), n, True)},
        "v": {"w": _stack(sd, fmt("v_proj.weight"), n, True),
              "b": _stack(sd, fmt("v_proj.bias"), n)},
        "o": {"w": _stack(sd, fmt("out_proj.weight"), n, True),
              "b": _stack(sd, fmt("out_proj.bias"), n)},
    }


def _ln_fmt(sd, fmt, n):
    return {"scale": _stack(sd, fmt + ".weight", n),
            "bias": _stack(sd, fmt + ".bias", n)}


def _mlp_fmt(sd, prefix_fmt, n):
    return {
        "fc1": {"w": _stack(sd, prefix_fmt + ".fc1.weight", n, True),
                "b": _stack(sd, prefix_fmt + ".fc1.bias", n)},
        "fc2": {"w": _stack(sd, prefix_fmt + ".fc2.weight", n, True),
                "b": _stack(sd, prefix_fmt + ".fc2.bias", n)},
    }


def config_from_hf(hf_config) -> WhisperConfig:
    """Build a WhisperConfig from an HF WhisperConfig object or dict.

    The special-token layout follows the vocab size (the dims in
    config.json identify the family): 51866 = large-v3/turbo (adds
    <|yue|>, ids shift by one), 51864 = English-only .en (no language/
    task tokens), 51865 = the multilingual v1/v2/distil layout."""
    get = (lambda k, d=None: getattr(hf_config, k, d)) if not isinstance(hf_config, dict) \
        else (lambda k, d=None: hf_config.get(k, d))
    from .tokenizer import SpecialTokens
    sp = SpecialTokens.for_vocab(get("vocab_size"))
    return WhisperConfig(
        vocab_size=get("vocab_size"),
        num_mel_bins=get("num_mel_bins"),
        d_model=get("d_model"),
        encoder_layers=get("encoder_layers"),
        encoder_heads=get("encoder_attention_heads"),
        decoder_layers=get("decoder_layers"),
        decoder_heads=get("decoder_attention_heads"),
        d_ff=get("encoder_ffn_dim"),
        max_source_positions=get("max_source_positions", 1500),
        max_target_positions=get("max_target_positions", 448),
        eos_token_id=get("eos_token_id", sp.eot),
        sot_token_id=get("decoder_start_token_id", sp.sot),
        pad_token_id=get("pad_token_id", sp.eot),
        translate_token_id=sp.translate,
        transcribe_token_id=sp.transcribe,
        no_timestamps_token_id=sp.no_timestamps,
        timestamp_begin_id=sp.timestamp_begin,
        first_language_token_id=sp.first_language,
    )


def load_checkpoint_dir(path: str) -> Dict[str, np.ndarray]:
    """Read an HF checkpoint directory (safetensors preferred, torch .bin else)."""
    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            sd.update(load_file(os.path.join(path, f)))
        return sd
    bins = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
    if bins:
        import torch
        for f in bins:
            raw = torch.load(os.path.join(path, f), map_location="cpu", weights_only=True)
            sd.update({k: v.numpy() for k, v in raw.items()})
        return sd
    raise FileNotFoundError(f"no .safetensors or .bin weights under {path}")


def load_pretrained(path: str):
    """(params, cfg) from an HF model directory with config.json + weights."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf(json.load(f))
    sd = load_checkpoint_dir(path)
    return from_hf_state_dict(sd, cfg), cfg
