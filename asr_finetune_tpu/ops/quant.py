"""int8 quantization of the frozen base model.

Capability parity with the reference's `load_in_8bit=True` bitsandbytes path
(whisper_models.py:42,69; trainers.py:499-507 —
`prepare_model_for_kbit_training` over an LLM.int8 quantized base for
LoRA/AdaLoRA).

TPU-native design: symmetric per-output-channel int8 with an fp32 scale,
stored as {"w_q8": int8 (L, d_in, d_out), "w_scale": (L, 1, d_out)} in place
of each stacked linear weight. Dequantization happens at use inside
models/whisper.py `dense()`; XLA fuses the convert+scale into the matmul
operand read, so HBM traffic for frozen weights halves vs bf16 (4x vs fp32)
— the same memory win the reference buys from bitsandbytes, without custom
CUDA. (A fused Pallas dequant-matmul for further gains is a planned hot-op;
see ops/logmel_pallas.py for the kernel pattern used.)

No autograd hook is needed: the quantized base simply isn't differentiated
(the reference needs trainers.py:510-515's conv1 hook because torch autograd
refuses grads through int8 layers).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

QUANT_KEY = "w_q8"
SCALE_KEY = "w_scale"


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """(..., d_in, d_out) fp → int8 values + per-output-channel scales."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return {QUANT_KEY: q.astype(jnp.int8), SCALE_KEY: scale.astype(jnp.float32)}


def dequantize_weight(p: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (p[QUANT_KEY].astype(dtype) * p[SCALE_KEY].astype(dtype))


def quantize_tree_int8(params: Params, min_ndim: int = 3) -> Params:
    """Replace every stacked linear weight {"w": (L, d_in, d_out)} subtree
    entry with its int8 form. Embeddings, conv stem, layernorms, biases and
    the positional tables stay in floating point (matching bitsandbytes'
    Linear-only coverage)."""

    LINEAR_KEYS = ("q", "k", "v", "o", "fc1", "fc2")

    def walk(node, parent=""):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k == "w" and parent in LINEAR_KEYS
                        and hasattr(v, "ndim") and v.ndim >= min_ndim):
                    out.update(quantize_weight(v))
                else:
                    out[k] = walk(v, k)
            return out
        return node

    return walk(params)


def quantized_size_bytes(params: Params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
