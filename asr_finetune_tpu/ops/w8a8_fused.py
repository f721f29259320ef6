"""Fused W8A8 matmul: activation quant prologue + s8xs8 MXU dot + dequant
epilogue in ONE Pallas kernel.

The XLA formulation (ops/quant._w8a8_impl) runs the dynamic per-row
activation quantization as a standalone pass: read x (bf16), write x8
(int8) + per-row scales to HBM, then read x8 back into the int8 dot. That
round-trip scales with K, so for the MLP matmuls (K or N = 4*d) it costs
real HBM time. This kernel keeps the quantized activation tile in VMEM:
each (mt, K) block of x is quantized in registers/VMEM and fed straight to
the MXU, and the int32 accumulator picks up both scales (row x channel) in
the epilogue before the bf16 result is written — one read of x, one write
of y, no int8 intermediate in HBM.

Measured (v5e, M=12000 — large-v3 bs 8 encoder token count, see
benchmarks/bench_w8a8_fused.py): the fused kernel wins on the MLP shapes
(fc1 1280->5120 and fc2 5120->1280: 1.15-1.18x) and LOSES on the
K=N=d-class attention projections (qkv 0.89x, o 0.75x) where the
standalone quant pass is cheap and XLA pipelines it better than the
in-kernel serialization of quant VPU work with the MXU. `use_fused(K, N)`
encodes that boundary; ops/quant._w8a8_impl dispatches through it.

End-to-end verdict (same-session A/B on the parity trial): the micro
wins do NOT survive in context — 13.51 utt/s/chip fused vs 14.01 XLA.
Under the trial's custom_vjp + remat structure, XLA overlaps the
standalone quant pass with neighboring VPU work and shares the int8
activation tensor between the forward and the remat recompute; the
fused schedule serializes the quant against its own MXU work and
re-quantizes on every call. Dispatch is therefore OPT-IN
(ASR_TPU_FUSED_W8A8=1) via ops/quant._w8a8_impl.

Reference capability: bitsandbytes LLM.int8() matmul
(/root/reference/finetune/training/trainers/trainers.py:512
load_in_8bit=True); the vector-wise scheme is identical to
ops/quant._w8a8_impl — this file is purely a different schedule for it.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# Row-block candidates by shape class, best first (sweep:
# benchmarks/bench_w8a8_fused.py + the n=100 host-pull-sync rerun).
# m must be divisible by the chosen block; production token counts are
# B*1500 (encoder) and B*label_bucket (decoder), all multiples of 8.
# Wide-K (fc2-like): small row blocks win (more K resident per row);
# wide-N (fc1-like): big row blocks win, and only at encoder m.
_MT_WIDE_K = (480, 448, 512, 600, 240, 120)
_MT_WIDE_N = (1200, 1500, 1000, 600)
_MIN_M_WIDE_N = 6000


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def pick_mt(m: int, k: int, n: int) -> Optional[int]:
    """Row-block for the fused kernel, or None where the XLA formulation
    wins. Fused wins only where the standalone quant pass's HBM round-trip
    is expensive relative to the dot — the wide MLP matmuls (k + n >=
    6144). Within those, measured on v5e: k > n (fc2 5120->1280) is
    1.16-1.44x at mt~480 for both encoder (m=12000) and decoder (m=3584)
    token counts; n > k (fc1 1280->5120) is 1.15-1.17x at mt=1200 at
    encoder m but LOSES (0.93x) at decoder m."""
    if k + n < 6144 or m < 3584:   # below the measured regimes: XLA
        return None
    cands = _MT_WIDE_K if k >= n else _MT_WIDE_N
    if k < n and m < _MIN_M_WIDE_N:
        return None
    for mt in cands:
        if m % mt == 0:
            return mt
    return None


def _kernel(x_ref, w_ref, ws_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    y32 = jax.lax.dot(x8, w_ref[...], preferred_element_type=jnp.int32)
    o_ref[...] = (y32.astype(jnp.float32) * xs
                  * ws_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mt", "interpret"))
def fused_w8a8(x: jax.Array, w_q8: jax.Array, w_scale: jax.Array,
               mt: int = 240, interpret: Optional[bool] = None) -> jax.Array:
    """x (m, K) float -> (m, N) in x.dtype; w_q8 (K, N) int8, w_scale
    broadcastable to (1, N) fp32. Requires m % mt == 0 (see pick_mt)."""
    if interpret is None:
        interpret = _interpret_default()
    m, K = x.shape
    N = w_q8.shape[1]
    assert m % mt == 0, (m, mt)
    grid = (m // mt,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, N), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mt, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mt, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(x, w_q8, w_scale.reshape(1, -1).astype(jnp.float32))
