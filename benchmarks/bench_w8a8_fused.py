"""A/B the W8A8 matmul implementations on TPU at the large-v3 encoder
shapes: the XLA formulation (ops/quant._w8a8_impl — separate per-row
activation-quant pass, then s8xs8 dot) vs a Pallas kernel that fuses the
quant prologue and the dequant-scale epilogue into the matmul, so the int8
activation tile never round-trips HBM.

Shapes (B=8, T=1500, d=1280): qkv (12000,1280)x(1280,3840),
o (12000,1280)x(1280,1280), fc1 (...x5120), fc2 (5120->1280).

Measured (v5e, 2026-08-18): fused wins on the MLP shapes
(fc1 1.15x, fc2 1.18x) and loses on the K=N=1280-class projections
(qkv 0.89x, o 0.75x) — the standalone quant pass's HBM cost scales with
K, so only the wide-K / wide-N MLP matmuls amortize the in-kernel
serialization of quant VPU work with the MXU. END-TO-END the micro wins
did not survive (13.51 vs 14.01 utt/s/chip on the parity trial —
ops/w8a8_fused.py docstring has the analysis), so production dispatch
(ops/quant.py) is opt-in via ASR_TPU_FUSED_W8A8=1.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pin the opt-in fused dispatch off so the "xla" baseline below stays the
# standalone-quant-pass formulation being A/B'd against.
os.environ["ASR_TPU_FUSED_W8A8"] = "0"

from asr_finetune_tpu.ops.quant import _w8a8_impl, quantize_weight

M = 12000


def _kernel(x_ref, w_ref, ws_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    y32 = jax.lax.dot(x8, w_ref[...], preferred_element_type=jnp.int32)
    o_ref[...] = (y32.astype(jnp.float32) * xs
                  * ws_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def fused_w8a8(x, w_q8, w_scale, mt=240, nt=None):
    m, K = x.shape
    N = w_q8.shape[1]
    nt = nt or N
    grid = (m // mt, N // nt)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, N), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mt, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mt, nt), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w_q8, w_scale.reshape(1, -1))


def _sync(out):
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def timeit(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    rng = np.random.default_rng(0)
    for name, K, N in (("qkv", 1280, 3840), ("o", 1280, 1280),
                       ("fc1", 1280, 5120), ("fc2", 5120, 1280)):
        x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32) * 0.5,
                        jnp.bfloat16)
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
        q = quantize_weight(jnp.asarray(w))
        w8, ws = q["w_q8"], q["w_scale"]

        xla = jax.jit(functools.partial(_w8a8_impl))
        y_ref = xla(x, w8, ws)
        t_x = timeit(xla, x, w8, ws)
        print(f"{name:4s} K={K:5d} N={N:5d}  xla {t_x:7.3f} ms")

        for mt in (120, 240, 480, 600, 1200):
            for nt in {N, min(N, 1280), min(N, 2560)}:
                if N % nt:
                    continue
                fus = jax.jit(functools.partial(fused_w8a8, mt=mt, nt=nt))
                y_new = fus(x, w8, ws)
                err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                            - y_new.astype(jnp.float32))))
                t_f = timeit(fus, x, w8, ws)
                print(f"     mt={mt:5d} nt={nt:5d}  fused {t_f:7.3f} ms  "
                      f"speedup {t_x / t_f:5.2f}x  max|diff| {err:.2e}")


if __name__ == "__main__":
    main()
