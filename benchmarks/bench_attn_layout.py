"""A/B the dense-attention layouts on TPU: packed (B, T, H*hd) blocks vs
the (BH, T, hd) transpose layout, measured end-to-end from the projections'
natural (B, T, H, hd) output through the attention to the merged (B, T, D)
result — i.e. including the per-layer relayout each variant needs.

Shape: large-v3 encoder self-attention, bs 8 (B=8, H=20, T=1500, hd=64).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, H, HD = 8, 1500, 20, 64


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


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
    mk = lambda: jnp.asarray(
        rng.standard_normal((B, T, H, HD)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    from asr_finetune_tpu.ops import encoder_attention as EA

    def run(packed):
        os.environ["ASR_TPU_DENSE_PACKED"] = "1" if packed else "0"

        @jax.jit
        def fwd(q, k, v):
            return EA.encoder_attention(q, k, v).reshape(B, T, H * HD)

        @jax.jit
        def fbwd(q, k, v):
            def loss(q, k, v):
                o = EA.encoder_attention(q, k, v)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        tf = timeit(fwd, q, k, v)
        tb = timeit(fbwd, q, k, v)
        name = "packed  " if packed else "transpose"
        print(f"{name}: fwd {tf:7.3f} ms   fwd+bwd {tb:7.3f} ms")
        return fwd(q, k, v), tf, tb

    o0, tf0, tb0 = run(False)
    o1, tf1, tb1 = run(True)
    err = float(jnp.max(jnp.abs(o0.astype(jnp.float32)
                                - o1.astype(jnp.float32))))
    print(f"max |diff| packed vs transpose: {err:.2e}")
    print(f"fwd speedup {tf0/tf1:5.3f}x   fwd+bwd speedup {tb0/tb1:5.3f}x")


if __name__ == "__main__":
    main()
