"""Microbenchmark the encoder-layer components on TPU to locate the
parity-step backward's cost (profile_parity_step.py shows encoder
fwd+bwd = 464 ms of the 661 ms step at large-v3 bs 8).

Shapes: large-v3 encoder, bs 8 -> tokens (8*1536, 1280), heads 20*8=160.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, D, F, H, HD = 8, 1536, 1280, 5120, 20, 64
N = B * T


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32) * 0.1, bf)
    w_dd = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.02, bf)
    w_df = jnp.asarray(rng.standard_normal((D, F)).astype(np.float32) * 0.02, bf)
    w_fd = jnp.asarray(rng.standard_normal((F, D)).astype(np.float32) * 0.02, bf)
    h = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32) * 0.1, bf)

    mm = jax.jit(lambda a, b: a @ b)
    t_dd = timeit(mm, x, w_dd)
    t_df = timeit(mm, x, w_df)
    t_fd = timeit(mm, h, w_fd)
    gf_dd = 2 * N * D * D / 1e9
    gf_df = 2 * N * D * F / 1e9
    print(f"bf16 (N,{D})x({D},{D})   : {t_dd:7.3f} ms  {gf_dd/t_dd:6.1f} TF/s")
    print(f"bf16 (N,{D})x({D},{F})  : {t_df:7.3f} ms  {gf_df/t_df:6.1f} TF/s")
    print(f"bf16 (N,{F})x({F},{D})  : {t_fd:7.3f} ms  {gf_df/t_fd:6.1f} TF/s")

    # int8 W8A8 path
    from asr_finetune_tpu.ops import quant
    w8 = jnp.asarray(rng.integers(-127, 127, (D, D)).astype(np.int8))
    ws = jnp.ones((1, D), jnp.float32) * 0.01
    w8f = jnp.asarray(rng.integers(-127, 127, (D, F)).astype(np.int8))
    wsf = jnp.ones((1, F), jnp.float32) * 0.01
    i8 = jax.jit(lambda a, w, s: quant.int8_matmul(a, w, s))
    t_i8dd = timeit(i8, x, w8, ws)
    t_i8df = timeit(i8, x, w8f, wsf)
    print(f"int8 (N,{D})x({D},{D})   : {t_i8dd:7.3f} ms  {gf_dd/t_i8dd:6.1f} TF/s")
    print(f"int8 (N,{D})x({D},{F})  : {t_i8df:7.3f} ms  {gf_df/t_i8df:6.1f} TF/s")

    # dense attention kernel: fwd and full vjp
    from asr_finetune_tpu.ops.encoder_attention import dense_attention
    q = jnp.asarray(rng.standard_normal((B * H, T, HD)).astype(np.float32) * 0.3, bf)
    att_f = jax.jit(lambda q, k, v: dense_attention(q, k, v, T, False))
    t_att_f = timeit(att_f, q, q, q)
    gf_att = 2 * 2 * B * H * T * T * HD / 1e9

    def att_loss(q, k, v):
        return jnp.sum(dense_attention(q, k, v, T, False).astype(jnp.float32))
    att_g = jax.jit(jax.grad(att_loss, argnums=(0, 1, 2)))
    t_att_b = timeit(att_g, q, q, q)
    gf_att_b = gf_att / 2 * 7  # fwd recompute (2) + 5 bwd matmuls
    print(f"dense attn fwd (BH={B*H}) : {t_att_f:7.3f} ms  {gf_att/t_att_f:6.1f} TF/s")
    print(f"dense attn fwd+bwd      : {t_att_b:7.3f} ms  {(gf_att+gf_att_b)/t_att_b:6.1f} TF/s")

    # upstream flash attention for comparison
    from asr_finetune_tpu.ops import attention as A
    q4 = q.reshape(B, H, T, HD).transpose(0, 2, 1, 3)
    fl_f = jax.jit(lambda q, k, v: A.attention(q, k, v, impl="flash"))
    t_fl_f = timeit(fl_f, q4, q4, q4)

    def fl_loss(q, k, v):
        return jnp.sum(A.attention(q, k, v, impl="flash").astype(jnp.float32))
    fl_g = jax.jit(jax.grad(fl_loss, argnums=(0, 1, 2)))
    t_fl_b = timeit(fl_g, q4, q4, q4)
    print(f"flash attn fwd          : {t_fl_f:7.3f} ms")
    print(f"flash attn fwd+bwd      : {t_fl_b:7.3f} ms")

    # one full encoder layer (int8 base + LoRA), fwd and fwd+bwd, remat'd
    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import get_config
    from asr_finetune_tpu.training import lora as lora_lib
    cfg = get_config("large-v3")
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(bf), params)
    params = quant.quantize_tree_int8(params)
    quant.set_int8_compute(True)
    lcfg = lora_lib.LoraConfig(rank=8, alpha=16.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), cfg, lcfg,
                                      encoder=True)
    mel = jnp.asarray(rng.standard_normal(
        (B, 3000, cfg.num_mel_bins)).astype(np.float32) * 0.1)

    def enc(params, adp, mel):
        return W.encode(params, mel, cfg, adapters=adp,
                        compute_dtype=bf, remat=True)
    t_ef = timeit(jax.jit(enc), params, adapters, mel, n=5)

    def enc_l(adp, params, mel):
        return jnp.sum(enc(params, adp, mel).astype(jnp.float32)) * 1e-6
    t_eb = timeit(jax.jit(jax.grad(enc_l)), adapters, params, mel, n=5)
    print(f"encoder fwd (32L)       : {t_ef:7.3f} ms   ({t_ef/32:.3f}/layer)")
    print(f"encoder fwd+bwd (32L)   : {t_eb:7.3f} ms   ({t_eb/32:.3f}/layer)")


if __name__ == "__main__":
    main()
