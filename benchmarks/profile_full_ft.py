"""Decompose the full-fine-tune train step (whisper-small, full FT +
SpecAugment, bs 8 — BASELINE.json config #2, BENCH matrix row `full_ft`):
time each stage's fwd / fwd+bwd in isolation, plus the fp32 optimizer
update and a per-shape matmul ceiling probe, to establish whether the
measured MFU (~0.35 in BENCH_r04) is this workload's ceiling or headroom.

Not part of the test suite — a measurement tool, companion to
profile_parity_step.py (which covers the parity PEFT config).

Usage: python benchmarks/profile_full_ft.py [--model small] [--batch 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # one on-device scalar reduce + host fetch flushes the axon tunnel
    # without paying a whole-leaf transfer (see profile_parity_step.py)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="small")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--labels", type=int, default=192)
    a = p.parse_args()

    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import get_config
    from asr_finetune_tpu.ops import logmel
    from asr_finetune_tpu.ops.spec_augment import spec_augment
    from asr_finetune_tpu.training import optim
    from asr_finetune_tpu.utils import flops as F

    B, L = a.batch, a.labels
    cfg = get_config(a.model)
    rng = jax.random.PRNGKey(0)
    params = W.init_params(rng, cfg)  # fp32 masters, as in the train step

    host = np.random.default_rng(0)
    audio = jnp.asarray(host.standard_normal(
        (B, logmel.CHUNK_SAMPLES)).astype(np.float32) * 0.1)
    toks = jnp.asarray(host.integers(0, 2000, (B, L)).astype(np.int32))
    mel = jax.jit(lambda x: logmel.log_mel_spectrogram(
        x, cfg.num_mel_bins).astype(jnp.bfloat16))(audio)

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    enc_f = F.encoder_flops(cfg, B)
    dec_f = F.decoder_flops(cfg, B, L)
    print(f"model={a.model} d={cfg.d_model} enc_layers={cfg.encoder_layers} "
          f"dec_layers={cfg.decoder_layers} params={n_params/1e6:.0f}M "
          f"bs={B} labels={L}", flush=True)
    print(f"fwd model TF: encoder {enc_f/1e12:.2f}, decoder {dec_f/1e12:.2f} "
          f"(train step = 3x = {(3*(enc_f+dec_f))/1e12:.2f})", flush=True)

    def report(name, t, tf=None):
        eff = f"  -> {tf/ (t/1e3) /1e12:7.1f} TF/s" if tf else ""
        print(f"{name:26s}: {t:8.2f} ms{eff}", flush=True)

    # --- frontend: logmel, +SpecAugment
    t_mel = timeit(jax.jit(lambda x: logmel.log_mel_spectrogram(
        x, cfg.num_mel_bins)), audio)
    report("logmel frontend", t_mel)
    t_sa = timeit(jax.jit(lambda r, m: spec_augment(r, m)),
                  jax.random.PRNGKey(3), mel)
    report("spec_augment", t_sa)

    # --- encoder fwd / fwd+bwd wrt PARAMS (full-FT backward: dx AND dw
    # through every matmul; remat=True as the train step runs it)
    def enc_fwd(params, mel):
        return W.encode(params, mel, cfg, compute_dtype=jnp.bfloat16,
                        remat=True)
    t_enc_fwd = timeit(jax.jit(enc_fwd), params, mel)
    report("encoder fwd", t_enc_fwd, enc_f)

    def enc_loss(params, mel):
        return jnp.sum(enc_fwd(params, mel).astype(jnp.float32) ** 2) * 1e-6
    t_enc_fb = timeit(jax.jit(jax.grad(enc_loss)), params, mel)
    report("encoder fwd+bwd", t_enc_fb, 3 * enc_f)

    enc_out = jax.jit(enc_fwd)(params, mel)

    # --- decoder fwd / fwd+bwd wrt (params, enc_out)
    def dec_fwd(params, enc_out):
        return W.decode_train(params, toks, enc_out, cfg,
                              compute_dtype=jnp.bfloat16, remat=True)
    t_dec_fwd = timeit(jax.jit(dec_fwd), params, enc_out)
    report("decoder fwd (+logits)", t_dec_fwd, dec_f)

    def dec_loss(params, enc_out):
        return jnp.sum(dec_fwd(params, enc_out)
                       .astype(jnp.float32) ** 2) * 1e-9
    t_dec_fb = timeit(jax.jit(jax.grad(dec_loss, argnums=(0, 1))),
                      params, enc_out)
    report("decoder fwd+bwd", t_dec_fb, 3 * dec_f)

    # --- optimizer: AdamW on fp32 masters (params + m + v: 3 fp32 reads
    # + 3 writes per weight = 24 B/param of HBM)
    tx = optim.make_optimizer(1e-4, max_steps=1000)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    def opt_update(grads, opt_state, params):
        import optax
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt
    t_opt = timeit(jax.jit(opt_update), grads, opt_state, params)
    ideal_opt = n_params * 24 / 819e9 * 1e3  # ms at the HBM roofline
    print(f"{'optimizer (AdamW fp32)':26s}: {t_opt:8.2f} ms  "
          f"(HBM roofline {ideal_opt:.2f} ms)", flush=True)

    # --- matmul ceiling probe at this model's actual shapes: what TF/s
    # does the MXU reach on d={d} bf16 matmuls (fwd + the two bwd shapes)?
    d, ff, T = cfg.d_model, cfg.d_ff, 1500
    x = jnp.asarray(host.standard_normal((B * T, d)), jnp.bfloat16)
    w1 = jnp.asarray(host.standard_normal((d, ff)), jnp.bfloat16)
    h = jnp.asarray(host.standard_normal((B * T, ff)), jnp.bfloat16)

    def mlp_chain(x, w1):
        # 8 chained (BT,d)x(d,ff) matmuls — serial, weight-resident
        for _ in range(8):
            y = jax.nn.gelu(x @ w1, approximate=False)
            x = y @ w1.T
        return x
    t_mm = timeit(jax.jit(mlp_chain), x, w1)
    mm_f = 16 * 2.0 * B * T * d * ff
    report(f"bf16 mlp chain d={d}", t_mm, mm_f)

    def dw_chain(x, h):
        # dw shape: (d, BT) x (BT, ff) — the full-FT-only matmul; each
        # iteration's x depends on the previous acc so XLA can't CSE the
        # eight einsums into one
        acc = jnp.zeros((d, ff), jnp.float32)
        for _ in range(8):
            acc = acc + jnp.einsum("td,tf->df", x, h,
                                   preferred_element_type=jnp.float32)
            x = x + (jnp.sum(acc) * 1e-30).astype(jnp.bfloat16)
        return acc
    t_dw = timeit(jax.jit(dw_chain), x, h)
    dw_f = 8 * 2.0 * B * T * d * ff
    report(f"bf16 dw chain d={d}", t_dw, dw_f)

    total = t_mel + t_sa + t_enc_fb + t_dec_fb + t_opt
    step_f = 3 * (enc_f + dec_f)
    print(f"{'sum of stages':26s}: {total:8.2f} ms  "
          f"(MFU at sum {F.mfu(step_f, total/1e3):.3f})", flush=True)


if __name__ == "__main__":
    main()
