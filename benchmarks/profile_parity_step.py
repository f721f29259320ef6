"""Decompose the parity-config train step (large-v3, LoRA enc+dec q/v,
int8 W8A8 base, bs 8): time each stage's fwd+bwd in isolation to find the
cost centers. Not part of the test suite — a measurement tool.

Usage: python benchmarks/profile_parity_step.py [--int8 0]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready alone does not flush the axon remote-execution
    # tunnel (see bench.py); a host transfer does — but keep it to ONE
    # SCALAR (an on-device reduce first), or the fetch itself dominates
    # (decoder logits are 160 MB: a whole-leaf np.asarray costs ~2.5 s
    # of tunnel bandwidth and swamps the measurement)
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
    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import get_config
    from asr_finetune_tpu.ops import logmel
    from asr_finetune_tpu.training import lora as lora_lib

    int8 = "--int8" not in sys.argv or sys.argv[sys.argv.index("--int8") + 1] != "0"
    B, L = 8, 192
    cfg = get_config(os.environ.get("BENCH_MODEL", "large-v3"))
    rng = jax.random.PRNGKey(0)
    params = W.init_params(rng, cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    if int8:
        from asr_finetune_tpu.ops import quant
        params = quant.quantize_tree_int8(params)
        quant.set_int8_compute(True)
    lcfg = lora_lib.LoraConfig(rank=8, alpha=16.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), cfg, lcfg,
                                      encoder=True)

    host = np.random.default_rng(0)
    audio = jnp.asarray(host.standard_normal(
        (B, logmel.CHUNK_SAMPLES)).astype(np.float32) * 0.1)
    toks = jnp.asarray(host.integers(0, 2000, (B, L)).astype(np.int32))
    mel = jax.jit(lambda a: logmel.log_mel_spectrogram(
        a, cfg.num_mel_bins).astype(jnp.bfloat16))(audio)
    enc_adp = {"encoder": adapters["encoder"]} if "encoder" in adapters else {}
    dec_adp = {k: v for k, v in adapters.items() if k != "encoder"}

    def report(name, t):
        print(f"{name:22s}: {t:8.2f} ms", flush=True)

    # --- logmel frontend
    t_mel = timeit(jax.jit(lambda a: logmel.log_mel_spectrogram(
        a, cfg.num_mel_bins)), audio)
    report("logmel frontend", t_mel)

    # --- encoder fwd (params passed as args: closure constants would be
    # uploaded with the program and overflow the axon tunnel's body limit)
    def enc_fwd(params, adp, mel):
        return W.encode(params, mel, cfg, adapters=adp,
                        compute_dtype=jnp.bfloat16, remat=True)
    t_enc_f = timeit(jax.jit(enc_fwd), params, enc_adp, mel)
    report("encoder fwd", t_enc_f)

    # --- encoder fwd+bwd (grad wrt adapters)
    def enc_loss(adp, params, mel):
        return jnp.sum(enc_fwd(params, adp, mel)
                       .astype(jnp.float32) ** 2) * 1e-6
    t_enc_fb = timeit(jax.jit(jax.grad(enc_loss)), enc_adp, params, mel)
    report("encoder fwd+bwd", t_enc_fb)

    enc_out = jax.jit(enc_fwd)(params, enc_adp, mel)

    # --- decoder fwd
    def dec_fwd(params, adp, enc_out):
        return W.decode_train(params, toks, enc_out, cfg, adapters=adp,
                              compute_dtype=jnp.bfloat16, remat=True)
    t_dec_f = timeit(jax.jit(dec_fwd), params, dec_adp, enc_out)
    report("decoder fwd", t_dec_f)

    # --- decoder fwd+bwd (incl. grad through enc_out)
    def dec_loss(adp, enc_out, params):
        return jnp.sum(dec_fwd(params, adp, enc_out)
                       .astype(jnp.float32) ** 2) * 1e-9
    t_dec_fb = timeit(jax.jit(jax.grad(dec_loss, argnums=(0, 1))),
                      dec_adp, enc_out, params)
    report("decoder fwd+bwd", t_dec_fb)

    # the full train step is bench.py's job — holding every stage's
    # buffers AND a train state OOMs the 16 GB chip from inside this tool
    report("enc_fb + dec_fb", t_enc_fb + t_dec_fb)


if __name__ == "__main__":
    main()
