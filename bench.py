"""Headline benchmark: utterances/sec/chip, whisper-large-v3 LoRA fine-tune.

Matches BASELINE.json's primary metric. One training step = on-device
log-mel frontend + teacher-forced forward/backward through the frozen
int8 base (the reference's headline config trains with load_in_8bit=True,
largev3_jun.config; here W8A8 — s8xs8 on the MXU with vector-wise
activation scales, bnb-style minus outlier decomposition) with LoRA
adapters on q/v projections (lora_dropout=0.05 active, trainers.py:527)
+ AdamW adapter update — the TPU-native equivalent of the reference's
PEFT trial hot loop (trainers.py:472-722). BENCH_INT8=0 keeps the base
in bf16 with dequant-at-use instead. The reference publishes no numbers (BASELINE.md);
vs_baseline is measured against an estimated 6 utt/s/A100 for the
reference's HF-Trainer LoRA path at batch 8 (documented in BASELINE.md —
"established, not matched").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_UTT_PER_SEC = 6.0  # estimated reference throughput per A100

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
LABEL_LEN = int(os.environ.get("BENCH_LABEL_LEN", "192"))
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
# BENCH_MODE=peft (headline, default) | full — `full` measures the full
# fine-tune step with on-device SpecAugment (BASELINE.json config #2 shape;
# use BENCH_MODEL=small for that config)
MODE = os.environ.get("BENCH_MODE", "peft")
INT8 = os.environ.get("BENCH_INT8", "1") != "0"
# BENCH_LORA_TARGETS=all (headline, reference PEFT parity: adapters on every
# q/v projection incl. encoder self-attention, trainers.py:525) | decoder
# (lighter decoder-only placement; encoder backward is dropped by XLA)
LORA_TARGETS = os.environ.get("BENCH_LORA_TARGETS", "all")


def measure(lora_targets: str):
    """One config's numbers; the headline run measures the parity
    placement and (unless BENCH_SECONDARY=0) the lighter decoder-only
    placement as a secondary line in the same JSON."""
    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import get_config
    from asr_finetune_tpu.ops import logmel
    from asr_finetune_tpu.training import lora as lora_lib
    from asr_finetune_tpu.training import optim
    from asr_finetune_tpu.training.train_step import (
        TrainStepConfig, make_train_state, make_train_step)

    cfg = get_config(MODEL)
    rng = jax.random.PRNGKey(0)
    params = W.init_params(rng, cfg)
    tx = optim.make_optimizer(1e-4, max_steps=1000)

    if MODE == "full":
        # full fine-tune: fp32 master params, on-device SpecAugment
        tcfg = TrainStepConfig(mode="full", compute_dtype=jnp.bfloat16,
                               remat=True, on_device_logmel=True,
                               spec_augment=True,
                               n_mels=cfg.num_mel_bins, max_steps=1000)
        state = make_train_state(params, tx)
        lcfg = None
    else:
        # frozen base: int8 W8A8 (reference load_in_8bit parity) by default
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        if INT8:
            from asr_finetune_tpu.ops import quant
            params = quant.quantize_tree_int8(params)
            quant.set_int8_compute(True)
        lcfg = lora_lib.LoraConfig(rank=8, alpha=16.0)
        adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), cfg, lcfg,
                                          encoder=(lora_targets == "all"))
        tcfg = TrainStepConfig(mode="peft", compute_dtype=jnp.bfloat16,
                               remat=True, on_device_logmel=True,
                               n_mels=cfg.num_mel_bins, lora=lcfg,
                               max_steps=1000)
        state = make_train_state(params, tx, adapters=adapters)
    step = jax.jit(make_train_step(cfg, tx, tcfg), donate_argnums=(0,))

    host_rng = np.random.default_rng(0)
    audio = jnp.asarray(host_rng.standard_normal(
        (BATCH, logmel.CHUNK_SAMPLES)).astype(np.float32) * 0.1)
    toks = jnp.asarray(host_rng.integers(
        0, max(cfg.vocab_size - 2000, 2), (BATCH, LABEL_LEN)).astype(np.int32))
    batch = {"audio": audio, "decoder_input_ids": toks, "labels": toks}

    for _ in range(WARMUP):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # full host sync (block_until_ready alone does not
                            # flush the axon remote-execution tunnel)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss

    n_chips = jax.local_device_count()
    utt_per_sec_per_chip = BATCH * STEPS / dt / n_chips
    if MODE == "full":
        mode_desc = "full fine-tune + SpecAugment"
    else:
        targets_desc = "enc+dec q/v" if lora_targets == "all" else "dec q/v"
        mode_desc = (f"LoRA [{targets_desc}] fine-tune"
                     + (", int8 W8A8 base" if INT8 else ""))

    # self-auditing MFU: useful model matmul FLOPs (remat recompute
    # excluded) over the chip's bf16 peak — see utils/flops.py
    from asr_finetune_tpu.utils import flops as F
    step_flops = F.train_step_flops(cfg, BATCH, LABEL_LEN, mode=MODE,
                                    encoder_adapted=(lora_targets == "all"))
    step_mfu = F.mfu(step_flops, dt / STEPS, chip="v5e", n_chips=n_chips)

    return {
        "metric": f"utterances/sec/chip ({MODEL} {mode_desc}, bs={BATCH}, "
                  f"labels={LABEL_LEN}, on-device log-mel)",
        "value": round(utt_per_sec_per_chip, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec_per_chip / A100_BASELINE_UTT_PER_SEC, 3),
        "mfu": round(step_mfu, 4),
        "model_tflops_per_step": round(step_flops / 1e12, 2),
    }


def _init_backend_or_die(timeout_s: int = 600) -> None:
    """Fail fast (clear stderr + nonzero exit) if the TPU backend hangs.

    The axon PJRT plugin blocks indefinitely INSIDE backend init when its
    relay tunnel is wedged (observed 2026-08-17: jax.devices() never
    returns and never raises — a C-level block, so an in-process SIGALRM
    handler would never run either). Probe init in a subprocess with a
    hard timeout; only on success initialize in-process. Turns a silent
    multi-hour hang into a diagnosable failure so the driver's bench
    record shows WHY there is no number."""
    import subprocess
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"bench.py: TPU backend init hung for {timeout_s}s — axon "
            "tunnel unavailable; no benchmark number can be measured")
    except subprocess.CalledProcessError as e:
        raise SystemExit(
            f"bench.py: TPU backend init failed (rc={e.returncode}) — "
            "see the probe's stderr by running "
            "`python -c 'import jax; jax.devices()'` directly")
    print(f"devices: {jax.devices()}", file=sys.stderr)


def main():
    _init_backend_or_die()
    result = measure(LORA_TARGETS)
    # the decoder-only placement is the round-2 configuration; keep it as a
    # secondary line so the lighter-workload number stays visible next to
    # the reference-parity headline (VERDICT r2 task 1)
    if (MODE == "peft" and LORA_TARGETS == "all"
            and os.environ.get("BENCH_SECONDARY", "1") != "0"):
        result["secondary"] = measure("decoder")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
