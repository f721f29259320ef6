"""Headline benchmark + full config matrix (BASELINE.json configs 1-5).

Headline: utterances/sec/chip, whisper-large-v3 LoRA fine-tune — one
training step = on-device log-mel frontend + teacher-forced
forward/backward through the frozen int8 base (the reference's headline
config trains with load_in_8bit=True, largev3_jun.config; here W8A8 —
s8xs8 on the MXU with vector-wise activation scales + the k=8 outlier
decomposition for bnb LLM.int8() numerics parity) with LoRA adapters on
q/v projections (lora_dropout=0.05 active, trainers.py:527) + AdamW
adapter update — the TPU-native equivalent of the reference's PEFT trial
hot loop (trainers.py:472-722). BENCH_INT8=0 keeps the base in bf16 with
dequant-at-use; BENCH_INT8_OUTLIER=0 drops the outlier decomposition.

The matrix (BENCH_MATRIX=1, default) additionally records:
- full_ft      — whisper-small full fine-tune + on-device SpecAugment
                 (BASELINE.json config #2)
- decode_greedy — large-v3 greedy WER-eval decode at bs 8/16/32, plus an
                 int8-streaming variant (config #5; reference eval loop
                 evaluate_peft.py:370-430)
- decode_beam  — large-v3 beam-4 decode (config #5)
Config #4 (multi-chip DP) is exercised by the driver's dryrun_multichip
gate (virtual 8-dev mesh exec + large-v3 AOT compile; MULTICHIP_r*.json)
— single-chip hardware here can't measure it.

The reference publishes no numbers (BASELINE.md); vs_baseline is a ratio
against an ESTIMATED 6 utt/s/A100 for the reference's HF-Trainer LoRA
path at batch 8 (documented in BASELINE.md — "established, not matched").

Output: the FULL record (headline + matrix) is written to
`bench_matrix.json`; stdout's final line is ONE compact JSON line
{"metric", "value", "unit", "vs_baseline", "mfu", "summary": {one number
per matrix entry}, "matrix_file"} kept under 900 bytes so the driver's
tail capture always parses it (BENCH_r04's fat single line did not).
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
BASELINE_NOTE = (f"est. {A100_BASELINE_UTT_PER_SEC:g} utt/s/A100 "
                 "(estimated, see BASELINE.md — reference publishes none)")

MODEL = os.environ.get("BENCH_MODEL", "large-v3")
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
LABEL_LEN = int(os.environ.get("BENCH_LABEL_LEN", "192"))
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
# BENCH_MODE=peft (headline, default) | full — `full` measures the full
# fine-tune step with on-device SpecAugment as the PRIMARY metric
MODE = os.environ.get("BENCH_MODE", "peft")
INT8 = os.environ.get("BENCH_INT8", "1") != "0"
# BENCH_LORA_TARGETS=all (headline, reference PEFT parity: adapters on every
# q/v projection incl. encoder self-attention, trainers.py:525) | decoder
LORA_TARGETS = os.environ.get("BENCH_LORA_TARGETS", "all")
MATRIX = os.environ.get("BENCH_MATRIX", "1") != "0"


def measure_train(mode: str, lora_targets: str, model: str,
                  batch: int = None, steps: int = None):
    """One training config's numbers (utt/s/chip + self-audited MFU)."""
    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import get_config
    from asr_finetune_tpu.ops import logmel
    from asr_finetune_tpu.training import lora as lora_lib
    from asr_finetune_tpu.training import optim
    from asr_finetune_tpu.training.train_step import (
        TrainStepConfig, make_train_state, make_train_step)

    batch = batch or BATCH
    steps = steps or STEPS
    cfg = get_config(model)
    rng = jax.random.PRNGKey(0)
    params = W.init_params(rng, cfg)
    tx = optim.make_optimizer(1e-4, max_steps=1000)

    host_rng = np.random.default_rng(0)
    audio = jnp.asarray(host_rng.standard_normal(
        (batch, logmel.CHUNK_SAMPLES)).astype(np.float32) * 0.1)
    toks = jnp.asarray(host_rng.integers(
        0, max(cfg.vocab_size - 2000, 2), (batch, LABEL_LEN)).astype(np.int32))
    batch_d = {"audio": audio, "decoder_input_ids": toks, "labels": toks}

    int8_desc = ""
    if mode == "full":
        # full fine-tune: fp32 master params, on-device SpecAugment
        tcfg = TrainStepConfig(mode="full", compute_dtype=jnp.bfloat16,
                               remat=True, on_device_logmel=True,
                               spec_augment=True,
                               n_mels=cfg.num_mel_bins, max_steps=1000)
        state = make_train_state(params, tx)
    else:
        # frozen base: int8 W8A8 + outlier decomposition (reference
        # load_in_8bit = bnb LLM.int8() parity) by default
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        if INT8:
            from asr_finetune_tpu.ops import quant
            params = quant.quantize_tree_int8(params)
            quant.set_int8_compute(True)
            k = int(os.environ.get("BENCH_INT8_OUTLIER", "8"))
            quant.set_int8_outlier_cols(k)
            quant.set_int8_outlier_static_idx(None)
            int8_desc = (f", int8 W8A8+outlier-{k} base" if k
                         else ", int8 W8A8 base")
            # bnb-parity calibration (default): record column amax over a
            # 1-utterance forward and install bitsandbytes' threshold-6.0
            # outlier columns as static sets (ops/quant.py). Runs on the
            # CPU backend — axon PJRT lacks host callbacks.
            # BENCH_INT8_CALIBRATE=0 keeps the per-matmul dynamic top-k.
            if k and os.environ.get("BENCH_INT8_CALIBRATE", "1") != "0":
                from asr_finetune_tpu.training.train_step import (
                    make_eval_loss_step)
                ccfg = TrainStepConfig(
                    mode="peft", compute_dtype=jnp.bfloat16, remat=False,
                    on_device_logmel=True, n_mels=cfg.num_mel_bins,
                    lora=lora_lib.LoraConfig(rank=8, alpha=16.0),
                    # pure-XLA attention: Pallas TPU kernels can't run on
                    # the CPU devices this calibration executes on
                    attn_impl="xla",
                    max_steps=1000)
                cadapters = lora_lib.init_adapters(
                    jax.random.PRNGKey(1), cfg, ccfg.lora,
                    encoder=(lora_targets == "all"))
                cpu = jax.devices("cpu")[0]
                cstate = jax.device_put(
                    {"params": params, "adapters": cadapters}, cpu)
                cbatch = jax.device_put(
                    {kk: v[:1] for kk, v in batch_d.items()}, cpu)
                estep = jax.jit(make_eval_loss_step(cfg, ccfg))
                # ASR_TPU_ATTN_IMPL=xla reaches the dispatch sites a
                # config impl can't (decoder cross-attn re-promotes "xla"
                # to "auto"); read at trace time inside the calibrate call
                prev_impl = os.environ.get("ASR_TPU_ATTN_IMPL")
                os.environ["ASR_TPU_ATTN_IMPL"] = "xla"
                try:
                    idx_map = quant.calibrate_int8_outliers(
                        lambda: jax.block_until_ready(
                            estep(cstate, cbatch)))
                finally:
                    if prev_impl is None:
                        os.environ.pop("ASR_TPU_ATTN_IMPL", None)
                    else:
                        os.environ["ASR_TPU_ATTN_IMPL"] = prev_impl
                n_cols = sum(len(v) for v in idx_map.values())
                int8_desc = (f", int8 W8A8 base, bnb-calibrated outliers "
                             f"(thr 6.0: {n_cols} cols)")
                _log(f"calibrated outlier cols: "
                     f"{ {kk: len(v) for kk, v in idx_map.items()} }")
        lcfg = lora_lib.LoraConfig(rank=8, alpha=16.0)
        adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), cfg, lcfg,
                                          encoder=(lora_targets == "all"))
        tcfg = TrainStepConfig(mode="peft", compute_dtype=jnp.bfloat16,
                               remat=True, on_device_logmel=True,
                               n_mels=cfg.num_mel_bins, lora=lcfg,
                               max_steps=1000)
        state = make_train_state(params, tx, adapters=adapters)
    step = jax.jit(make_train_step(cfg, tx, tcfg), donate_argnums=(0,))

    for _ in range(WARMUP):
        state, metrics = step(state, batch_d)
    float(metrics["loss"])  # full host sync (block_until_ready alone does not
                            # flush the axon remote-execution tunnel)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch_d)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss

    n_chips = jax.local_device_count()
    utt_per_sec_per_chip = batch * steps / dt / n_chips
    if mode == "full":
        mode_desc = "full fine-tune + SpecAugment"
    else:
        targets_desc = "enc+dec q/v" if lora_targets == "all" else "dec q/v"
        mode_desc = f"LoRA [{targets_desc}] fine-tune{int8_desc}"

    # self-auditing MFU: useful model matmul FLOPs (remat recompute
    # excluded) over the chip's bf16 peak — see utils/flops.py
    from asr_finetune_tpu.utils import flops as F
    step_flops = F.train_step_flops(cfg, batch, LABEL_LEN, mode=mode,
                                    encoder_adapted=(lora_targets == "all"))
    step_mfu = F.mfu(step_flops, dt / steps, chip="v5e", n_chips=n_chips)

    return {
        "metric": f"utterances/sec/chip ({model} {mode_desc}, bs={batch}, "
                  f"labels={LABEL_LEN}, on-device log-mel)",
        "value": round(utt_per_sec_per_chip, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec_per_chip / A100_BASELINE_UTT_PER_SEC, 3),
        # vs_baseline is a ratio against an ESTIMATE, not a measurement —
        # the reference publishes no numbers (SURVEY.md §6, BASELINE.md)
        "baseline": BASELINE_NOTE,
        "mfu": round(step_mfu, 4),
        "model_tflops_per_step": round(step_flops / 1e12, 2),
    }


def measure_decode(batch: int, beams: int, kv_int8: bool = False,
                   w_int8: bool = False, max_length: int = 225,
                   model: str = "large-v3", runs: int = 2,
                   _cache={}):
    """WER-eval decode throughput (BASELINE.json config #5; reference hot
    eval loop evaluate_peft.py:370-430: per-batch generate + autocast)."""
    from asr_finetune_tpu.evaluation import decode as D
    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import get_config

    cfg = get_config(model)
    if model not in _cache:
        _cache[model] = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            W.init_params(jax.random.PRNGKey(0), cfg))
    params = _cache[model]
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32))
    forced = [cfg.sot_token_id, cfg.sot_token_id + 3,
              cfg.transcribe_token_id, cfg.no_timestamps_token_id]
    fn = D.make_decode_fn(cfg, forced, max_length, beams,
                          kv_int8=kv_int8, w_int8=w_int8)
    tokens, _ = fn(params, mel)
    _ = np.asarray(tokens)  # compile + full sync
    times = []
    for _i in range(runs):
        t0 = time.perf_counter()
        tokens, _ = fn(params, mel)
        _ = np.asarray(tokens)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    flags = (", kv_int8" if kv_int8 else "") + (", w_int8" if w_int8 else "")
    return {
        "metric": f"decode ({model}, beams={beams}, bs={batch}, "
                  f"max_len={max_length}{flags})",
        "value": round(batch / dt, 3),
        "unit": "utt/s/chip",
        "seconds_per_batch": round(dt, 3),
        "ms_per_token": round(dt / max_length * 1000, 3),
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


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# Wall-clock guard for the matrix: axon remote compiles cost minutes per
# decode config; if the driver's bench window closes mid-matrix nothing
# would be recorded at all. Entries are measured in priority order, each
# is fault-isolated (an OOM records an "error" row instead of sinking the
# whole bench), and once the budget is spent the rest are skipped with a
# note — the final JSON line always appears.
#
# The default budget MUST exceed the sum of the matrix est_s values plus
# headline time (currently ~700 headline + 300 + 300 + 700 + 1200 + 700 +
# 2x600 = 5100s) or trailing entries are silently skipped every round and
# round-over-round BENCH comparability breaks (round-4 advisor finding).
# Headroom on top of that absorbs axon remote-compile variance: the beam
# bs16 row measured ~1300s cold (compile-dominated) in round 5.
# Override with BENCH_BUDGET_S for a quick headline-only run
# (BENCH_MATRIX=0 skips the matrix entirely).
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "7200"))
_T_START = time.monotonic()


def _measure_into(matrix, key, label, fn, est_s=600.0):
    left = BUDGET_S - (time.monotonic() - _T_START)
    if left < est_s:
        _log(f"skipping {label}: {left:.0f}s budget left < est {est_s:.0f}s")
        matrix[key] = {"skipped": f"budget ({left:.0f}s left)"}
        return None
    _log(f"measuring {label}...")
    try:
        matrix[key] = fn()
        return matrix[key]
    except Exception as e:  # fault-isolate: e.g. an OOM on one decode shape
        _log(f"{label} FAILED: {type(e).__name__}")
        matrix[key] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        return None


def main():
    _init_backend_or_die()
    _log("measuring headline (peft parity)...")
    headline = measure_train(MODE, LORA_TARGETS, MODEL)
    result = dict(headline)
    matrix = {}
    if MODE == "peft" and LORA_TARGETS == "all":
        matrix["peft_parity"] = headline
        if os.environ.get("BENCH_SECONDARY", "1") != "0":
            # the decoder-only placement is the round-2 configuration; keep
            # it visible next to the reference-parity headline
            sec = _measure_into(matrix, "peft_decoder",
                                "peft decoder-only secondary",
                                lambda: measure_train("peft", "decoder",
                                                      MODEL), est_s=300)
            if sec:
                result["secondary"] = sec
    if MATRIX and MODE == "peft":
        # BASELINE.json config #2: whisper-small full FT + SpecAugment
        _measure_into(matrix, "full_ft",
                      "full fine-tune (small + SpecAugment)",
                      lambda: measure_train("full", "all", "small"),
                      est_s=300)
        # config #5: batched eval decode (reference hot eval loop,
        # evaluate_peft.py:370-430). Beam rows first (round-4 verdict #4:
        # beam at bs 8/16 and beam+int8 through the ancestry path), then
        # the greedy rows that bound them (full greedy sweep recorded in
        # BENCH_r04; bs32 + bs16_int8 kept for round-over-round trend).
        beam = {}
        matrix["decode_beam"] = beam
        _measure_into(beam, "bs8", "beam-4 decode bs=8",
                      lambda: measure_decode(8, 4), est_s=700)
        _measure_into(beam, "bs16", "beam-4 decode bs=16",
                      lambda: measure_decode(16, 4), est_s=1200)
        _measure_into(beam, "bs8_int8", "beam-4 decode bs=8 kv+w int8",
                      lambda: measure_decode(8, 4, kv_int8=True,
                                             w_int8=True), est_s=700)
        greedy = {}
        matrix["decode_greedy"] = greedy
        _measure_into(greedy, "bs32", "greedy decode bs=32",
                      lambda: measure_decode(32, 1), est_s=600)
        _measure_into(greedy, "bs16_int8", "greedy decode bs=16 int8",
                      lambda: measure_decode(16, 1, kv_int8=True,
                                             w_int8=True), est_s=600)
        result["matrix"] = matrix

    print(emit_record(result, matrix))


def emit_record(result: dict, matrix: dict) -> str:
    """Write the full record to bench_matrix.json; return the compact
    final stdout line.

    Output protocol (round-4 verdict #2: BENCH_r04's single fat JSON
    line outgrew the driver's tail capture and parsed as null). The
    FULL record goes to bench_matrix.json next to this script; stdout's
    LAST line is a compact (<900 B, typically <500 B) headline the driver
    can always capture: headline value/MFU plus one number per matrix
    entry."""
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_matrix.json")
    try:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        _log(f"full record -> {out_path}")
    except OSError as e:
        _log(f"could not write {out_path}: {e}")

    def _val(row):
        if not isinstance(row, dict):
            return None
        if row.get("value") is not None:
            return row["value"]
        return next((k for k in ("skipped", "error") if k in row), None)

    compact = {
        "metric": result["metric"],
        "value": result["value"], "unit": result["unit"],
        "vs_baseline": result["vs_baseline"], "mfu": result.get("mfu"),
        "baseline": "estimated (see BASELINE.md)",
        "matrix_file": "bench_matrix.json",
    }
    summary = {}
    for key, row in matrix.items():
        if key in ("decode_greedy", "decode_beam"):
            for sub, srow in row.items():
                summary[f"{key.split('_')[1]}_{sub}"] = _val(srow)
        elif key != "peft_parity":
            summary[key] = _val(row)
    if summary:
        compact["summary"] = summary
    line = json.dumps(compact)
    if len(line) > 900:  # hard cap well under the driver's tail capture
        compact.pop("summary", None)
        line = json.dumps(compact)
    return line


if __name__ == "__main__":
    main()
