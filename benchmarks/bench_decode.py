"""Decode throughput benchmark: greedy/beam tokens/sec on the local backend.

The eval hot loop (reference SURVEY.md §3.2/§3.3: per-batch HF generate
under autocast). Prints one JSON line per configuration.

Usage:
  python benchmarks/bench_decode.py [--model large-v3] [--batch 8]
      [--max_length 225] [--beams 1] [--runs 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="large-v3")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max_length", type=int, default=225)
    p.add_argument("--beams", type=int, default=1)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 cross-attention K/V (halves KV HBM traffic)")
    p.add_argument("--w_int8", action="store_true",
                   help="int8 decoder weights (halves weight HBM traffic)")
    p.add_argument("--fused", default=None,
                   help="1/0: force the fused Pallas decode path on/off")
    p.add_argument("--beam_reorder", action="store_true",
                   help="A/B: fused kernels but with the conventional "
                        "per-step full-cache beam reorder instead of the "
                        "ancestry-masked kernel (beams>1 only)")
    a = p.parse_args(argv)
    if a.beam_reorder:
        os.environ["ASR_TPU_BEAM_REORDER"] = "1"

    from asr_finetune_tpu.evaluation import decode as D
    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import get_config

    cfg = get_config(a.model)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          W.init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (a.batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32))
    sp_forced = [cfg.sot_token_id, cfg.sot_token_id + 3,
                 cfg.transcribe_token_id, cfg.no_timestamps_token_id]
    fused = None if a.fused is None else a.fused not in ("0", "false")
    fn = D.make_decode_fn(cfg, sp_forced, a.max_length, a.beams,
                          kv_int8=a.kv_int8, w_int8=a.w_int8, fused=fused)

    tokens, _ = fn(params, mel)
    _ = np.asarray(tokens)  # force full sync (compile + run)
    times = []
    for _ in range(a.runs):
        t0 = time.perf_counter()
        tokens, _ = fn(params, mel)
        _ = np.asarray(tokens)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(json.dumps({
        "metric": f"decode ({a.model}, greedy x{a.beams} beams, "
                  f"bs={a.batch}, max_len={a.max_length}"
                  f"{', kv_int8' if a.kv_int8 else ''}"
                  f"{', w_int8' if a.w_int8 else ''}"
                  f"{', cache-reorder' if a.beam_reorder else ''})",
        "seconds_per_batch": round(dt, 3),
        "utterances_per_sec": round(a.batch / dt, 3),
        "tokens_per_sec": round(a.batch * a.max_length / dt, 1),
    }))


if __name__ == "__main__":
    main()
