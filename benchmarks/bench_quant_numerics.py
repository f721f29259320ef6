"""W8A8 numerics sweep: int8-matmul error vs outlier magnitude and
decomposition width.

The reference's load_in_8bit path is bitsandbytes LLM.int8()
(whisper_models.py:42,69): vector-wise int8 matmuls PLUS fp16 outlier
columns above |amax| 6.0. Our `--int8_matmul` implements the vector-wise
part; `--int8_outlier_cols k` adds the jit-friendly fixed-k form of the
outlier decomposition (ops/quant.py). This benchmark records the relative
error of both against the dequantized-bf16 reference matmul across
synthetic activation distributions — inlier-only through heavily
outlier-laden — so the accuracy claim for the bnb-parity config is a
measured number, not an assertion.

Runs on CPU (JAX_PLATFORMS=cpu; no TPU needed). Usage:
  python benchmarks/bench_quant_numerics.py [--d_in 1280] [--d_out 1280]
Prints one JSON line per (outlier_scale, k) grid cell.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from asr_finetune_tpu.ops import quant


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d_in", type=int, default=1280)
    ap.add_argument("--d_out", type=int, default=1280)
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--n_outlier_feats", type=int, default=6)
    ap.add_argument("--outlier_scales", type=str, default="1,10,30,60")
    ap.add_argument("--ks", type=str, default="0,4,8,16")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    w = jnp.asarray(
        (rng.standard_normal((args.d_in, args.d_out)) * 0.05).astype(np.float32))
    q = quant.quantize_weight(w)
    w_deq = quant.dequantize_weight(q, jnp.float32)
    feats = rng.choice(args.d_in, size=args.n_outlier_feats, replace=False)

    for s in [float(v) for v in args.outlier_scales.split(",")]:
        x = rng.standard_normal((args.rows, args.d_in)).astype(np.float32)
        x[:, feats] *= s  # emergent outlier features (LLM.int8() §3)
        x = jnp.asarray(x)
        ref = x @ w_deq
        for k in [int(v) for v in args.ks.split(",")]:
            try:
                quant.set_int8_outlier_cols(k)
                out = quant.int8_matmul(x, q["w_q8"], q["w_scale"])
            finally:
                quant.set_int8_outlier_cols(0)
            rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
            print(json.dumps({
                "outlier_scale": s, "outlier_feats": args.n_outlier_feats,
                "k": k, "rel_err_vs_dequant": round(rel, 6)}))


if __name__ == "__main__":
    main()
