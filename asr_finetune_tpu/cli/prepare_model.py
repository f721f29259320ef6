"""Prepare a model directory for air-gapped training.

`python -m asr_finetune_tpu.cli.prepare_model --hf_dir <hf checkpoint dir>
    --output <native dir> [--verify]`

The reference's download_HF_model.py analogue for zero-egress clusters:
instead of fetching from the hub, this converts an already-downloaded HF
Whisper checkpoint directory (config.json + safetensors/bin + vocab files)
into the framework's native format (models/native_io.py) and copies the
tokenizer vocab alongside. `--verify` re-loads and checks leaf counts and a
forward-pass finite check.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np

from ..models import whisper as W
from ..models.convert_hf import load_pretrained
from ..models.native_io import load_params, save_params
from ..utils.logging_utils import setup_logging

VOCAB_FILES = ("vocab.json", "merges.txt", "tokenizer.json", "normalizer.json",
               "added_tokens.json", "special_tokens_map.json")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--hf_dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--verify", action="store_true")
    a = p.parse_args(argv)
    setup_logging()

    params, cfg = load_pretrained(a.hf_dir)
    save_params(a.output, params, cfg)
    copied = []
    for name in VOCAB_FILES:
        src = os.path.join(a.hf_dir, name)
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(a.output, name))
            copied.append(name)

    if a.verify:
        import jax
        import jax.numpy as jnp
        params2, cfg2 = load_params(a.output)
        n1 = len(jax.tree.leaves(params))
        n2 = len(jax.tree.leaves(params2))
        assert n1 == n2, (n1, n2)
        mel = jnp.zeros((1, 100, cfg2.num_mel_bins))
        toks = jnp.zeros((1, 4), jnp.int32)
        logits = W.forward(params2, mel, toks, cfg2, compute_dtype=jnp.float32)
        assert bool(jnp.isfinite(logits).all())
        print("verify OK")

    print(json.dumps({"output": a.output,
                      "leaves": len(np.load(
                          os.path.join(a.output, "params.npz")).files),
                      "vocab_files": copied}))


if __name__ == "__main__":
    main()
