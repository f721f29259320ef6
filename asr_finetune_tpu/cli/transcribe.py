"""Batch transcription entry point: audio files / HDF5 → transcripts.

`python -m asr_finetune_tpu.cli.transcribe --model_path <ckpt dir>
    --inputs a.wav b.wav dir_of_wavs/ data.h5 [--output out.jsonl]`

Not present in the reference as a standalone tool (its decode paths are all
evaluation-bound); provided here so the framework covers plain inference,
using the same jitted batched greedy/beam decode as evaluation.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import jax.numpy as jnp
import numpy as np

from .. import config as config_lib
from .. import run as run_lib
from ..data.audiofolder import read_wav
from ..data.hdf5 import Hdf5AudioReader
from ..evaluation import decode as decode_lib
from ..ops import logmel
from ..utils.logging_utils import setup_logging


def _gather_inputs(paths):
    items = []  # (name, loader)
    for p in paths:
        if os.path.isdir(p):
            for w in sorted(glob.glob(os.path.join(p, "*.wav"))):
                items.append(("wav", w))
        elif p.endswith(".h5") or p.endswith(".hdf5"):
            items.append(("h5", p))
        else:
            items.append(("wav", p))
    return items


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--inputs", nargs="+", required=True)
    extra.add_argument("--output", default="")
    ens, rest = extra.parse_known_args(argv)
    args = config_lib.parse_args(rest)
    setup_logging()

    built = run_lib.build_model(args)
    forced = built.tokenizer.prefix_tokens(
        args.target_language, args.task,
        predict_timestamps=args.return_timestamps)
    decode = decode_lib.make_decode_fn(
        built.cfg, forced, args.generation_max_length,
        args.generation_num_beams,
        jnp.bfloat16 if args.bf16 else jnp.float32,
        suppress_tokens=built.suppress_tokens,
        begin_suppress_tokens=built.begin_suppress_tokens,
        kv_int8=getattr(args, "decode_kv_int8", False),
        w_int8=getattr(args, "decode_w_int8", False))

    B = args.per_device_eval_batch_size
    results = []

    def flush(names, audios):
        if not names:
            return
        # pad the batch to size B so one compiled shape serves all batches
        while len(audios) < B:
            audios.append(np.zeros(logmel.CHUNK_SAMPLES, np.float32))
        batch = np.stack([logmel.pad_or_trim(a) for a in audios])
        mel = logmel.log_mel_spectrogram(jnp.asarray(batch),
                                         n_mels=built.cfg.num_mel_bins)
        tokens, _ = decode(built.params, mel, built.adapters)
        texts = built.tokenizer.batch_decode(np.asarray(tokens))
        for name, text in zip(names, texts):
            results.append({"file": name, "text": text})
            print(f"{name}\t{text}")
        names.clear()
        audios.clear()

    names, audios = [], []
    for kind, path in _gather_inputs(ens.inputs):
        if kind == "wav":
            names.append(path)
            audios.append(read_wav(path))
            if len(names) == B:
                flush(names, audios)
        else:
            flush(names, audios)  # keep output order: pending wavs first
            reader = Hdf5AudioReader(path)
            for i in range(0, len(reader), B):
                rows = reader.read(range(i, min(i + B, len(reader))))
                flush([f"{path}#{r[0]}" for r in rows], [r[1] for r in rows])
    flush(names, audios)

    if ens.output:
        with open(ens.output, "w") as f:
            for r in results:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return results


if __name__ == "__main__":
    main()
