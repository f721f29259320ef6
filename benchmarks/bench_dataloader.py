"""Dataloader throughput benchmark: samples/sec over a worker×prefetch grid.

Capability parity with the reference's
finetune/benchmark_dataloaders/benchmark_simple_loader.py (grid
cpus∈{2,4,8,16,24} × prefetch∈{1,4,8}, 100-batch windows, samples/sec to
logs :239-259) — here over the host pipeline (HDF5 reader → collator →
prefetch queue), with both the on-device-feature path ("audio": raw pad
only) and the reference-equivalent host log-mel path ("host").

Usage:
  python benchmarks/bench_dataloader.py --dataset <h5> \
      [--batches 100] [--batch_size 8] [--features audio,host] \
      [--prefetch 1,4,8]
Prints one JSON line per grid cell.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asr_finetune_tpu.data.collator import Collator, CollatorConfig
from asr_finetune_tpu.data.hdf5 import Hdf5AudioReader, make_synthetic_dataset
from asr_finetune_tpu.data.pipeline import DataPipeline, IndexSampler, device_prefetch
from asr_finetune_tpu.models.tokenizer import ByteFallbackTokenizer


def run_cell(h5_path: str, features: str, prefetch: int, batch_size: int,
             batches: int) -> dict:
    reader = Hdf5AudioReader(h5_path)
    tok = ByteFallbackTokenizer()
    col = Collator(tok, CollatorConfig(features=features))
    sampler = IndexSampler(len(reader), batch_size, seed=0)
    pipe = DataPipeline(reader, col, sampler, telemetry_every=0)
    it = device_prefetch(pipe.iter_from_step(0), sharding=None, size=prefetch)

    next(it)  # warm up file handles + first batch
    t0 = time.perf_counter()
    n = 0
    for _ in range(batches):
        b = next(it)
        n += b["labels"].shape[0]
    dt = time.perf_counter() - t0
    it.close()  # stop the prefetch thread before the next cell / exit
    return {"features": features, "prefetch": prefetch,
            "batch_size": batch_size, "batches": batches,
            "samples_per_sec": round(n / dt, 2)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="")
    p.add_argument("--batches", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--features", default="audio,host")
    p.add_argument("--prefetch", default="1,4,8")
    a = p.parse_args(argv)

    h5 = a.dataset
    if not h5:
        h5 = "/tmp/bench_loader.h5"
        if not os.path.exists(h5):
            make_synthetic_dataset(h5, n=256, seed=0, min_sec=2.0, max_sec=10.0)

    results = []
    for features in a.features.split(","):
        for prefetch in (int(x) for x in a.prefetch.split(",")):
            r = run_cell(h5, features, prefetch, a.batch_size, a.batches)
            results.append(r)
            print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
