"""Retry the decode_beam bs16 matrix row and merge it into bench_matrix.json.

The full-matrix run recorded an `error` row for beams=4 bs=16 when the
axon remote-compile helper returned HTTP 500 (transient tunnel failure,
not a model/compile defect — bs=8 and bs=8 int8 compiled and measured
fine minutes earlier). This re-measures just that row so the committed
matrix has all three beam entries (VERDICT round-4 item #4).

Usage: python benchmarks/retry_beam_bs16.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    bench._init_backend_or_die()
    row = bench.measure_decode(16, 4)
    print(json.dumps(row), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "bench_matrix.json")
    with open(path) as f:
        record = json.load(f)
    record["matrix"]["decode_beam"]["bs16"] = row
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print("merged into bench_matrix.json", flush=True)


if __name__ == "__main__":
    main()
