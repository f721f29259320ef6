"""Re-measure the decode_beam bs8 rows after the shared cross-KV change.

The committed bench_matrix.json beam rows were measured with cross K/V
replicated per beam row (jnp.repeat(enc_out, K)); beam_decode now keeps
cross K/V at B rows and streams each chunk once per K-hypothesis group
(ops/decoder_fused.fused_attn kv_group). Cross-KV is the dominant decode
HBM read (L*B*K*S*d*2 tensors * 2 B/elem ~= 7.9 GB/step at large-v3
bs8/beam4 before sharing), so the rows must be refreshed to describe the
code that is actually committed.

Usage: python benchmarks/refresh_beam_rows.py [bs8] [bs8_int8]
(no args = both rows; merges into bench_matrix.json like retry_beam_bs16)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


ROWS = {
    "bs8": dict(batch=8, beams=4),
    "bs8_int8": dict(batch=8, beams=4, kv_int8=True, w_int8=True),
}


def main():
    names = sys.argv[1:] or list(ROWS)
    bench._init_backend_or_die()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "bench_matrix.json")
    for name in names:
        row = bench.measure_decode(**ROWS[name])
        print(name, json.dumps(row), flush=True)
        with open(path) as f:
            record = json.load(f)
        record["matrix"]["decode_beam"][name] = row
        with open(path, "w") as f:
            json.dump(record, f, indent=1)
    print("merged into bench_matrix.json", flush=True)


if __name__ == "__main__":
    main()
