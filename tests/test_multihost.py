"""REAL multi-process distributed training test.

Two jax.distributed processes (4 virtual CPU devices each) form one
8-device global mesh and run a DP train step through the framework's
per-process data sharding + make_global_batch feed — the mechanism that
replaces the reference's Ray multi-node NCCL path (SURVEY.md §2.4).
Both ranks must compute the identical global loss.
"""
import pathlib
import re
import subprocess
import sys

from asr_finetune_tpu.data.hdf5 import make_synthetic_dataset


def test_two_process_distributed_train_step(tmp_path):
    h5 = tmp_path / "mh.h5"
    make_synthetic_dataset(str(h5), n=32, seed=0, min_sec=0.5, max_sec=1.0)
    worker = pathlib.Path(__file__).parent / "_multihost_worker.py"
    coord = "127.0.0.1:19877"

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(r), "2", coord, str(h5)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    losses = []
    for r, out in enumerate(outs):
        m = re.search(rf"RANK{r}_LOSS=([0-9.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1], losses
