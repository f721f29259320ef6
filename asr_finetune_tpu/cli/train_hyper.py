"""HPO experiment entry point.

`python -m asr_finetune_tpu.cli.train_hyper -c configs/xxx.config [flags]`

The reference's primary entry `finetune/training/train_hyper.py` analogue:
parses config, runs the HPO controller (searcher + scheduler + trials),
saves the best-trial summary; `--resume_training` restores unfinished
experiments (Tuner.restore semantics, train_hyper.py:349-353).
Multi-host: set COORDINATOR_ADDRESS (or the reference's `ip_head` env) and
run one process per host.
"""
from __future__ import annotations

import json

from .. import config as config_lib
from ..hpo import controller
from ..parallel.mesh import initialize_distributed


def main(argv=None):
    args = config_lib.parse_args(argv)
    if not args.run_on_local_machine:
        initialize_distributed()
    summary = controller.run_experiment(args)
    print(json.dumps(summary, default=str))
    return summary


if __name__ == "__main__":
    main()
