"""Single-config training entry point.

`python -m asr_finetune_tpu.cli.train -c configs/xxx.config [flags]`

The reference's `train_single_model.py` analogue (re-train one specific
configuration), without its bit-rot (missing `utils_new` import at :44,
hardcoded trial id at :199). To re-run a previous HPO trial's best config,
pass --from_best <experiment storage dir>: the hp overrides are read from
best_result.json (the params.json re-read in the reference,
train_single_model.py:171-199).
"""
from __future__ import annotations

import json
import os
import sys

from .. import config as config_lib
from .. import run as run_lib


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    hp = {}
    if "--from_best" in argv:
        i = argv.index("--from_best")
        exp_dir = argv[i + 1]
        del argv[i : i + 2]
        with open(os.path.join(exp_dir, "best_result.json")) as f:
            best = json.load(f)
        hp = best.get("hp") or {}
        print(f"re-training best trial {best.get('best_trial')} hp={hp}")
    args = config_lib.parse_args(argv)
    result = run_lib.run_trial(args, hp=hp)
    print(json.dumps(result, default=str))
    return result


if __name__ == "__main__":
    main()
