"""CLI-level integration: offline evaluation (with resume) and
materialization through the entry points."""
import json
import os

import numpy as np
import pytest

from asr_finetune_tpu.data.hdf5 import make_synthetic_dataset


@pytest.fixture(scope="module")
def h5(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    make_synthetic_dataset(str(d / "test.h5"), n=8, seed=3,
                           min_sec=0.5, max_sec=1.0)
    return d


def test_cli_evaluate_and_resume(h5, tmp_path):
    from asr_finetune_tpu.cli import evaluate as cli_eval

    out = tmp_path / "eval"
    argv = [
        "--model_type", "test-nano",
        "--dataset_name", str(h5 / "test.h5"),
        "--per_device_eval_batch_size", "4",
        "--generation_max_length", "12",
        "--eval_output_dir", str(out),
        "--target_language", "german",
    ]
    final = cli_eval.main(argv)
    assert final["n_utterances"] == 8
    assert os.path.exists(out / "eval_final.json")
    data = json.loads((out / "eval_final.json").read_text())
    assert len(data["results"]) == 8
    assert {"original", "predicted", "wer"} <= set(data["results"][0])

    # resume: progress checkpoint says everything done → instant, same count
    final2 = cli_eval.main(argv)
    assert final2["n_utterances"] == 8


def test_eval_resume_mid_stream(h5, tmp_path):
    """Kill-and-resume semantics: second run skips completed batches."""
    import jax.numpy as jnp

    from asr_finetune_tpu import config as config_lib
    from asr_finetune_tpu import run as run_lib
    from asr_finetune_tpu.data.collator import Collator, CollatorConfig
    from asr_finetune_tpu.data.hdf5 import Hdf5AudioReader
    from asr_finetune_tpu.evaluation.evaluate import EvalConfig, OfflineEvaluator

    args = config_lib.parse_args([
        "--model_type", "test-nano",
        "--dataset_name", str(h5 / "test.h5")])
    built = run_lib.build_model(args)
    reader = Hdf5AudioReader(str(h5 / "test.h5"))
    col = Collator(built.tokenizer, CollatorConfig(features="audio"))

    def batches():
        for i in range(0, 8, 2):
            yield col(reader.read([i, i + 1]))

    cfg = EvalConfig(max_length=12, batch_size=2, checkpoint_every=1,
                     output_dir=str(tmp_path / "ev"),
                     compute_dtype=jnp.float32)
    ev = OfflineEvaluator(built.cfg, built.params, built.tokenizer, cfg)

    # simulate a crash after 2 batches
    it = batches()
    two = [next(it), next(it)]
    ev.run(two)  # writes checkpoint with current_count=2 + final for 4 utts
    # wipe final, keep progress → rerun full stream resumes at batch 2
    ckpt = json.loads((tmp_path / "ev" / "eval_checkpoint.json").read_text())
    assert ckpt["current_count"] == 2

    ev2 = OfflineEvaluator(built.cfg, built.params, built.tokenizer, cfg)
    final = ev2.run(batches())
    assert final["n_utterances"] == 8  # 4 from before + 4 new, no dupes


def test_cli_materialize(h5, tmp_path):
    from asr_finetune_tpu.cli import materialize as cli_mat

    out = tmp_path / "pq"
    cli_mat.main([
        "--dataset_name", str(h5 / "test.h5"),
        "--materialize_output", str(out),
        "--n_mels", "80", "--shard_size", "4",
    ])
    files = sorted(os.listdir(out))
    assert len(files) == 2
    from asr_finetune_tpu.data.parquet import ParquetFeatureReader
    assert len(ParquetFeatureReader(str(out))) == 8
