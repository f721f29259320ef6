"""HPO: space sampling, ASHA decisions, TPE convergence, PBT policy,
and a miniature end-to-end experiment with resume."""
import json
import os
import types

import numpy as np
import pytest

from asr_finetune_tpu.hpo.schedulers import (AshaScheduler, PbtScheduler,
                                             calculate_grace_period)
from asr_finetune_tpu.hpo.search import RandomSearch, TPESearch
from asr_finetune_tpu.hpo.space import (Choice, LogUniform, RandInt,
                                        get_whisper_hyperparameters,
                                        sample_config)


def _args(**kw):
    base = dict(hyperparameters=None, warmup_steps=0, max_warmup_steps=10,
                peft=False)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_space_defaults_match_reference():
    space = get_whisper_hyperparameters(_args(peft=True))
    assert isinstance(space["learning_rate"], LogUniform)
    assert space["learning_rate"].low == 5e-6
    assert space["learning_rate"].high == 1e-4
    assert isinstance(space["per_device_train_batch_size"], Choice)
    assert list(space["per_device_train_batch_size"].values) == [1, 2, 4, 8]
    assert isinstance(space["rank"], RandInt)
    assert (space["rank"].low, space["rank"].high) == (1, 17)
    assert (space["alpha"].low, space["alpha"].high) == (2, 6)

    rng = np.random.default_rng(0)
    for _ in range(50):
        cfg = sample_config(space, rng)
        assert 5e-6 <= cfg["learning_rate"] <= 1e-4
        assert 1 <= cfg["rank"] <= 16


def test_space_respects_requested_subset():
    space = get_whisper_hyperparameters(
        _args(hyperparameters=[["learning_rate", "weight_decay"]]))
    assert set(space) == {"learning_rate", "weight_decay"}


def test_asha_stops_bad_trials():
    asha = AshaScheduler(metric="loss", mode="min", max_t=100,
                         grace_period=2, reduction_factor=2)
    # good trial reaches rung 2 first
    assert asha.on_result("good", 2, {"loss": 1.0})
    # bad trial at same rung with much worse loss gets cut
    assert not asha.on_result("bad", 2, {"loss": 10.0})
    # before the grace period nothing is cut
    assert asha.on_result("worse", 1, {"loss": 100.0})


def test_asha_state_roundtrip():
    a = AshaScheduler(metric="m", mode="min", max_t=100, grace_period=1)
    a.on_result("t1", 1, {"m": 1.0})
    b = AshaScheduler(metric="m", mode="min", max_t=100, grace_period=1)
    b.load_state_dict(json.loads(json.dumps(a.state_dict())))
    assert b._rungs == a._rungs


def test_tpe_beats_random_on_quadratic():
    space = {"x": LogUniform(1e-3, 1e3)}
    tpe = TPESearch(space, seed=0, n_startup=5)
    best = float("inf")
    for _ in range(40):
        hp = tpe.suggest()
        loss = (np.log10(hp["x"]) - 1.0) ** 2  # optimum at x=10
        tpe.observe(hp, loss)
        best = min(best, loss)
    assert best < 0.05, best
    # later suggestions concentrate near the optimum
    later = [tpe.suggest() for _ in range(10)]
    med = np.median([abs(np.log10(h["x"]) - 1.0) for h in later])
    assert med < 1.0, med


def test_pbt_exploit_explore():
    pbt = PbtScheduler(metric="m", mode="min", quantile_fraction=0.5)
    rng = np.random.default_rng(0)
    pop = [
        {"trial_id": "a", "metric": 1.0, "hp": {"learning_rate": 1e-4}},
        {"trial_id": "b", "metric": 9.0, "hp": {"learning_rate": 1e-6}},
    ]
    dec = pbt.exploit_explore(rng, pop)
    by_id = {d["trial_id"]: d for d in dec}
    assert by_id["a"]["clone_from"] is None
    assert by_id["b"]["clone_from"] == "a"
    assert by_id["b"]["hp"]["learning_rate"] in (1e-4 * 0.8, 1e-4 * 1.25)


def test_grace_period_heuristic():
    assert calculate_grace_period(100, 8, debug=True) == 1
    assert calculate_grace_period(100000, 8) == 5000  # pinned, ref :42
    assert calculate_grace_period(80, 8) == 10


def test_experiment_e2e(tmp_path):
    from asr_finetune_tpu import config as config_lib
    from asr_finetune_tpu.data.hdf5 import make_synthetic_dataset
    from asr_finetune_tpu.hpo import controller

    make_synthetic_dataset(str(tmp_path / "d.h5"), n=48, seed=0,
                           min_sec=0.5, max_sec=1.0)
    args = config_lib.parse_args([
        "--model_type", "test-nano",
        "--dataset_name", str(tmp_path / "d.h5"),
        "--output_dir", str(tmp_path / "out"),
        "--storage_path", str(tmp_path / "scratch"),
        "--output_tag", "exp",
        "--num_samples", "2",
        "--max_steps", "4", "--eval_steps", "2", "--save_steps", "2",
        "--logging_steps", "2",
        "--per_device_train_batch_size", "1",
        "--per_device_eval_batch_size", "2",
        "--val_split", "0.2",
        "--generation_max_length", "16",
        "--hyperparameters", "learning_rate",
        "--search_schedule_mode", "small_small",
        "--grace_period", "2",
        "--skip_wer_eval",
        "--random_seed", "0",
    ])
    summary = controller.run_experiment(args)
    assert summary["best_trial"] is not None
    exp_dir = tmp_path / "scratch" / "exp"
    assert (exp_dir / "experiment_state.json").exists()
    assert (exp_dir / "best_result.json").exists()
    st = json.loads((exp_dir / "experiment_state.json").read_text())
    assert sum(1 for t in st["trials"].values()
               if t["status"] == "completed") == 2

    # resume skips completed trials (fast)
    args.resume_training = True
    summary2 = controller.run_experiment(args)
    assert summary2["best_trial"] == summary["best_trial"]
