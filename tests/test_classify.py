"""Error-type classification: alignment, rule-based scoring, CSV pipeline."""
import csv
import json

from asr_finetune_tpu.classify.error_types import (
    DEFAULT_ERROR_TYPES, RuleBasedClassifier, _align, aggregate_error_profile,
    classify_eval_results)


def test_alignment_ops():
    ops = _align("der hund läuft".split(), "der hunt läuft schnell".split())
    kinds = [o[0] for o in ops]
    assert kinds.count("ok") == 2
    assert kinds.count("sub") == 1
    assert kinds.count("ins") == 1


def test_rule_classifier_detects_types():
    clf = RuleBasedClassifier()
    s = clf.classify("der hund läuft", "der hunt läuft")
    assert s["substitution_phonetic"]["N"] == 1  # hund→hunt sounds alike
    s2 = clf.classify("der hund läuft", "der läuft")
    assert s2["deletion"]["N"] == 1
    s3 = clf.classify("es war 1944 im krieg", "es war 1934 im krieg")
    assert s3["number"]["N"] == 1
    # perfect match → all zero
    s4 = clf.classify("alles gut", "alles gut")
    assert all(v["N"] == 0 for v in s4.values())


def test_classify_pipeline_csv(tmp_path):
    eval_json = tmp_path / "eval_final.json"
    eval_json.write_text(json.dumps({"results": [
        {"original": "der hund läuft", "predicted": "der hunt läuft", "wer": 33.3},
        {"original": "heute ist montag", "predicted": "heute ist montag", "wer": 0.0},
    ]}))
    out_csv = tmp_path / "errors.csv"
    rows = classify_eval_results(str(eval_json), str(out_csv), save_every=1)
    assert len(rows) == 2 * len(DEFAULT_ERROR_TYPES)
    with open(out_csv) as f:
        saved = list(csv.DictReader(f))
    assert len(saved) == len(rows)

    profile = aggregate_error_profile(str(out_csv))
    assert profile["substitution_phonetic"]["total_N"] >= 1

    # resume: rerun is a no-op (same row count)
    rows2 = classify_eval_results(str(eval_json), str(out_csv), save_every=1)
    assert len(rows2) == len(rows)
