"""Error-type classification: alignment, rule-based scoring, CSV pipeline."""
import csv
import json

import pytest

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


@pytest.mark.slow  # multi-minute on CPU (tests/README.md timings)
def test_llm_classifier_hf_pipeline_end_to_end(tmp_path):
    """VERDICT r2 task 10: drive the HF-pipeline LLMClassifier (the primary
    analysis mode, reference classify_errors_hf.py:60-140) end-to-end with
    a tiny local causal LM — prompt -> generate -> JSON parse -> CSV. A
    random model emits no valid JSON, so every row takes the documented
    'unparsbar' fallback; what this test pins is that the pipeline path
    itself is alive (model+tokenizer load, generation, schema, CSV)."""
    pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    tokenizers = pytest.importorskip("tokenizers")
    import json as json_lib

    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import GPT2Config, GPT2LMHeadModel, PreTrainedTokenizerFast

    model_dir = tmp_path / "tiny_lm"
    model_dir.mkdir()

    # byte-ish vocab: printable chars as word-level tokens
    vocab = {"[UNK]": 0, "[PAD]": 1, "<|end|>": 2}
    for ch in (chr(i) for i in range(32, 127)):
        vocab.setdefault(ch, len(vocab))
    for ch in "äöüÄÖÜß":
        vocab.setdefault(ch, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="[UNK]",
                                   pad_token="[PAD]", eos_token="<|end|>")
    fast.save_pretrained(str(model_dir))

    import torch
    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=len(vocab), n_positions=512, n_embd=32,
                     n_layer=1, n_head=2, eos_token_id=2, pad_token_id=1)
    GPT2LMHeadModel(cfg).save_pretrained(str(model_dir))

    from asr_finetune_tpu.classify.error_types import (
        DEFAULT_ERROR_TYPES, LLMClassifier, classify_eval_results)

    clf = LLMClassifier(str(model_dir), max_new_tokens=8)
    out = clf.classify("das ist ein test", "das ist kein test",
                       DEFAULT_ERROR_TYPES[:2])
    assert set(out) == {t.name for t in DEFAULT_ERROR_TYPES[:2]}
    for s in out.values():
        assert {"p", "N", "warum"} <= set(s)

    # full classify->CSV path with the LLM backend
    eval_json = tmp_path / "eval_final.json"
    eval_json.write_text(json_lib.dumps({"results": [
        {"original": "hallo welt", "predicted": "hallo wald"}]}))
    out_csv = tmp_path / "errors.csv"
    rows = classify_eval_results(str(eval_json), str(out_csv),
                                 model_path=str(model_dir),
                                 error_types=DEFAULT_ERROR_TYPES[:2])
    assert len(rows) == 2
    assert out_csv.exists()

    # quantized local-judge path: int8 dynamic quantization of the judge's
    # Linear layers on CPU — the hardware-agnostic stand-in for the
    # reference's MLX 4-bit laptop variant (classify_errors_hf_mlx_04.py)
    qclf = LLMClassifier(str(model_dir), max_new_tokens=8, quantize=True)
    qout = qclf.classify("das ist ein test", "das ist kein test",
                         DEFAULT_ERROR_TYPES[:1])
    assert {"p", "N", "warum"} <= set(next(iter(qout.values())))
