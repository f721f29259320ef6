"""WER math, normalization, and tokenizer round-trips."""
import numpy as np
import pytest

from asr_finetune_tpu.evaluation import wer as wer_lib
from asr_finetune_tpu.evaluation.normalize import normalize
from asr_finetune_tpu.models.tokenizer import (
    BPEWhisperTokenizer, ByteFallbackTokenizer, SpecialTokens, language_index)


def test_wer_known_values():
    # identical → 0
    assert wer_lib.wer(["der hund läuft"], ["der hund läuft"]) == 0.0
    # one substitution out of three words
    assert wer_lib.wer(["der hund läuft"], ["der hund rennt"]) == pytest.approx(1 / 3)
    # deletion + insertion
    assert wer_lib.wer(["a b c"], ["a c"]) == pytest.approx(1 / 3)
    assert wer_lib.wer(["a b"], ["a x b y"]) == pytest.approx(1.0)
    # corpus aggregation: errors summed over utterances / total ref words
    assert wer_lib.wer(["a b c", "d e"], ["a b c", "x e"]) == pytest.approx(1 / 5)
    assert wer_lib.wer_percent(["a b"], ["a c"]) == pytest.approx(50.0)


def test_wer_against_jiwer_if_available():
    jiwer = pytest.importorskip("jiwer")
    rng = np.random.default_rng(0)
    vocab = ["der", "die", "das", "hund", "katze", "läuft", "springt", "heute"]
    refs = [" ".join(rng.choice(vocab, rng.integers(1, 10))) for _ in range(20)]
    hyps = [" ".join(rng.choice(vocab, rng.integers(1, 10))) for _ in range(20)]
    assert wer_lib.wer(refs, hyps) == pytest.approx(jiwer.wer(refs, hyps))


def test_normalize_matches_reference_semantics():
    # reference finetune/training/utils.py:72-92: strip, lower, drop !?.,;
    assert normalize("  Hallo, Welt!  ") == "hallo welt"
    assert normalize("Wie geht's?") == "wie geht's"  # apostrophe kept
    assert normalize("a.b;c,d") == "abcd"


def test_byte_tokenizer_roundtrip_and_prefix():
    tok = ByteFallbackTokenizer()
    text = "hällo wörld"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    labels = tok.build_labels(text, language="de")
    sp = tok.special
    assert labels[0] == sp.sot
    assert labels[-1] == sp.eot
    assert labels[1] == sp.language_token("de")
    assert labels[2] == sp.transcribe
    # skip_special_tokens strips prefix + eot
    assert tok.decode(labels) == text


def test_special_token_layout_matches_whisper():
    sp = SpecialTokens()  # multilingual v2 layout
    assert sp.sot == 50258
    assert sp.language_token("en") == 50259
    assert sp.language_token("de") == 50261  # the id the reference hardcodes
                                             # in dead code (trainers.py:328-334)
    assert sp.transcribe == 50359
    sp3 = SpecialTokens.for_vocab(51866)  # large-v3 layout
    assert sp3.transcribe == 50360
    assert sp3.timestamp_begin == 50365


def test_forced_decoder_ids_format():
    tok = ByteFallbackTokenizer()
    fids = tok.forced_decoder_ids(language="de", task="transcribe")
    # HF format: [(1, lang), (2, task), (3, notimestamps)]
    assert [p for p, _ in fids] == [1, 2, 3]
    assert fids[1][1] == tok.special.transcribe


def test_bpe_tokenizer_with_synthetic_vocab():
    # miniature GPT2-style vocab exercising merges + byte mapping
    from asr_finetune_tpu.models.tokenizer import _bytes_to_unicode
    b2u = _bytes_to_unicode()
    base = [b2u[b] for b in range(256)]
    merged = ["he", "ll", "hell", "llo"]
    vocab = {t: i for i, t in enumerate(base + merged)}
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("ll", "o")]
    tok = BPEWhisperTokenizer(vocab, merges, SpecialTokens(
        eot=300, sot=301, first_language=302, n_languages=2,
        translate=304, transcribe=305, no_timestamps=306, timestamp_begin=307))
    ids = tok.encode("hello")
    assert tok.decode(ids) == "hello"
    # "hello" → hell + o  (merges applied by rank)
    assert ids == [vocab["hell"], vocab[b2u[ord("o")]]]


def test_special_layouts_by_vocab():
    """Three released special-token layouts resolve from the vocab size:
    51865 multilingual, 51866 large-v3 (+<|yue|>, ids shift by one),
    51864 English-only (.en, no language/task tokens)."""
    from asr_finetune_tpu.models.tokenizer import SpecialTokens
    ml = SpecialTokens.for_vocab(51865)
    assert (ml.sot, ml.no_timestamps, ml.timestamp_begin) == (50258, 50363, 50364)
    v3 = SpecialTokens.for_vocab(51866)
    assert (v3.transcribe, v3.no_timestamps, v3.timestamp_begin) == (50360, 50364, 50365)
    en = SpecialTokens.for_vocab(51864)
    assert (en.eot, en.sot, en.no_timestamps, en.timestamp_begin) == \
        (50256, 50257, 50362, 50363)
    assert en.n_languages == 0


def test_en_prefix_tokens_skip_language_and_task():
    """.en models force only [sot, <|notimestamps|>] (HF generation_config
    forced_decoder_ids [(1, 50362)])."""
    from asr_finetune_tpu.models.tokenizer import (ByteFallbackTokenizer,
                                                   SpecialTokens)
    tok = ByteFallbackTokenizer(special=SpecialTokens.for_vocab(51864))
    assert tok.prefix_tokens("en", "transcribe") == [50257, 50362]
    assert tok.prefix_tokens("en", "transcribe",
                             predict_timestamps=True) == [50257]


def test_model_registry_turbo_and_en_variants():
    from asr_finetune_tpu.models.configs import get_config
    turbo = get_config("openai/whisper-large-v3-turbo")
    assert turbo.decoder_layers == 4 and turbo.encoder_layers == 32
    assert turbo.vocab_size == 51866 and turbo.num_mel_bins == 128
    assert turbo.timestamp_begin_id == 50365
    sm_en = get_config("small.en")
    assert sm_en.vocab_size == 51864 and sm_en.sot_token_id == 50257
    assert get_config("large").d_model == 1280


def test_config_from_hf_syncs_special_layout():
    from asr_finetune_tpu.models.convert_hf import config_from_hf
    base = dict(num_mel_bins=128, d_model=1280, encoder_layers=32,
                encoder_attention_heads=20, decoder_layers=4,
                decoder_attention_heads=20, encoder_ffn_dim=5120)
    v3 = config_from_hf(dict(base, vocab_size=51866))
    assert v3.no_timestamps_token_id == 50364 and v3.timestamp_begin_id == 50365
    en = config_from_hf(dict(base, vocab_size=51864))
    assert en.eos_token_id == 50256 and en.sot_token_id == 50257
    assert en.timestamp_begin_id == 50363


def test_model_registry_distil_and_org_prefixes():
    from asr_finetune_tpu.models.configs import get_config
    d3 = get_config("distil-whisper/distil-large-v3")
    assert d3.decoder_layers == 2 and d3.encoder_layers == 32
    assert d3.vocab_size == 51866 and d3.timestamp_begin_id == 50365
    assert get_config("distil-medium.en").sot_token_id == 50257
