"""Native C++ kernels: build, parity with pure-Python, and use by WER."""
import numpy as np
import pytest

from asr_finetune_tpu.evaluation import wer as wer_lib
from asr_finetune_tpu.utils import native_ext


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native_ext.available():
        pytest.skip("no toolchain to build native extension")


def test_edit_distance_parity():
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(20)]
    for _ in range(50):
        a = list(rng.choice(vocab, rng.integers(0, 15)))
        b = list(rng.choice(vocab, rng.integers(0, 15)))
        assert native_ext.edit_distance_words(a, b) == wer_lib._edit_distance(a, b)


def test_corpus_wer_matches_python():
    rng = np.random.default_rng(1)
    vocab = ["der", "die", "das", "hund", "läuft", "heute"]
    refs = [" ".join(rng.choice(vocab, rng.integers(1, 9))) for _ in range(30)]
    hyps = [" ".join(rng.choice(vocab, rng.integers(1, 9))) for _ in range(30)]
    e, w = native_ext.corpus_wer(refs, hyps)
    py = sum(wer_lib._edit_distance(r.split(), h.split())
             for r, h in zip(refs, hyps))
    assert e == py
    assert w == sum(len(r.split()) for r in refs)
    # and the public API agrees
    assert wer_lib.wer(refs, hyps) == pytest.approx(e / w)


def test_assemble_batch():
    rng = np.random.default_rng(2)
    audios = [rng.standard_normal(n).astype(np.float32)
              for n in (100, 5000, 12000)]
    out = native_ext.assemble_batch(audios, 8000)
    assert out.shape == (3, 8000)
    np.testing.assert_array_equal(out[0, :100], audios[0])
    assert (out[0, 100:] == 0).all()
    np.testing.assert_array_equal(out[2], audios[2][:8000])
