"""Golden-value parity of the on-device log-mel frontend vs HF.

Pins ops/logmel.py to WhisperFeatureExtractor's exact numerics — the same
features the reference extracts on host CPU in its streaming collator
(datasets_and_collators.py:192-195). SURVEY.md §7 flags this parity as a
hard part; these tests are the golden harness.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from asr_finetune_tpu.ops import logmel


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_filter_bank_matches_transformers(n_mels):
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ours = logmel.mel_filter_bank(n_mels=n_mels)
    theirs = hf_fb(
        num_frequency_bins=201, num_mel_filters=n_mels, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-7)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_logmel_matches_whisper_feature_extractor(n_mels):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=n_mels)
    rng = np.random.default_rng(0)
    # two utterances: one short (zero-padded), one exactly 30 s
    audio1 = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    audio2 = (rng.standard_normal(16000 * 30) * 0.1).astype(np.float32)

    hf = fe([audio1, audio2], sampling_rate=16000,
            return_tensors="np").input_features  # (2, n_mels, 3000)

    # strict: float64 host reference is bit-comparable to HF (also f64)
    ref = np.stack([logmel.log_mel_np(logmel.pad_or_trim(audio1), n_mels),
                    logmel.log_mel_np(logmel.pad_or_trim(audio2), n_mels)])
    np.testing.assert_allclose(ref.transpose(0, 2, 1), hf, atol=1e-5)

    # device path: fp32 matmul-DFT; log10 amplifies cancellation noise where
    # power is tiny, so bound max diff loosely but mean tightly
    batch = np.stack([logmel.pad_or_trim(audio1), logmel.pad_or_trim(audio2)])
    ours = np.asarray(logmel.log_mel_spectrogram(jnp.asarray(batch), n_mels=n_mels))
    ours_t = ours.transpose(0, 2, 1)  # → (2, n_mels, 3000) for comparison
    assert ours_t.shape == hf.shape
    diff = np.abs(ours_t - hf)
    assert diff.max() < 1.5e-1 and diff.mean() < 5e-4, (diff.max(), diff.mean())


def test_pad_or_trim():
    a = np.ones(10, np.float32)
    assert logmel.pad_or_trim(a, 6).shape == (6,)
    padded = logmel.pad_or_trim(a, 15)
    assert padded.shape == (15,) and padded[10:].sum() == 0
