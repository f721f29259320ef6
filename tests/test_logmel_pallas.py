"""Pallas log-mel kernel: interpret-mode parity vs the reference frontend.

(The compiled-TPU path is exercised by bench runs; see the module docstring
in ops/logmel_pallas.py for the current Mosaic tiling limitation.)
"""
import jax.numpy as jnp
import numpy as np

from asr_finetune_tpu.ops import logmel, logmel_pallas


def test_pallas_logmel_interpret_parity():
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, logmel.CHUNK_SAMPLES)) * 0.1).astype(np.float32)
    ref = np.asarray(logmel.log_mel_spectrogram(jnp.asarray(audio), 80))
    out = np.asarray(logmel_pallas.log_mel_pallas(
        jnp.asarray(audio), 80, interpret=True))
    assert out.shape == ref.shape == (2, 3000, 80)
    np.testing.assert_allclose(out, ref, atol=1e-4)
