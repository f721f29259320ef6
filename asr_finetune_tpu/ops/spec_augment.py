"""On-device SpecAugment (frequency + time masking) for log-mel features.

Listed in BASELINE.json's capability configs ("whisper-small full fine-tune
with gradient checkpointing + on-device SpecAugment"). The reference itself
never implements SpecAugment (HF's whisper supports it via config flags the
reference doesn't set) — here it is a first-class, jittable augmentation
running on TPU right after the log-mel frontend.

Follows Park et al. 2019 (SpecAugment, LibriSpeech policies): `n_freq_masks`
masks of width U(0, freq_mask_param) over mel bins, `n_time_masks` masks of
width U(0, time_mask_param) over frames, applied per utterance. Masked
positions are set to the batch-feature mean (≈ the log-mel pad value).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    freq_mask_param: int = 27      # LibriSpeech LD policy
    n_freq_masks: int = 2
    time_mask_param: int = 100
    n_time_masks: int = 2
    mask_value: float | None = None  # None → per-utterance mean


def _axis_mask(key: jax.Array, length: int, max_width: int, n_masks: int,
               batch: int) -> jax.Array:
    """(B, length) bool — True where masked."""
    k1, k2 = jax.random.split(key)
    widths = jax.random.randint(k1, (batch, n_masks), 0, max_width + 1)
    starts = jax.random.randint(k2, (batch, n_masks), 0,
                                jnp.maximum(length - widths, 1))
    pos = jnp.arange(length)[None, None, :]                # (1, 1, L)
    m = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    return jnp.any(m, axis=1)                              # (B, L)


def spec_augment(key: jax.Array, mel: jax.Array,
                 cfg: SpecAugmentConfig = SpecAugmentConfig()) -> jax.Array:
    """mel (B, T, n_mels) → masked mel, fully jittable."""
    B, T, F = mel.shape
    kf, kt = jax.random.split(key)
    fmask = _axis_mask(kf, F, min(cfg.freq_mask_param, F), cfg.n_freq_masks, B)
    tmask = _axis_mask(kt, T, min(cfg.time_mask_param, T), cfg.n_time_masks, B)
    masked = fmask[:, None, :] | tmask[:, :, None]         # (B, T, F)
    if cfg.mask_value is None:
        fill = jnp.mean(mel, axis=(1, 2), keepdims=True)
    else:
        fill = jnp.asarray(cfg.mask_value, mel.dtype)
    return jnp.where(masked, fill, mel)
