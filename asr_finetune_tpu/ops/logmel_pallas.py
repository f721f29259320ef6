"""Fused Pallas TPU kernel for the Whisper log-mel frontend.

One kernel fuses what the reference spreads over a host-CPU collator
(framing → hann window → STFT → power → mel filter bank → log10;
datasets_and_collators.py:192-195 via WhisperFeatureExtractor):

- raw audio stays in HBM (`pl.ANY`) reshaped to (rows, 160) with hop == row
  stride; each grid step issues THREE overlapping async copies at row
  offsets 0/1/2 (BlockSpec blocks can't overlap, and Mosaic can't
  concatenate sublane-shifted vectors, so the shifts are resolved in HBM
  addressing): frame t = [S[t], S[t+1], S[t+2][:80]] — no gather, no
  strided loads
- the windowed real DFT is two (600,400)x(400,256) MXU matmuls against
  zero-padded cos/-sin matrices (window folded in), power = re²+im²
  (zero-padded DFT columns produce exactly zero power)
- mel projection is a (600,256)x(256,128) MXU matmul against the
  zero-padded slaney filter bank, then log10 on the VPU

The Whisper global max-8 clamp needs an all-frames max, so the kernel
returns unclamped log10 and the (cheap, XLA-fused) clamp/scale runs outside.

Parity: tests/test_logmel_pallas.py vs ops/logmel.py (which is itself pinned
to WhisperFeatureExtractor).

STATUS: numerically exact in interpret mode; on current Mosaic the compiled
path is blocked by a tiling limitation (lane slices must be 128-aligned, the
hop-160 row layout is not — "Slice shape along dimension 2 must be aligned
to tiling (128), but is 160"). The PRODUCTION on-device frontend is
ops/logmel.log_mel_spectrogram's strided-conv formulation, which maps the
same fused computation onto the MXU through XLA (measured 1.8x faster than
the gather formulation on v5e and bit-identical); this kernel is kept as the
explicit-DMA variant pending Mosaic support for offset-tiled layouts.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import logmel as ref

BLOCK_FRAMES = 600                      # 3000 = 5 blocks; multiple of 8
N_FFT = ref.N_FFT                       # 400
HOP = ref.HOP                           # 160
NUM_FRAMES = ref.NUM_FRAMES             # 3000
FREQ_PAD = 256                          # 201 bins → padded lane dim
MEL_PAD = 128
# span: BLOCK_FRAMES+2 rows of HOP samples covers frames' 400-sample windows
SPAN_ROWS = BLOCK_FRAMES + 2
SPAN = SPAN_ROWS * HOP                  # 96320 samples
PADDED_LEN = ref.CHUNK_SAMPLES + N_FFT  # reflect-padded + tail margin


@functools.lru_cache(maxsize=8)
def _padded_mats(n_mels: int):
    cos_m, sin_m = ref._dft_mats(N_FFT)            # (400, 201) each
    cosp = np.zeros((N_FFT, FREQ_PAD), np.float32)
    sinp = np.zeros((N_FFT, FREQ_PAD), np.float32)
    cosp[:, :201] = cos_m
    sinp[:, :201] = sin_m
    mel = np.zeros((FREQ_PAD, MEL_PAD), np.float32)
    mel[:201, :n_mels] = ref._mel_mat(n_mels)
    return cosp, sinp, mel


def _kernel(audio_hbm, cos_ref, sin_ref, mel_ref, out_ref,
            s0, s1, s2, sem):
    b = pl.program_id(0)
    blk = pl.program_id(1)
    row0 = blk * BLOCK_FRAMES  # hop == row stride, so frame t starts row t

    copies = [
        pltpu.make_async_copy(
            audio_hbm.at[b, pl.ds(row0 + k, BLOCK_FRAMES), :], dst, sem.at[k])
        for k, dst in enumerate((s0, s1, s2))
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    frames = jnp.concatenate(
        [s0[:], s1[:], s2[:, 0:80]], axis=1)          # (600, 400)

    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im                         # (600, 256)
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10)) * np.float32(1.0 / np.log(10.0))


def log_mel_pallas(audio: jax.Array, n_mels: int = 80,
                   interpret: bool = False) -> jax.Array:
    """Waveform (B, 480000) → log-mel (B, 3000, n_mels), Whisper-normalized.

    Drop-in for ops/logmel.log_mel_spectrogram on TPU.
    """
    B = audio.shape[0]
    assert audio.shape[1] == ref.CHUNK_SAMPLES, audio.shape
    cosp, sinp, melp = _padded_mats(n_mels)

    pad = N_FFT // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    # row-major (rows, HOP) layout so the kernel's span DMA is a 2D slice;
    # 3003 rows ≥ last block's row0 (2400) + SPAN_ROWS (602)
    rows_total = -(-padded.shape[1] // HOP)
    padded = jnp.pad(padded, ((0, 0), (0, rows_total * HOP - padded.shape[1])))
    padded = padded.reshape(B, rows_total, HOP)

    grid = (B, NUM_FRAMES // BLOCK_FRAMES)
    log_spec = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, NUM_FRAMES, MEL_PAD), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # audio stays in HBM
            pl.BlockSpec((N_FFT, FREQ_PAD), lambda b, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, FREQ_PAD), lambda b, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_PAD, MEL_PAD), lambda b, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_FRAMES, MEL_PAD),
                               lambda b, k: (b, k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_FRAMES, HOP), jnp.float32),
            pltpu.VMEM((BLOCK_FRAMES, HOP), jnp.float32),
            pltpu.VMEM((BLOCK_FRAMES, HOP), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * NUM_FRAMES * N_FFT * FREQ_PAD * 2
            + 2 * B * NUM_FRAMES * FREQ_PAD * MEL_PAD,
            bytes_accessed=B * (PADDED_LEN + NUM_FRAMES * MEL_PAD) * 4,
            transcendentals=B * NUM_FRAMES * MEL_PAD,
        ),
        interpret=interpret,
    )(padded, jnp.asarray(cosp), jnp.asarray(sinp), jnp.asarray(melp))

    log_spec = log_spec[:, :, :n_mels]
    m = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, m - 8.0)
    return (log_spec + 4.0) / 4.0
