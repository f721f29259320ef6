"""Attention implementations: XLA softmax attention and TPU flash attention.

The reference relies on torch SDPA inside HF Whisper (CUDA fused attention).
Here the training-path attention can run through Pallas flash attention
(jax.experimental.pallas.ops.tpu.flash_attention) — O(T) memory, no
(B, H, T, T) softmax materialization — which matters for the encoder's
1500-frame self-attention in whisper-large-v3 (20 heads x 1500² logits).

Whisper's sequence lengths (1500 encoder frames, 448-token label buckets)
are not 128-multiples, so inputs are zero-padded to the tile size and
masked via SegmentIds (valid tokens segment 0, padding segment 1 — flash
only attends within equal segments).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _flash_import_ok() -> bool:
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa: F401
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _flash_available() -> bool:
    """Pallas attention kernels usable for the NEXT trace?

    The ASR_TPU_ATTN_IMPL=xla escape hatch MUST be re-read on every call
    (only the import + backend probe is cached): int8-outlier calibration
    (run.py / bench.py) sets it temporarily around a CPU-backend forward
    and restores it after. When this whole predicate was lru_cached, that
    window poisoned the cache to False for the REST OF THE PROCESS — every
    later trace (including the real TPU train step) silently fell back to
    XLA attention, a deterministic ~2x step regression (measured 7.56 vs
    14.7 utt/s/chip on the large-v3 parity config, round 5)."""
    import os
    if os.environ.get("ASR_TPU_ATTN_IMPL", "").lower() == "xla":
        return False
    return _flash_import_ok()


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  mask: Optional[jax.Array] = None,
                  causal: bool = False) -> jax.Array:
    """Reference attention over (B, T, H, hd); fp32 softmax."""
    hd = q.shape[-1]
    scale = hd ** -0.5
    acc = jnp.promote_types(q.dtype, jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=acc)
    if causal:
        Tq, Tk = q.shape[1], k.shape[1]
        cm = jnp.tril(jnp.ones((Tq, Tk), bool))[None, None]
        mask = cm if mask is None else (mask & cm)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits.astype(acc), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _pick_block(T: int, prefer=(768, 512, 384, 256, 128)) -> int:
    """Largest preferred tile dividing T. Default flash block sizes are badly
    tuned for Whisper's shapes on v5e (41.8 ms/bwd at 1536x20x64 vs 11.7 ms
    with 768 blocks; XLA attention is 17.0 ms)."""
    for b in prefer:
        if T % b == 0:
            return b
    return 128


def _block_sizes(Tq: int, Tk: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes
    bq, bk = _pick_block(Tq), _pick_block(Tk)
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)


def flash(q: jax.Array, k: jax.Array, v: jax.Array,
          causal: bool = False) -> jax.Array:
    """Pallas flash attention over (B, T, H, hd) with auto padding/masking."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    B, Tq, H, hd = q.shape
    Tk = k.shape[1]
    Tq_p, Tk_p = _round_up(Tq, 128), _round_up(Tk, 128)

    def pad_t(x, T_p):
        if x.shape[1] == T_p:
            return x
        return jnp.pad(x, ((0, 0), (0, T_p - x.shape[1]), (0, 0), (0, 0)))

    qp = pad_t(q, Tq_p).transpose(0, 2, 1, 3)  # (B, H, Tq_p, hd)
    kp = pad_t(k, Tk_p).transpose(0, 2, 1, 3)
    vp = pad_t(v, Tk_p).transpose(0, 2, 1, 3)

    seg = None
    if Tq_p != Tq or Tk_p != Tk:
        q_ids = (jnp.arange(Tq_p) >= Tq).astype(jnp.int32)[None].repeat(B, 0)
        kv_ids = (jnp.arange(Tk_p) >= Tk).astype(jnp.int32)[None].repeat(B, 0)
        seg = SegmentIds(q=q_ids, kv=kv_ids)

    out = flash_attention(qp, kp, vp, segment_ids=seg, causal=causal,
                          sm_scale=hd ** -0.5,
                          block_sizes=_block_sizes(Tq_p, Tk_p))
    return out.transpose(0, 2, 1, 3)[:, :Tq]


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              mask: Optional[jax.Array] = None, causal: bool = False,
              impl: str = "auto",
              save_tag: Optional[str] = None) -> jax.Array:
    """Dispatch, fastest-first for Whisper's shapes:

    1. dense whole-row Pallas attention (ops/encoder_attention.py) for
       non-causal unmasked attention where the full row tile fits VMEM —
       the encoder's 1500-frame self-attention and teacher-forced
       cross-attention. Single fwd kernel + single fused bwd kernel with
       zero saved residuals: profiled 2.6x the upstream-flash attention
       stack inside the remat'd encoder backward (see encoder_attention
       docstring).
    2. upstream Pallas flash attention for long causal / oversize rows.
    3. XLA softmax attention (custom masks, short queries, CPU tests).

    save_tag: remat save-point name applied to the q/k/v the chosen
    path's VJP actually consumes — for the dense path that is the
    PREPPED (BH, T_pad, hd) layout, so a layer-remat'd backward reuses
    the saved kernel-layout arrays instead of re-padding/transposing
    three (B, T, H, hd) tensors per layer.
    """
    Tq_p = _round_up(q.shape[1], 128)
    Tk_p = _round_up(k.shape[1], 128)
    use_dense = (impl in ("auto", "dense") and mask is None and not causal
                 and q.shape[1] >= 128 and _flash_available()
                 # ~3 (Tq, Tk) f32 tiles live in the bwd kernel
                 and 3 * Tq_p * Tk_p * 4 <= 48 * 1024 * 1024)
    if use_dense:
        from .encoder_attention import encoder_attention
        return encoder_attention(q, k, v, save_tag=save_tag)
    if save_tag is not None:
        from jax.ad_checkpoint import checkpoint_name
        q = checkpoint_name(q, save_tag)
        k = checkpoint_name(k, save_tag)
        v = checkpoint_name(v, save_tag)
    use_flash = (impl in ("auto", "flash") and mask is None
                 and q.shape[1] >= 128 and _flash_available())
    if use_flash:
        return flash(q, k, v, causal=causal)
    return xla_attention(q, k, v, mask, causal)
