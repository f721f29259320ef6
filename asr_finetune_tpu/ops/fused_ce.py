"""Chunked fused cross-entropy over the tied output projection.

The naive loss path materializes the full (B, T, V) fp32 logits tensor
(V = 51866 for large-v3: ~319 MB at bs 8 / T 192, live through the
backward). Here the projection and the CE reduction are fused and chunked
over rows, so only a (chunk, V) logits tile is ever live; the backward
recomputes each tile (custom VJP) instead of storing it.

Replaces the reference's WhisperForConditionalGeneration built-in loss
(HF models/whisper/modeling_whisper.py CrossEntropyLoss over full logits)
with the same semantics: labels == -100 ignored, optional label smoothing
(mean-logprob form, matching models/whisper.py cross_entropy).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

IGNORE_ID = -100
_DEFAULT_CHUNK = 256  # rows per logits tile: 256 x 51866 fp32 ≈ 53 MB


def _pad_rows(x2, labels1, chunk):
    n = x2.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((n_pad, x2.shape[1]), x2.dtype)], axis=0)
        labels1 = jnp.concatenate(
            [labels1, jnp.full((n_pad,), IGNORE_ID, labels1.dtype)], axis=0)
    return x2, labels1, n + n_pad


def _chunk_stats(x_c, e, labels_c):
    """One tile: logits → (lse, label_logit, sum_logits, mask)."""
    logits = jnp.dot(x_c, e.T, preferred_element_type=jnp.float32)  # (c, V)
    m = jnp.max(logits, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[:, None]), axis=-1))
    mask = labels_c != IGNORE_ID
    safe = jnp.where(mask, labels_c, 0)
    lab = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    return lse, lab, jnp.sum(logits, axis=-1), mask


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_cross_entropy(x: jax.Array, embed: jax.Array, labels: jax.Array,
                        label_smoothing: float = 0.0,
                        chunk: int = _DEFAULT_CHUNK,
                        embed_grad: bool = True
                        ) -> Tuple[jax.Array, jax.Array]:
    """x (B, T, d) hidden states, embed (V, d) tied table, labels (B, T).

    Returns (mean token loss, num_tokens) — identical semantics to
    models/whisper.py cross_entropy(logits, labels, label_smoothing).
    embed_grad=False (PEFT's frozen base) skips the dE matmul entirely.
    """
    loss, n, _ = _fwd_impl(x, embed, labels, label_smoothing, chunk)
    return loss, n


def _fwd_impl(x, embed, labels, label_smoothing, chunk):
    B, T, d = x.shape
    V = embed.shape[0]
    e = embed.astype(x.dtype)
    x2, lab1, n_rows = _pad_rows(x.reshape(B * T, d), labels.reshape(B * T),
                                 chunk)
    xs = (x2.reshape(n_rows // chunk, chunk, d),
          lab1.reshape(n_rows // chunk, chunk))

    def body(carry, xs_c):
        nll_sum, n_tok = carry
        x_c, labels_c = xs_c
        lse, lab, s_logits, mask = _chunk_stats(x_c, e, labels_c)
        nll = lse - lab
        if label_smoothing > 0.0:
            smooth = lse - s_logits / V  # = -mean_v logprob
            nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
        nll_sum = nll_sum + jnp.sum(jnp.where(mask, nll, 0.0))
        n_tok = n_tok + jnp.sum(mask)
        return (nll_sum, n_tok), None

    (nll_sum, n_tok), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.int32(0)), xs)
    n = jnp.maximum(n_tok, 1)
    return nll_sum / n, n, None


def _fused_ce_fwd(x, embed, labels, label_smoothing, chunk, embed_grad):
    loss, n, _ = _fwd_impl(x, embed, labels, label_smoothing, chunk)
    return (loss, n), (x, embed, labels, n)


def _fused_ce_bwd(label_smoothing, chunk, embed_grad, res, g):
    g_loss, _g_n = g
    x, embed, labels, n = res
    B, T, d = x.shape
    V = embed.shape[0]
    e = embed.astype(x.dtype)
    x2, lab1, n_rows = _pad_rows(x.reshape(B * T, d), labels.reshape(B * T),
                                 chunk)
    xs = (x2.reshape(n_rows // chunk, chunk, d),
          lab1.reshape(n_rows // chunk, chunk))
    scale = (g_loss / n.astype(jnp.float32)).astype(jnp.float32)

    def body(de_acc, xs_c):
        x_c, labels_c = xs_c
        logits = jnp.dot(x_c, e.T, preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)              # softmax (c, V)
        mask = (labels_c != IGNORE_ID)[:, None]
        safe = jnp.where(labels_c != IGNORE_ID, labels_c, 0)
        onehot = jax.nn.one_hot(safe, V, dtype=jnp.float32)
        if label_smoothing > 0.0:
            target = (1.0 - label_smoothing) * onehot + label_smoothing / V
        else:
            target = onehot
        dlogits = jnp.where(mask, (p - target) * scale, 0.0)    # (c, V) f32
        dx_c = jnp.dot(dlogits.astype(x_c.dtype), e,
                       preferred_element_type=jnp.float32)      # (c, d)
        if embed_grad:
            de_acc = de_acc + jnp.dot(dlogits.T.astype(x_c.dtype), x_c,
                                      preferred_element_type=jnp.float32)
        return de_acc, dx_c

    de0 = (jnp.zeros((V, d), jnp.float32) if embed_grad
           else jnp.zeros((), jnp.float32))
    de, dx_chunks = jax.lax.scan(body, de0, xs)
    dx = dx_chunks.reshape(n_rows, d)[: B * T].reshape(B, T, d).astype(x.dtype)
    de_out = (de.astype(embed.dtype) if embed_grad
              else jnp.zeros_like(embed))
    return dx, de_out, None


fused_cross_entropy.defvjp(_fused_ce_fwd, _fused_ce_bwd)
