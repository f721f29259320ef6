"""Batched autoregressive decoding under jit: greedy + beam search.

Capability parity with the reference's generation paths:
- training-time eval generate with `forced_decoder_ids` under fp16 autocast
  (custom_seq2seq_trainers.py:235-243)
- offline eval `model.generate` loops (evaluate_model.py:213-228,
  evaluate_peft.py:370-430)
- `generation_max_length=225` default (train_hyper.py:80), 448 hard cap.

TPU-native: one compiled `lax.while_loop` over decode steps with a
preallocated KV cache (models/whisper.py decode_step) — no host round-trips
per token; early exit when every sequence has emitted <|endoftext|>.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import whisper as W
from ..models.configs import WhisperConfig

Params = Dict[str, Any]


def _suppress_bias(vocab: int, suppress_tokens: Optional[Sequence[int]]):
    """Additive logits bias: -inf at suppressed ids (HF SuppressTokens
    processor — whisper's generation_config.suppress_tokens list)."""
    if not suppress_tokens:
        return None
    bias = np.zeros((vocab,), np.float32)
    bias[np.asarray(list(suppress_tokens), np.int64)] = -np.inf
    return jnp.asarray(bias)


def greedy_decode(params: Params, mel: jax.Array, cfg: WhisperConfig,
                  forced_tokens: Sequence[int], max_length: int = 225,
                  adapters: Optional[Params] = None,
                  compute_dtype=jnp.bfloat16,
                  suppress_tokens: Optional[Sequence[int]] = None,
                  kv_int8: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens (B, max_length), lengths (B,)).

    kv_int8 quantizes the precomputed cross-attention K/V to int8, halving
    the dominant per-step HBM traffic of autoregressive decoding
    (W.quantize_cross_kv).

    tokens[:, 0] is <|startoftranscript|>; forced_tokens is the FULL prefix
    including sot (tokenizer.prefix_tokens()). Positions past the emitted
    <|endoftext|> are padded with eot. suppress_tokens get -inf logits
    (whisper's punctuation/special suppression list).
    """
    B = mel.shape[0]
    eot = cfg.eos_token_id
    forced = jnp.asarray(list(forced_tokens), jnp.int32)
    n_forced = int(forced.shape[0])
    assert n_forced >= 1, "forced_tokens must at least contain sot"
    bias = _suppress_bias(cfg.vocab_size, suppress_tokens)

    enc_out = W.encode(params, mel, cfg, adapters, compute_dtype,
                       attn_impl="auto")  # inference: flash where it wins
    cross_kv = W.precompute_cross_kv(params, enc_out, cfg, adapters)
    if kv_int8:
        cross_kv = W.quantize_cross_kv(cross_kv)
    cache = W.init_cache(cfg, B, max_length, dtype=compute_dtype)

    tokens0 = jnp.full((B, max_length), eot, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(forced[0])

    def cond(carry):
        t, tokens, cache, finished = carry
        return jnp.logical_and(t < max_length - 1, ~jnp.all(finished))

    def body(carry):
        t, tokens, cache, finished = carry
        cur = jax.lax.dynamic_index_in_dim(tokens, t, axis=1, keepdims=False)
        logits, cache = W.decode_step(params, cur, t, cache, cross_kv, cfg,
                                      adapters, compute_dtype)
        if bias is not None:
            logits = logits + bias
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # forced prefix overrides the argmax while t+1 < n_forced
        in_prefix = (t + 1) < n_forced
        forced_tok = forced[jnp.minimum(t + 1, n_forced - 1)]
        nxt = jnp.where(in_prefix, forced_tok, nxt)
        nxt = jnp.where(finished, eot, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t + 1))
        finished = jnp.logical_or(finished, jnp.logical_and(~in_prefix, nxt == eot))
        return t + 1, tokens, cache, finished

    t_final, tokens, _, finished = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens0, cache, jnp.zeros((B,), bool)))

    lengths = jnp.sum(jnp.cumsum(
        (tokens == eot).astype(jnp.int32), axis=1) == 0, axis=1) + 1
    lengths = jnp.minimum(lengths, max_length)
    return tokens, lengths


def beam_decode(params: Params, mel: jax.Array, cfg: WhisperConfig,
                forced_tokens: Sequence[int], max_length: int = 225,
                num_beams: int = 4, length_penalty: float = 1.0,
                adapters: Optional[Params] = None,
                compute_dtype=jnp.bfloat16,
                suppress_tokens: Optional[Sequence[int]] = None,
                kv_int8: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Beam search via flattened (B*num_beams) batch; returns best beam's
    (tokens (B, max_length), lengths (B,)).

    Standard HF-style beam semantics: running beams score by summed logprob;
    finished beams are frozen and compared with length penalty
    (score / len**penalty).
    """
    B = mel.shape[0]
    K = num_beams
    eot = cfg.eos_token_id
    forced = jnp.asarray(list(forced_tokens), jnp.int32)
    n_forced = int(forced.shape[0])
    NEG = jnp.float32(-1e9)
    bias = _suppress_bias(cfg.vocab_size, suppress_tokens)

    enc_out = W.encode(params, mel, cfg, adapters, compute_dtype)
    enc_out = jnp.repeat(enc_out, K, axis=0)          # (B*K, S, d)
    cross_kv = W.precompute_cross_kv(params, enc_out, cfg, adapters)
    if kv_int8:
        cross_kv = W.quantize_cross_kv(cross_kv)
    cache = W.init_cache(cfg, B * K, max_length, dtype=compute_dtype)

    tokens0 = jnp.full((B, K, max_length), eot, jnp.int32).at[:, :, 0].set(forced[0])
    # beam 0 active, others start at -inf so step 1 doesn't duplicate
    scores0 = jnp.tile(jnp.where(jnp.arange(K) == 0, 0.0, NEG)[None], (B, 1))
    fin_scores0 = jnp.full((B, K), NEG)
    fin_tokens0 = jnp.full((B, K, max_length), eot, jnp.int32)
    fin_lens0 = jnp.ones((B, K), jnp.int32)

    def gather_beams(x, idx):
        """x (B, K, ...) gathered along beam dim with idx (B, K)."""
        return jnp.take_along_axis(
            x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)

    def body(carry):
        t, tokens, cache, scores, fin_tokens, fin_scores, fin_lens = carry
        cur = jax.lax.dynamic_index_in_dim(
            tokens.reshape(B * K, max_length), t, axis=1, keepdims=False)
        logits, new_cache = W.decode_step(params, cur, t, cache, cross_kv, cfg,
                                          adapters, compute_dtype)
        if bias is not None:
            logits = logits + bias
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, K, -1)
        V = logp.shape[-1]

        in_prefix = (t + 1) < n_forced
        forced_tok = forced[jnp.minimum(t + 1, n_forced - 1)]
        # during the forced prefix only the forced token is allowed
        prefix_mask = jnp.where(
            jnp.arange(V)[None, None, :] == forced_tok, 0.0, NEG)
        logp = jnp.where(in_prefix, prefix_mask, logp)

        cand = scores[:, :, None] + logp                      # (B, K, V)
        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)          # (B, K)
        beam_idx = top_idx // V
        tok_idx = (top_idx % V).astype(jnp.int32)

        tokens = gather_beams(tokens, beam_idx)
        tokens = jax.lax.dynamic_update_slice(
            tokens, tok_idx[:, :, None], (0, 0, t + 1))

        # reorder cache: (L, B*K, T, H, hd) → index on beam dim
        flat_idx = (jnp.arange(B)[:, None] * K + beam_idx).reshape(-1)
        new_cache = {k: v[:, flat_idx] for k, v in new_cache.items()}

        ended = jnp.logical_and(tok_idx == eot, ~in_prefix)   # (B, K)
        # fold newly finished beams into the finished set
        cand_fin_scores = jnp.where(
            ended, top_scores / ((t + 2.0) ** length_penalty), NEG)
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin_scores], axis=1)
        all_fin_tokens = jnp.concatenate([fin_tokens, tokens], axis=1)
        all_fin_lens = jnp.concatenate(
            [fin_lens, jnp.full((B, K), t + 2, jnp.int32)], axis=1)
        keep_scores, keep_idx = jax.lax.top_k(all_fin_scores, K)
        fin_scores = keep_scores
        fin_tokens = gather_beams(all_fin_tokens, keep_idx)
        fin_lens = jnp.take_along_axis(all_fin_lens, keep_idx, axis=1)

        scores = jnp.where(ended, NEG, top_scores)
        return t + 1, tokens, new_cache, scores, fin_tokens, fin_scores, fin_lens

    def cond(carry):
        t, tokens, cache, scores, fin_tokens, fin_scores, fin_lens = carry
        # stop when best running beam can't beat the worst kept finished beam
        best_running = jnp.max(scores, axis=1) / ((t + 1.0) ** length_penalty)
        worst_fin = jnp.min(fin_scores, axis=1)
        improvable = jnp.any(best_running > worst_fin)
        return jnp.logical_and(t < max_length - 1, improvable)

    carry = (jnp.int32(0), tokens0, cache, scores0, fin_tokens0, fin_scores0,
             fin_lens0)
    t, tokens, _, scores, fin_tokens, fin_scores, fin_lens = jax.lax.while_loop(
        cond, body, carry)

    # if nothing finished (hit max length), fall back to running beams
    any_fin = jnp.any(fin_scores > NEG / 2, axis=1)
    run_best = jnp.argmax(scores, axis=1)
    fin_best = jnp.argmax(fin_scores, axis=1)
    best = jnp.where(any_fin, fin_best, run_best)
    out_tokens = jnp.where(any_fin[:, None, None], fin_tokens, tokens)
    out_tokens = jnp.take_along_axis(
        out_tokens, best[:, None, None], axis=1)[:, 0]
    out_lens = jnp.where(
        any_fin,
        jnp.take_along_axis(fin_lens, best[:, None], axis=1)[:, 0],
        jnp.full((B,), max_length, jnp.int32))
    return out_tokens, out_lens


def make_decode_fn(cfg: WhisperConfig, forced_tokens: Sequence[int],
                   max_length: int = 225, num_beams: int = 1,
                   compute_dtype=jnp.bfloat16,
                   suppress_tokens: Optional[Sequence[int]] = None,
                   kv_int8: bool = False):
    """jit-wrapped decode entry used by the trainer's eval and offline eval."""
    if num_beams <= 1:
        def fn(params, mel, adapters=None):
            return greedy_decode(params, mel, cfg, forced_tokens, max_length,
                                 adapters, compute_dtype,
                                 suppress_tokens=suppress_tokens,
                                 kv_int8=kv_int8)
    else:
        def fn(params, mel, adapters=None):
            return beam_decode(params, mel, cfg, forced_tokens, max_length,
                               num_beams, 1.0, adapters, compute_dtype,
                               suppress_tokens=suppress_tokens,
                               kv_int8=kv_int8)
    return jax.jit(fn)
