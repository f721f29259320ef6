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

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import whisper as W
from ..models.configs import WhisperConfig

Params = Dict[str, Any]


def _fused_head_dim_ok(cfg: "WhisperConfig") -> bool:
    """The fused kernels hard-assume 64-dim heads (decoder_fused.HEAD_DIM:
    the head-expansion matrices are built as d//64 blocks). Every released
    Whisper variant qualifies; custom checkpoints with other head dims must
    take the XLA path or they'd get silently wrong head grouping."""
    from ..ops import decoder_fused
    return cfg.d_model // cfg.decoder_heads == decoder_fused.HEAD_DIM


def _fused_default(cfg: "WhisperConfig") -> bool:
    """Use the fused Pallas decode path (ops/decoder_fused.py) by default on
    a single TPU chip; multi-device meshes keep the XLA path (Pallas calls
    are not auto-partitionable). Override with ASR_TPU_FUSED_DECODE=0/1."""
    env = os.environ.get("ASR_TPU_FUSED_DECODE")
    if env is not None:
        low = env.lower()
        if low in ("1", "true", "yes", "on"):
            if not _fused_head_dim_ok(cfg):
                import warnings
                warnings.warn(
                    "ASR_TPU_FUSED_DECODE=1 but model head_dim != 64; "
                    "falling back to the XLA decode path")
                return False
            return True
        if low in ("0", "false", "no", "off", ""):
            return False
        raise ValueError(
            f"ASR_TPU_FUSED_DECODE={env!r}: use 1/true/yes/on or 0/false/no/off")
    return (jax.default_backend() == "tpu" and jax.device_count() == 1
            and _fused_head_dim_ok(cfg))


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _cast_decoder_weights(params: Params, dtype) -> Params:
    """Pre-cast the decoder's matmul weights (not the layernorm params —
    those are consumed in fp32 either way) so the fused kernels stream
    compute-dtype bytes instead of re-casting inside the token loop.
    Matches the non-fused numerics: dense() casts w/b to the activation
    dtype at every use."""
    def cast(t):
        # int8 dequant scales (w_scale) stay fp32: the fused kernels apply
        # them as a post-matmul multiply and ops/quant.py keeps them fp32
        # deliberately — casting would stack bf16 rounding on the int8 error
        def leaf(path, a):
            name = path[-1].key if path and hasattr(path[-1], "key") else ""
            if name.endswith("_scale"):
                return a
            return (a.astype(dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a)
        return jax.tree_util.tree_map_with_path(leaf, t)

    layers = dict(params["decoder"]["layers"])
    for blk in ("self_attn", "cross_attn", "mlp"):
        layers[blk] = cast(layers[blk])
    dec = dict(params["decoder"])
    dec["layers"] = layers
    dec["embed"] = dec["embed"].astype(dtype)
    dec["pos"] = dec["pos"].astype(dtype)
    return {**params, "decoder": dec}


def _prepare_fused(enc_out, cross_kv, cfg, max_length, compute_dtype):
    """One-time (per decode call, outside the token loop) arrangement for
    decode_step_fused: pad cross K/V to a 128-multiple source length and
    flatten heads to the kernels' dense (L, B, S, d) layout (one copy here
    instead of a reshape inside the token loop), expand int8 scales to
    dense (L, B, d), pick a 128-multiple cache length."""
    S_real = int(enc_out.shape[1])
    S_pad = _round_up(S_real, 128)
    hd = cfg.d_model // cfg.decoder_heads

    def pad_dense(a):
        # (L, B, S, H, hd) → padded (L, B, S_pad, H*hd)
        if a.shape[2] != S_pad:
            widths = [(0, 0)] * a.ndim
            widths[2] = (0, S_pad - a.shape[2])
            a = jnp.pad(a, widths)
        return a.reshape(a.shape[0], a.shape[1], S_pad, -1)

    if "k_q8" in cross_kv:
        ckv = {
            "k_q8": pad_dense(cross_kv["k_q8"]),
            "v_q8": pad_dense(cross_kv["v_q8"]),
            # (L, B, 1, H, 1) → (L, B, d): index j uses head j // hd
            "k_scale_d": jnp.repeat(cross_kv["k_scale"][:, :, 0, :, 0],
                                    hd, axis=-1),
            "v_scale_d": jnp.repeat(cross_kv["v_scale"][:, :, 0, :, 0],
                                    hd, axis=-1),
        }
    else:
        ckv = {"k": pad_dense(cross_kv["k"]).astype(compute_dtype),
               "v": pad_dense(cross_kv["v"]).astype(compute_dtype)}
    cache_len = _round_up(max_length, 128)
    return ckv, S_real, cache_len


def _quantize_decoder_weights(params: Params) -> Params:
    """Opt-in int8 decoder weights for the token loop (w_int8 flag): every
    step re-streams ~1.5 GB of large-v3 decoder weights from HBM, so int8
    halves the dominant weight traffic of autoregressive decoding. Applied
    AFTER encode/precompute_cross_kv so the one-time full-sequence math
    stays in full precision; both decode_step (dense() dequant) and the
    fused kernels (post-matmul column scale) consume the quantized form."""
    from ..ops.quant import quantize_tree_int8
    dec = dict(params["decoder"])
    dec["layers"] = quantize_tree_int8(dec["layers"])
    return {**params, "decoder": dec}


def _suppress_bias(vocab: int, suppress_tokens: Optional[Sequence[int]]):
    """Additive logits bias: -inf at suppressed ids (HF SuppressTokens
    processor — whisper's generation_config.suppress_tokens list)."""
    if not suppress_tokens:
        return None
    bias = np.zeros((vocab,), np.float32)
    bias[np.asarray(list(suppress_tokens), np.int64)] = -np.inf
    return jnp.asarray(bias)


NEG_INF = jnp.float32(-np.inf)

# whisper generation_config.max_initial_timestamp = 1.0 s at 0.02 s/token
MAX_INITIAL_TIMESTAMP_INDEX = 50


def _apply_timestamp_rules(logits: jax.Array, prev: jax.Array,
                           prev2: jax.Array, last_ts: jax.Array,
                           is_begin: jax.Array, ts_begin: int, eot: int,
                           no_ts_id: int) -> jax.Array:
    """Whisper's timestamp grammar on (N, V) fp32 logits — the semantics of
    HF's WhisperTimeStampLogitsProcessor, which the reference inherits by
    passing return_timestamps into generate (whisper_models.py:44-48):

    - <|notimestamps|> never generated
    - after an unpaired timestamp: only a timestamp or eot (pairing rule)
    - after a completed pair: no timestamp (text must follow)
    - timestamps are non-decreasing across the sequence (a pair's close may
      equal its open; a new pair's open must exceed the last close)
    - the first free position must be a timestamp, capped at
      max_initial_timestamp
    - if total timestamp probability beats the best text token, force a
      timestamp

    prev/prev2: tokens at the two previous positions (N,), last_ts: largest
    timestamp token emitted so far (0 = none), is_begin: scalar bool for
    "this is the first unforced position".
    """
    V = logits.shape[-1]
    ar = jnp.arange(V)
    is_ts_tok = ar >= ts_begin                       # (V,)
    prev_is_ts = prev >= ts_begin                    # (N,)
    prev2_is_ts = prev2 >= ts_begin

    logits = jnp.where(ar[None, :] == no_ts_id, NEG_INF, logits)

    # pairing rules
    need_ts_or_eot = prev_is_ts & ~prev2_is_ts
    logits = jnp.where(
        need_ts_or_eot[:, None] & (ar < eot)[None, :], NEG_INF, logits)
    pair_done = prev_is_ts & prev2_is_ts
    logits = jnp.where(
        pair_done[:, None] & is_ts_tok[None, :], NEG_INF, logits)

    # monotonicity: lower bound is the last timestamp (inclusive while the
    # pair is open, exclusive once closed)
    have_ts = last_ts >= ts_begin
    lower = jnp.where(need_ts_or_eot, last_ts, last_ts + 1)
    logits = jnp.where(
        (have_ts & ~is_begin)[:, None] & is_ts_tok[None, :]
        & (ar[None, :] < lower[:, None]),
        NEG_INF, logits)

    # first free position: timestamp only, capped at the initial window
    logits = jnp.where(is_begin & ~is_ts_tok[None, :], NEG_INF, logits)
    logits = jnp.where(
        is_begin & (ar[None, :] > ts_begin + MAX_INITIAL_TIMESTAMP_INDEX),
        NEG_INF, logits)

    # probability-mass rule: sum p(timestamps) > max p(text) → force timestamp
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_lp = jax.nn.logsumexp(
        jnp.where(is_ts_tok[None, :], logprobs, NEG_INF), axis=-1)
    text_lp = jnp.max(jnp.where(is_ts_tok[None, :], NEG_INF, logprobs), axis=-1)
    force_ts = ts_lp > text_lp
    logits = jnp.where(force_ts[:, None] & ~is_ts_tok[None, :], NEG_INF, logits)
    return logits


def greedy_decode(params: Params, mel: jax.Array, cfg: WhisperConfig,
                  forced_tokens: Sequence[int], max_length: int = 225,
                  adapters: Optional[Params] = None,
                  compute_dtype=jnp.bfloat16,
                  suppress_tokens: Optional[Sequence[int]] = None,
                  begin_suppress_tokens: Optional[Sequence[int]] = None,
                  timestamp_begin: Optional[int] = None,
                  no_timestamps_id: Optional[int] = None,
                  kv_int8: bool = False,
                  w_int8: bool = False,
                  fused: Optional[bool] = None) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens (B, max_length), lengths (B,)).

    kv_int8 quantizes the precomputed cross-attention K/V to int8, halving
    the dominant per-step HBM traffic of autoregressive decoding
    (W.quantize_cross_kv).

    tokens[:, 0] is <|startoftranscript|>; forced_tokens is the FULL prefix
    including sot (tokenizer.prefix_tokens()). Positions past the emitted
    <|endoftext|> are padded with eot. suppress_tokens get -inf logits
    (whisper's punctuation/special suppression list); begin_suppress_tokens
    only at the first unforced position (HF SuppressTokensAtBegin).
    With timestamp_begin set, whisper's timestamp grammar is enforced
    (_apply_timestamp_rules) — the reference's return_timestamps path.
    fused (default: auto — on for a single TPU chip) routes each token step
    through the fused Pallas layer kernels (W.decode_step_fused); adapters
    are exactly folded into the weights first (lora.merge_adapters).
    """
    B = mel.shape[0]
    eot = cfg.eos_token_id
    forced = jnp.asarray(list(forced_tokens), jnp.int32)
    n_forced = int(forced.shape[0])
    assert n_forced >= 1, "forced_tokens must at least contain sot"
    bias = _suppress_bias(cfg.vocab_size, suppress_tokens)
    begin_bias = _suppress_bias(cfg.vocab_size, begin_suppress_tokens)
    with_ts = timestamp_begin is not None
    no_ts_id = (no_timestamps_id if no_timestamps_id is not None
                else (timestamp_begin - 1 if with_ts else 0))
    if fused is None:
        fused = _fused_default(cfg)
    elif fused and not _fused_head_dim_ok(cfg):
        raise ValueError(
            f"fused decode requires 64-dim heads, got "
            f"{cfg.d_model // cfg.decoder_heads} "
            f"(d_model={cfg.d_model}, heads={cfg.decoder_heads})")
    if fused and adapters is not None:
        from ..training.lora import merge_adapters
        params = merge_adapters(params, adapters)
        adapters = None

    enc_out = W.encode(params, mel, cfg, adapters, compute_dtype,
                       attn_impl="auto")  # inference: flash where it wins
    cross_kv = W.precompute_cross_kv(params, enc_out, cfg, adapters)
    if kv_int8:
        cross_kv = W.quantize_cross_kv(cross_kv)
    if fused:
        params = _cast_decoder_weights(params, compute_dtype)
        cross_kv, s_real, cache_len = _prepare_fused(
            enc_out, cross_kv, cfg, max_length, compute_dtype)
    else:
        cache_len = max_length
    if w_int8:
        params = _quantize_decoder_weights(params)
    cache = W.init_cache(cfg, B, cache_len, dtype=compute_dtype, dense=fused)

    def step_fn(cur, t, cache):
        if fused:
            return W.decode_step_fused(params, cur, t, cache, cross_kv,
                                       cfg, s_real, compute_dtype)
        return W.decode_step(params, cur, t, cache, cross_kv, cfg,
                             adapters, compute_dtype)

    tokens0 = jnp.full((B, max_length), eot, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(forced[0])

    def cond(carry):
        t, tokens, cache, finished, last_ts = carry
        return jnp.logical_and(t < max_length - 1, ~jnp.all(finished))

    def body(carry):
        t, tokens, cache, finished, last_ts = carry
        cur = jax.lax.dynamic_index_in_dim(tokens, t, axis=1, keepdims=False)
        logits, cache = step_fn(cur, t, cache)
        if bias is not None:
            logits = logits + bias
        is_begin = (t + 1) == n_forced
        if begin_bias is not None:
            logits = jnp.where(is_begin, logits + begin_bias, logits)
        if with_ts:
            prev2 = jax.lax.dynamic_index_in_dim(
                tokens, jnp.maximum(t - 1, 0), axis=1, keepdims=False)
            # HF treats the penultimate token as a timestamp while fewer
            # than 2 tokens have been sampled, so the initial segment-open
            # timestamp is followed by text
            sampled = t + 1 - n_forced
            prev2 = jnp.where(sampled < 2, timestamp_begin, prev2)
            logits = _apply_timestamp_rules(
                logits, cur, prev2, last_ts, is_begin,
                timestamp_begin, eot, no_ts_id)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # forced prefix overrides the argmax while t+1 < n_forced
        in_prefix = (t + 1) < n_forced
        forced_tok = forced[jnp.minimum(t + 1, n_forced - 1)]
        nxt = jnp.where(in_prefix, forced_tok, nxt)
        nxt = jnp.where(finished, eot, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t + 1))
        if with_ts:
            last_ts = jnp.where(nxt >= timestamp_begin, nxt, last_ts)
        finished = jnp.logical_or(finished, jnp.logical_and(~in_prefix, nxt == eot))
        return t + 1, tokens, cache, finished, last_ts

    t_final, tokens, _, finished, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens0, cache, jnp.zeros((B,), bool),
                     jnp.zeros((B,), jnp.int32)))

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
                begin_suppress_tokens: Optional[Sequence[int]] = None,
                timestamp_begin: Optional[int] = None,
                no_timestamps_id: Optional[int] = None,
                kv_int8: bool = False,
                w_int8: bool = False,
                fused: Optional[bool] = None) -> Tuple[jax.Array, jax.Array]:
    """Beam search via flattened (B*num_beams) batch; returns best beam's
    (tokens (B, max_length), lengths (B,)).

    Token-level parity with HF `generate(num_beams=K)` (transformers 4.5x
    BeamSearchScorer semantics, the machinery the reference drives through
    generation_num_beams, custom_seq2seq_trainers.py:235-243):

    - 2K candidates per step; eos candidates within the top K are added to
      the finished set (beyond rank K they are dropped), and the K running
      beams are the best K NON-eos candidates — a finishing beam never
      shrinks the live frontier.
    - finished score = summed logprob (incl. eos) / generated_len**penalty
      with generated_len EXCLUDING the forced prompt (HF's
      `cur_len - decoder_prompt_len`, BeamHypotheses.add).
    - per-batch done (early_stopping=False heuristic): K finished hyps AND
      worst kept ≥ best candidate / generated_len**penalty
      (BeamHypotheses.is_done); the loop stops when every batch is done.
    - at max length, NOT-done batches fold their running beams into the
      finished set at the final generated length (BeamSearchScorer.finalize).

    begin_suppress_tokens, the timestamp grammar and the fused Pallas step
    behave as in greedy_decode.
    """
    B = mel.shape[0]
    K = num_beams
    eot = cfg.eos_token_id
    forced = jnp.asarray(list(forced_tokens), jnp.int32)
    n_forced = int(forced.shape[0])
    NEG = jnp.float32(-1e9)
    bias = _suppress_bias(cfg.vocab_size, suppress_tokens)
    begin_bias = _suppress_bias(cfg.vocab_size, begin_suppress_tokens)
    with_ts = timestamp_begin is not None
    no_ts_id = (no_timestamps_id if no_timestamps_id is not None
                else (timestamp_begin - 1 if with_ts else 0))
    if fused is None:
        # the ancestry beam kernel unrolls its per-query loop — quadratic
        # compile time/MXU work in K — so wide beams take the reorder path
        fused = _fused_default(cfg) and K <= 8
    elif fused and K > 8:
        raise ValueError(
            f"fused beam decode is tuned for num_beams <= 8 (got {K}); "
            "pass fused=False (cache-reorder path) for wider beams")
    elif fused and not _fused_head_dim_ok(cfg):
        raise ValueError(
            f"fused decode requires 64-dim heads, got "
            f"{cfg.d_model // cfg.decoder_heads} "
            f"(d_model={cfg.d_model}, heads={cfg.decoder_heads})")
    # A/B escape hatch (benchmarks/bench_decode.py --beam_reorder): run the
    # fused Pallas kernels but with the CONVENTIONAL per-step full-cache
    # beam reorder (HF generate's `_reorder_cache`, which the reference
    # inherits) instead of the ancestry-masked kernel — isolates the
    # ancestry kernel's win with every other kernel/layout equal.
    # Measured numbers: ARCHITECTURE.md round-5 section.
    reorder = fused and os.environ.get("ASR_TPU_BEAM_REORDER", "0") == "1"
    if fused and adapters is not None:
        from ..training.lora import merge_adapters
        params = merge_adapters(params, adapters)
        adapters = None

    # cross K/V stays at B rows — the K hypotheses of an utterance share
    # their cross-attention K/V (cross_group in the step fns). Replicating
    # it per beam row (jnp.repeat(enc_out, K)) costs K× the decode's
    # dominant memory AND K× its dominant HBM read: large-v3 bs16·beam4
    # per-row cross KV alone is 15.7 GB of the 15.75 GB chip.
    enc_out = W.encode(params, mel, cfg, adapters, compute_dtype)
    cross_kv = W.precompute_cross_kv(params, enc_out, cfg, adapters)
    if kv_int8:
        cross_kv = W.quantize_cross_kv(cross_kv)
    if fused:
        params = _cast_decoder_weights(params, compute_dtype)
        cross_kv, s_real, cache_len = _prepare_fused(
            enc_out, cross_kv, cfg, max_length, compute_dtype)
    else:
        cache_len = max_length
    if w_int8:
        params = _quantize_decoder_weights(params)
    cache = W.init_cache(cfg, B * K, cache_len, dtype=compute_dtype,
                         dense=fused)

    def step_fn(cur, t, cache, anc=None):
        if fused:
            return W.decode_step_fused(params, cur, t, cache, cross_kv,
                                       cfg, s_real, compute_dtype,
                                       ancestry=anc, cross_group=K)
        return W.decode_step(params, cur, t, cache, cross_kv, cfg,
                             adapters, compute_dtype, cross_group=K)

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

    # beam-ancestry map (fused path): anc[b, k, τ] = the beam ROW whose
    # unpermuted cache slot τ holds hypothesis (b, k)'s history — gathered
    # on the beam axis each step (B·K·cache_len·4 B, ~64 KB at bs 8 /
    # beam 4 / cache 512) so the CACHE never is (the
    # conventional full-cache reorder costs ~1.3 GB/step at large-v3
    # beam-4; see ops/decoder_fused.fused_attn_beam)
    anc0 = jnp.zeros((B, K, cache_len), jnp.int32)
    own_rows = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, 1))

    def body(carry):
        (t, tokens, cache, scores, fin_tokens, fin_scores, fin_lens,
         last_ts, done, anc) = carry
        cur = jax.lax.dynamic_index_in_dim(
            tokens.reshape(B * K, max_length), t, axis=1, keepdims=False)
        if fused and not reorder:
            # this step writes each row's own K/V at position t
            anc = jax.lax.dynamic_update_slice(anc, own_rows, (0, 0, t))
            logits, new_cache = step_fn(cur, t, cache, anc)
        else:
            logits, new_cache = step_fn(cur, t, cache)
        if bias is not None:
            logits = logits + bias
        is_begin = (t + 1) == n_forced
        if begin_bias is not None:
            logits = jnp.where(is_begin, logits + begin_bias, logits)
        if with_ts:
            prev2 = jax.lax.dynamic_index_in_dim(
                tokens.reshape(B * K, max_length), jnp.maximum(t - 1, 0),
                axis=1, keepdims=False)
            sampled = t + 1 - n_forced  # see greedy_decode
            prev2 = jnp.where(sampled < 2, timestamp_begin, prev2)
            logits = _apply_timestamp_rules(
                logits.astype(jnp.float32), cur, prev2,
                last_ts.reshape(B * K), is_begin,
                timestamp_begin, eot, no_ts_id)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, K, -1)
        V = logp.shape[-1]

        in_prefix = (t + 1) < n_forced
        forced_tok = forced[jnp.minimum(t + 1, n_forced - 1)]
        # during the forced prefix only the forced token is allowed
        prefix_mask = jnp.where(
            jnp.arange(V)[None, None, :] == forced_tok, 0.0, NEG)
        logp = jnp.where(in_prefix, prefix_mask, logp)

        # HF cur_len at this point is t+1 (positions 0..t are filled);
        # generated_len excludes the forced prompt. At the first free
        # position it is 0 → x/0 = -inf for the (begin-suppressed in real
        # configs) eos-first edge, which keeps that hyp out, matching the
        # reference setups where begin_suppress_tokens forbids it.
        gen_len = (t + 1.0 - n_forced) ** length_penalty

        # 2K candidates per step (HF beam_search's top_k(2*num_beams))
        cand = scores[:, :, None] + logp                      # (B, K, V)
        flat = cand.reshape(B, K * V)
        top_scores2, top_idx2 = jax.lax.top_k(flat, 2 * K)    # (B, 2K)
        beam_idx2 = top_idx2 // V
        tok_idx2 = (top_idx2 % V).astype(jnp.int32)
        ended2 = jnp.logical_and(tok_idx2 == eot, ~in_prefix)  # (B, 2K)

        # finished adds: eos candidates at rank < K only (HF skips eos
        # beyond the top num_beams); frozen once the batch is done
        rank_ok = (jnp.arange(2 * K) < K)[None, :]
        fin_add = jnp.logical_and(ended2, rank_ok)
        fin_add = jnp.logical_and(fin_add, ~done[:, None])
        cand_fin_scores = jnp.where(fin_add, top_scores2 / gen_len, NEG)
        cand_fin_tokens = gather_beams(tokens, beam_idx2)     # (B, 2K, T)
        cand_fin_tokens = jax.lax.dynamic_update_slice(
            cand_fin_tokens, tok_idx2[:, :, None], (0, 0, t + 1))
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin_scores], axis=1)
        all_fin_tokens = jnp.concatenate([fin_tokens, cand_fin_tokens], axis=1)
        all_fin_lens = jnp.concatenate(
            [fin_lens, jnp.full((B, 2 * K), t + 2, jnp.int32)], axis=1)
        keep_scores, keep_idx = jax.lax.top_k(all_fin_scores, K)
        fin_scores = keep_scores
        fin_tokens = gather_beams(all_fin_tokens, keep_idx)
        fin_lens = jnp.take_along_axis(all_fin_lens, keep_idx, axis=1)

        # running frontier: the best K NON-eos candidates of the 2K
        run_scores2 = jnp.where(ended2, NEG * 2.0, top_scores2)
        top_scores, run_rank = jax.lax.top_k(run_scores2, K)  # (B, K)
        beam_idx = jnp.take_along_axis(beam_idx2, run_rank, axis=1)
        tok_idx = jnp.take_along_axis(tok_idx2, run_rank, axis=1)

        tokens = gather_beams(tokens, beam_idx)
        tokens = jax.lax.dynamic_update_slice(
            tokens, tok_idx[:, :, None], (0, 0, t + 1))
        if with_ts:
            last_ts = jnp.take_along_axis(last_ts, beam_idx, axis=1)
            last_ts = jnp.where(tok_idx >= timestamp_begin, tok_idx, last_ts)

        if fused and not reorder:
            # gather the ancestry rows, not the cache
            anc = jnp.take_along_axis(anc, beam_idx[:, :, None], axis=1)
        else:
            # conventional path: reorder the FULL cache on the beam dim,
            # (L, B*K, T, ...) — both the XLA layout and the fused dense
            # (L, B*K, T, d) layout gather on axis 1
            flat_idx = (jnp.arange(B)[:, None] * K + beam_idx).reshape(-1)
            new_cache = {k: v[:, flat_idx] for k, v in new_cache.items()}

        # per-batch done (BeamHypotheses.is_done, early_stopping=False):
        # K finished hyps AND the worst kept beats the best candidate's
        # attainable normalized score at this length
        n_fin = jnp.sum(fin_scores > NEG / 2, axis=1)
        attainable = top_scores2[:, 0] / gen_len
        done = jnp.logical_or(done, jnp.logical_and(
            n_fin >= K, jnp.min(fin_scores, axis=1) >= attainable))

        scores = top_scores
        return (t + 1, tokens, new_cache, scores, fin_tokens, fin_scores,
                fin_lens, last_ts, done, anc)

    def cond(carry):
        t = carry[0]
        done = carry[-2]
        return jnp.logical_and(t < max_length - 1, ~jnp.all(done))

    carry = (jnp.int32(0), tokens0, cache, scores0, fin_tokens0, fin_scores0,
             fin_lens0, jnp.zeros((B, K), jnp.int32), jnp.zeros((B,), bool),
             anc0)
    (t, tokens, _, scores, fin_tokens, fin_scores, fin_lens,
     _, done, _) = jax.lax.while_loop(cond, body, carry)

    # finalize (BeamSearchScorer.finalize): batches not done at max length
    # fold their K running beams into the finished set at the final
    # generated length (no eos; length = t+1 filled positions)
    final_gen = jnp.maximum(t + 1.0 - n_forced, 1.0) ** length_penalty
    run_fin_scores = jnp.where(done[:, None], NEG, scores / final_gen)
    all_scores = jnp.concatenate([fin_scores, run_fin_scores], axis=1)
    all_tokens = jnp.concatenate([fin_tokens, tokens], axis=1)
    all_lens = jnp.concatenate(
        [fin_lens, jnp.full((B, K), t + 1, jnp.int32)], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    out_tokens = jnp.take_along_axis(
        all_tokens, best[:, None, None], axis=1)[:, 0]
    out_lens = jnp.take_along_axis(all_lens, best[:, None], axis=1)[:, 0]
    return out_tokens, out_lens


def make_decode_fn(cfg: WhisperConfig, forced_tokens: Sequence[int],
                   max_length: int = 225, num_beams: int = 1,
                   length_penalty: float = 1.0,
                   compute_dtype=jnp.bfloat16,
                   suppress_tokens: Optional[Sequence[int]] = None,
                   begin_suppress_tokens: Optional[Sequence[int]] = None,
                   timestamp_begin: Optional[int] = None,
                   no_timestamps_id: Optional[int] = None,
                   kv_int8: bool = False, w_int8: bool = False,
                   out_sharding=None,
                   fused: Optional[bool] = None,
                   mesh=None):
    """jit-wrapped decode entry used by the trainer's eval and offline eval.

    out_sharding: pass a fully-replicated NamedSharding in multi-host runs
    so every process can read the full token matrix for WER scoring.
    mesh: pass the training Mesh to run the fused Pallas decode per-shard
    on pure-DP multi-chip meshes (see _use_fused_multichip)."""
    kw = dict(suppress_tokens=suppress_tokens,
              begin_suppress_tokens=begin_suppress_tokens,
              timestamp_begin=timestamp_begin,
              no_timestamps_id=no_timestamps_id,
              kv_int8=kv_int8, w_int8=w_int8, fused=fused)
    if num_beams <= 1:
        def fn(params, mel, adapters=None):
            return greedy_decode(params, mel, cfg, forced_tokens, max_length,
                                 adapters, compute_dtype, **kw)
    else:
        def fn(params, mel, adapters=None):
            return beam_decode(params, mel, cfg, forced_tokens, max_length,
                               num_beams, length_penalty, adapters,
                               compute_dtype, **kw)

    if mesh is not None and _fused_head_dim_ok(cfg) \
            and _use_fused_multichip(mesh, fused):
        # Pallas calls are not auto-partitionable, so a multi-device jit
        # would silently fall back to the XLA decode path (2.2x slower,
        # ARCHITECTURE.md). shard_map over the data axis runs the fused
        # kernels per-shard: params replicated, batch sharded, decode has
        # no cross-batch communication. Pure-DP meshes only (a
        # model-parallel mesh keeps the auto-sharded XLA path).
        from jax.sharding import PartitionSpec as P
        kw["fused"] = True
        body = jax.shard_map(fn, mesh=mesh,
                             in_specs=(P(), P("data"), P()),
                             out_specs=(P("data"), P("data")),
                             check_vma=False)
        def fn(params, mel, adapters=None):  # noqa: F811
            return body(params, mel, adapters)

    if out_sharding is not None:
        return jax.jit(fn, out_shardings=out_sharding)
    return jax.jit(fn)


def _use_fused_multichip(mesh, fused: Optional[bool]) -> bool:
    """True when the fused Pallas decode should run per-shard under
    shard_map: >1 device on the data axis, no model parallelism (the
    kernels are single-device; TP-sharded params would be gathered), and
    fused not explicitly disabled. Off-TPU this needs fused=True forced
    (CPU-mesh tests run the kernels in interpret mode)."""
    if fused is False:
        return False
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if axes.get("data", 1) <= 1 or axes.get("model", 1) != 1:
        return False
    if fused is True:
        return True
    return jax.default_backend() == "tpu"
