"""Functional JAX Whisper encoder-decoder over explicit param pytrees.

Capability parity with the reference's model layer (HF
`WhisperForConditionalGeneration`, loaded at
finetune/training/models/whisper_models.py:79-113), re-designed TPU-first:

- Params are a plain pytree; per-layer weights are STACKED along a leading
  axis and the layer loop is a `lax.scan`, so compile time is O(1) in depth
  (32 layers for large-v3) and XLA sees one fused layer body.
- All matmuls run in a configurable compute dtype (bf16 on TPU) with fp32
  layernorm statistics and fp32 master params kept by the optimizer.
- LoRA / AdaLoRA adapters are a parallel pytree threaded through the same
  scan (training/lora.py builds them); "frozen base" simply means the base
  tree is not in the grad argnums — no autograd hooks needed (the reference
  needs a conv1 forward hook for this, trainers.py:510-515).
- Incremental decoding uses a preallocated KV cache updated with
  `lax.dynamic_update_slice` inside the layer scan (evaluation/decode.py).

Weight import from HF checkpoints: models/convert_hf.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .configs import WhisperConfig
from ..ops.attention import attention as _attention_dispatch

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------

def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoid table (sin | cos concatenated on channels)."""
    assert channels % 2 == 0
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _dense_init(key, d_in, d_out, layers=None):
    shape = (d_in, d_out) if layers is None else (layers, d_in, d_out)
    scale = 1.0 / np.sqrt(d_in)
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def _zeros(*shape):
    return jnp.zeros(shape, jnp.float32)


def _ones(*shape):
    return jnp.ones(shape, jnp.float32)


def _init_attn(key, L, d, heads):
    ks = jax.random.split(key, 4)
    return {
        "q": {"w": _dense_init(ks[0], d, d, L), "b": _zeros(L, d)},
        "k": {"w": _dense_init(ks[1], d, d, L)},  # no bias, as in Whisper
        "v": {"w": _dense_init(ks[2], d, d, L), "b": _zeros(L, d)},
        "o": {"w": _dense_init(ks[3], d, d, L), "b": _zeros(L, d)},
    }


def _init_mlp(key, L, d, ff):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": {"w": _dense_init(k1, d, ff, L), "b": _zeros(L, ff)},
        "fc2": {"w": _dense_init(k2, ff, d, L), "b": _zeros(L, d)},
    }


def _init_ln(L, d):
    if L is None:
        return {"scale": _ones(d), "bias": _zeros(d)}
    return {"scale": _ones(L, d), "bias": _zeros(L, d)}


def init_params(rng: jax.Array, cfg: WhisperConfig) -> Params:
    """Random init matching Whisper's layout (for tests and from-scratch runs)."""
    k_enc, k_dec, k_conv1, k_conv2, k_embed = jax.random.split(rng, 5)
    L_e, L_d, d, ff = cfg.encoder_layers, cfg.decoder_layers, cfg.d_model, cfg.d_ff

    ke1, ke2 = jax.random.split(k_enc)
    encoder = {
        "conv1": {"w": _dense_init(k_conv1, cfg.num_mel_bins * 3, d).reshape(3, cfg.num_mel_bins, d),
                  "b": _zeros(d)},
        "conv2": {"w": _dense_init(k_conv2, d * 3, d).reshape(3, d, d), "b": _zeros(d)},
        "layers": {
            "ln1": _init_ln(L_e, d),
            "attn": _init_attn(ke1, L_e, d, cfg.encoder_heads),
            "ln2": _init_ln(L_e, d),
            "mlp": _init_mlp(ke2, L_e, d, ff),
        },
        "ln_post": _init_ln(None, d),
    }

    kd1, kd2, kd3 = jax.random.split(k_dec, 3)
    decoder = {
        "embed": jax.random.normal(k_embed, (cfg.vocab_size, d), jnp.float32) * 0.02,
        "pos": jax.random.normal(jax.random.fold_in(k_embed, 1),
                                 (cfg.max_target_positions, d), jnp.float32) * 0.02,
        "layers": {
            "ln1": _init_ln(L_d, d),
            "self_attn": _init_attn(kd1, L_d, d, cfg.decoder_heads),
            "ln2": _init_ln(L_d, d),
            "cross_attn": _init_attn(kd2, L_d, d, cfg.decoder_heads),
            "ln3": _init_ln(L_d, d),
            "mlp": _init_mlp(kd3, L_d, d, ff),
        },
        "ln_post": _init_ln(None, d),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        # fixed sinusoids; stored so HF-imported tables round-trip exactly
        "encoder_pos": jnp.asarray(sinusoidal_positions(cfg.max_source_positions, d)),
    }


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _ckpt(fn):
    """Layer rematerialization saving the NAMED activations chosen by
    `_remat_save_names()` plus the scan carry (layer input).

    Round 2 used dots_with_no_batch_dims_saveable (+4% on the decoder-only
    LoRA step), but at encoder scale (T=1500, 32 layers) that policy's
    per-layer dot saves are ~20 GB at bs 8 — and for the W8A8 int8 base it
    saves the RAW s8xs8->s32 MXU outputs at 4 B/elem (fc1 alone:
    s32[32,8,1500,5120] = 7.3 GB), which OOMed the 16 GB v5e the moment
    encoder adapters made the encoder backward real (round-3 parity
    placement). Named bf16 save points instead give byte-exact control:

    - "blk_mid" (always saved): the residual stream between the half
      blocks (~1.9 GB whole encoder) — the backward recomputes each half
      block from its nearest residual.
    - "enc_qkv"/"enc_mlp_h" (default-saved on top): the encoder's q/k/v
      projections (the dense-attention VJP's residuals) and fc1 output
      (the gelu VJP's residual) — +7 GB at large-v3 bs 8, and the
      backward recomputes NO base matmul at all (only layernorms/gelu on
      the VPU). Frozen-base PEFT needs no other fwd activations: dx
      through a frozen projection is dy @ Wᵀ, input-free.
    - "dec_qkv"/"dec_xkv"/"dec_mlp_h": same for the decoder (cheap at
      T≤448; ~1 GB).

    Override with ASR_TPU_REMAT_SAVE=mid | enc | enc+dec. Default
    enc+dec; on the parity large-v3 step all three measured within ±1%
    on v5e (the recompute the extra saves eliminate costs about the same
    as their ~8 GB of HBM write+read traffic), with enc+dec ahead by a
    hair once the attention residuals were saved in kernel layout."""
    import os
    mode = os.environ.get("ASR_TPU_REMAT_SAVE", "enc+dec")
    names = ["blk_mid"]
    if mode in ("enc", "enc+dec"):
        names += ["enc_qkv", "enc_mlp_h"]
    if mode == "enc+dec":
        names += ["dec_qkv", "dec_xkv", "dec_mlp_h"]
    return jax.checkpoint(
        fn, policy=jax.checkpoint_policies.save_only_these_names(*names))


def _mid(x: jax.Array) -> jax.Array:
    """Tag a residual-stream point as a saved rematerialization boundary."""
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(x, "blk_mid")


def _named(x: jax.Array, name: Optional[str]) -> jax.Array:
    """Optionally tag an activation for the remat policy (free if the
    active policy doesn't save the name)."""
    if name is None:
        return x
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(x, name)


def _pet(dtype) -> jnp.dtype:
    """Accumulation dtype for matmuls: fp32, unless already wider (x64 tests)."""
    return jnp.promote_types(dtype, jnp.float32)


def layer_norm(x: jax.Array, ln: Params, eps: float = 1e-5) -> jax.Array:
    """LayerNorm with fp32 statistics regardless of compute dtype."""
    dtype = x.dtype
    acc = _pet(dtype)
    x32 = x.astype(acc)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln["scale"].astype(acc) + ln["bias"].astype(acc)
    return y.astype(dtype)


def _base_matmul_multi(x: jax.Array, ps: tuple) -> list:
    """[x @ W_p for p in ps] as ONE matmul over concatenated output
    channels. Two wins measured on v5e: a (N,1280)x(1280,1280) matmul runs
    at ~66% of the rate of the wider (1280, 3x1280) shape, and the W8A8
    path quantizes the shared activation ONCE instead of once per
    projection (the per-row amax/round pass costs as much VPU time as a
    whole projection). The backward collapses the three dx matmuls into
    one for free via the same concatenated weight."""
    if all("w_q8" in p for p in ps):
        from ..ops import quant as _quant
        w8 = jnp.concatenate([p["w_q8"] for p in ps], axis=-1) \
            if len(ps) > 1 else ps[0]["w_q8"]
        ws = jnp.concatenate(
            [p["w_scale"].reshape(1, -1) for p in ps], axis=-1)
        if _quant.int8_compute_enabled():
            # opt-in W8A8: s8xs8->s32 on the MXU (ops/quant.int8_matmul)
            y = _quant.int8_matmul(x, w8, ws)
        else:
            y = x @ (w8.astype(x.dtype) * ws.astype(x.dtype))
    else:
        w = jnp.concatenate([p["w"] for p in ps], axis=-1).astype(x.dtype) \
            if len(ps) > 1 else ps[0]["w"].astype(x.dtype)
        y = x @ w
    outs = []
    off = 0
    for p in ps:
        d = (p["w_q8"] if "w_q8" in p else p["w"]).shape[-1]
        yp = jax.lax.slice_in_dim(y, off, off + d, axis=-1)
        off += d
        outs.append(yp)
    return outs


def _lora_dropped_input(x: jax.Array, rate: float,
                        rng: Optional[jax.Array]) -> jax.Array:
    """lora_dropout on the ADAPTER INPUT (peft semantics; the frozen base
    path never sees dropout). Hardware RNG (lax.rng_bit_generator)
    instead of threefry bernoulli: the per-site threefry masks measurably
    cost 10% of the large-v3 LoRA step (37 ms) on v5e; the uint32
    threshold gives P(keep) = 1 - rate to within 2^-32.
    REPRODUCIBILITY: the DEFAULT algorithm's bit stream is
    backend-dependent, so dropout masks are deterministic per backend but
    not identical across TPU/CPU; the loss/WER statistics are seed-stable
    either way. Pin RandomAlgorithm.RNG_THREE_FRY here if cross-backend
    bit-parity ever matters more than the 10% step-time win."""
    if rng is None or rate <= 0.0:
        return x
    key4 = jnp.concatenate([rng, rng]).astype(jnp.uint32)
    _, bits = jax.lax.rng_bit_generator(key4, x.shape, jnp.uint32)
    thresh = np.uint32(round(rate * 4294967296.0))
    return jnp.where(bits >= thresh, x / (1.0 - rate), 0.0).astype(x.dtype)


def _lora_delta(x: jax.Array, lora: Params, dropout_rate: float,
                dropout_rng: Optional[jax.Array]) -> jax.Array:
    """Low-rank adapter delta scaling * ((drop(x)@a)*e) @ b.

    Adapter format (see training/lora.py): {"a": (d_in, r), "e": (r,),
    "b": (r, d_out), "scaling": ()} — plain LoRA with e == 1, AdaLoRA's
    SVD form otherwise. When a dropout rng is given (training), the
    ADAPTER INPUT is dropped out, matching peft's lora_dropout (reference
    trains with lora_dropout=0.05, trainers.py:527)."""
    a = lora["a"].astype(x.dtype)
    b = lora["b"].astype(x.dtype)
    e = lora["e"].astype(x.dtype)
    xa = _lora_dropped_input(x, dropout_rate, dropout_rng)
    return ((xa @ a) * e) @ b * lora["scaling"].astype(x.dtype)


def dense(x: jax.Array, p: Params, lora: Optional[Params] = None,
          dropout_rate: float = 0.0,
          dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """x @ W (+ b) with an optional low-rank adapter delta (_lora_delta).

    Accepts int8-quantized weights ({"w_q8", "w_scale"}, ops/quant.py) for
    the frozen PEFT base; XLA fuses the dequant into the matmul operand.
    """
    y = _base_matmul_multi(x, (p,))[0]
    if lora is not None:
        y = y + _lora_delta(x, lora, dropout_rate, dropout_rng)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _split_heads(x: jax.Array, heads: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, heads, d // heads)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, t, h, hd = x.shape
    return x.reshape(b, t, h * hd)


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              mask: Optional[jax.Array] = None) -> jax.Array:
    """Softmax attention over (B, T, H, hd) tensors; softmax in fp32."""
    hd = q.shape[-1]
    scale = hd ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=_pet(q.dtype))
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits.astype(_pet(q.dtype)), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def mha(x: jax.Array, kv_src: jax.Array, p: Params, heads: int,
        mask: Optional[jax.Array] = None,
        lora: Optional[Params] = None,
        causal: bool = False, impl: str = "auto",
        lora_dropout: float = 0.0,
        dropout_rng: Optional[jax.Array] = None,
        save_tag: Optional[str] = None) -> jax.Array:
    """Full (non-incremental) multi-head attention.

    Dispatches to Pallas flash attention on TPU for long unmasked/causal
    sequences (ops/attention.py), XLA softmax attention otherwise.

    save_tag names the q/k/v projections for the remat policy (_ckpt):
    they are exactly the attention VJP's residuals, so saving them means
    the layer backward recomputes no projection matmul.
    """
    lq = lora.get("q") if lora else None
    lv = lora.get("v") if lora else None
    rq = rv = None
    if dropout_rng is not None and lora_dropout > 0.0:
        rq, rv = jax.random.split(dropout_rng)
    # NOTE: fusing q/k/v into one wide matmul (shared activation quant +
    # (D, 3D) int8 dot) measured 4% SLOWER end-to-end on v5e — the
    # per-layer weight concat and gradient re-concat copies outweigh the
    # quant sharing XLA already amortizes. Kept as three matmuls.
    q = _split_heads(dense(x, p["q"], lq, lora_dropout, rq), heads)
    k = _split_heads(dense(kv_src, p["k"]), heads)
    v = _split_heads(dense(kv_src, p["v"], lv, lora_dropout, rv), heads)
    # save_tag applies to whatever layout the chosen attention path's VJP
    # consumes (ops/attention.attention) — for the dense Pallas path that
    # is the padded/transposed kernel layout, so the remat'd backward
    # skips the per-layer pad+transpose recompute too
    out = _attention_dispatch(q, k, v, mask, causal=causal, impl=impl,
                              save_tag=save_tag)
    return dense(_merge_heads(out), p["o"])


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def mlp_block(x: jax.Array, p: Params,
              save_tag: Optional[str] = None) -> jax.Array:
    # the tagged fc1 output is the gelu VJP's residual (see _ckpt)
    return dense(_gelu(_named(dense(x, p["fc1"]), save_tag)), p["fc2"])


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array, stride: int) -> jax.Array:
    """(B, T, C) conv with SAME-style padding 1, kernel 3.

    Runs in the operands' common (fp32) dtype — the stem is <0.5% of encoder
    FLOPs and fp32 keeps the conv VJP dtype-consistent under bf16 compute.
    """
    acc = _pet(x.dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(acc), w.astype(acc), window_strides=(stride,),
        padding=[(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"))
    return y + b.astype(acc)


def _fuse_qkv_weights(attn: Params) -> Params:
    """Concatenate the (layer-stacked) q/k/v projection weights into ONE
    wide (L, d, 3d) projection, built OUTSIDE the layer scan so the
    concat costs one pass over the frozen weights per step (~0.4 ms at
    large-v3 int8) instead of per-layer copies — the per-layer weight
    concat is why the earlier in-scan qkv fusion measured -4% (see the
    NOTE in mha). k_proj carries no bias in Whisper (HF
    modeling_whisper.WhisperAttention k_proj bias=False): its slot in the
    fused bias is zeros."""
    ps = [attn["q"], attn["k"], attn["v"]]
    fused: Params = {}
    if all("w_q8" in p for p in ps):
        fused["w_q8"] = jnp.concatenate([p["w_q8"] for p in ps], axis=-1)
        fused["w_scale"] = jnp.concatenate([p["w_scale"] for p in ps],
                                           axis=-1)
    else:
        # mixed quantized/float q/k/v cannot be fused into one matmul;
        # unreachable via quantize_tree_int8 (quantizes all three
        # together) but guard explicitly rather than KeyError on p['w']
        assert not any("w_q8" in p for p in ps), \
            "mixed int8/float q/k/v projections cannot be qkv-fused"
        fused["w"] = jnp.concatenate([p["w"] for p in ps], axis=-1)
    if any("b" in p for p in ps):
        ref = next(p["b"] for p in ps if "b" in p)
        fused["b"] = jnp.concatenate(
            [p["b"] if "b" in p else jnp.zeros_like(ref) for p in ps],
            axis=-1)
    return fused


def _lora_delta_qkv(x: jax.Array, lora: Params, d: int, rate: float,
                    rngs: tuple) -> jax.Array:
    """Q/V low-rank deltas emitted directly in the fused (B, T, 3d) qkv
    layout as ONE block matmul: delta = [xa_q@Aq*eq | xa_v@Av*ev] @ B'
    where B' stacks Bq*scale into columns 0:d and Bv*scale into 2d:3d.
    k's block (and each adapter's foreign block) is structurally zero, so
    the extra accumulation terms are exact zeros — the result matches the
    per-adapter deltas bar the scale-fold rounding (scaling folded into
    B' instead of applied after the matmul)."""
    xs, bs = [], []
    for name, off, rng in (("q", 0, rngs[0]), ("v", 2, rngs[1])):
        la = lora.get(name)
        if la is None:
            continue
        a = la["a"].astype(x.dtype)
        e = la["e"].astype(x.dtype)
        b = (la["b"] * la["scaling"]).astype(x.dtype)
        xa = _lora_dropped_input(x, rate, rng)
        xs.append((xa @ a) * e)
        wide = jnp.zeros((b.shape[0], 3 * d), b.dtype)
        bs.append(jax.lax.dynamic_update_slice(wide, b, (0, off * d)))
    if not xs:
        return jnp.zeros((), x.dtype)
    if len(xs) == 1:
        return xs[0] @ bs[0]
    return jnp.concatenate(xs, axis=-1) @ jnp.concatenate(bs, axis=0)


def _mha_fused_qkv(x: jax.Array, p: Params, fw: Params, heads: int,
                   lora: Optional[Params] = None,
                   lora_dropout: float = 0.0,
                   dropout_rng: Optional[jax.Array] = None,
                   save_tag: Optional[str] = None) -> jax.Array:
    """Encoder self-attention with the q/k/v projections fused into ONE
    wide matmul whose (B, T, 3d) output feeds the packed dense kernel
    directly (ops/encoder_attention.dense_attention_qkv).

    Measured wins vs three projections + the packed kernel (v5e,
    large-v3 parity step): the wide int8 matmul runs at a higher MXU
    rate than three narrow ones AND quantizes the shared activation
    once; the remat save point ("enc_qkv") becomes ONE coalesced
    (B, T, 3d) buffer; the backward's three dx matmuls collapse into
    one wide GEMM. The per-layer weight concat that sank the earlier
    in-scan fusion attempt is hoisted to _fuse_qkv_weights (per step)."""
    d = x.shape[-1]
    y = _base_matmul_multi(x, (fw,))[0]                     # (B, T, 3d)
    if lora is not None and ("q" in lora or "v" in lora):
        rq = rv = None
        if dropout_rng is not None and lora_dropout > 0.0:
            rq, rv = jax.random.split(dropout_rng)
        y = y + _lora_delta_qkv(x, lora, d, lora_dropout, (rq, rv))
    if "b" in fw:
        y = y + fw["b"].astype(x.dtype)
    y = _named(y, save_tag)
    from ..ops.encoder_attention import dense_attention_qkv
    out = dense_attention_qkv(y, d // heads)
    return dense(out, p["o"])


def _fused_qkv_ok(cfg: WhisperConfig, T: int, impl: str) -> bool:
    """Gate for the fused-qkv encoder path — OPT-IN (default off).

    Measured on v5e at the large-v3 parity config (bs 8, int8 base,
    enc+dec adapters): the fused wide projection + single-buffer save is
    NEUTRAL-TO-NEGATIVE end-to-end (-2.5% on an interleaved bench pair,
    +1.5% on isolated encoder fwd+bwd stages) — the same lesson as the
    fused W8A8 kernel (ops/w8a8_fused.py): XLA already overlaps the
    per-projection activation-quant passes and fuses the save-point
    writes into the producers, while the backward pays a real
    dq/dk/dv concatenate for the single wide dx matmul. Kept as an
    opt-in for shapes/configs where the trade may differ.

    ASR_TPU_FUSED_QKV=auto engages it exactly where the dispatch would
    pick the packed dense kernel (TPU backend, impl auto/dense,
    supported shape); =1 forces it on impl auto/dense (CPU
    interpret-mode tests) but yields to an explicit attn_impl
    xla/flash; =force overrides even an explicit impl (test-only);
    unset/=0 disables."""
    import os
    mode = os.environ.get("ASR_TPU_FUSED_QKV", "0").lower()
    if mode in ("0", "false", "no", "off"):
        return False
    hd = cfg.d_model // cfg.encoder_heads
    if cfg.encoder_heads * hd != cfg.d_model:
        return False
    from ..ops.encoder_attention import fused_qkv_supported
    if not fused_qkv_supported(cfg.encoder_heads, hd, T):
        return False
    if impl not in ("auto", "dense"):
        # an explicit xla/flash request wins over the fused-qkv opt-in;
        # "force" remains a test-only escape hatch that overrides it
        return mode == "force"
    if mode in ("1", "true", "yes", "on", "force"):
        return True
    from ..ops.attention import _flash_available
    return _flash_available()


def encode(params: Params, mel: jax.Array, cfg: WhisperConfig,
           adapters: Optional[Params] = None,
           compute_dtype: jnp.dtype = jnp.bfloat16,
           remat: bool = False, attn_impl: str = "auto",
           lora_dropout: float = 0.0,
           dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """mel (B, frames, n_mels) → encoder states (B, frames//2, d_model)."""
    enc = params["encoder"]
    x = _gelu(_conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], 1))
    x = _gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2))
    x = x.astype(compute_dtype)
    pos = params["encoder_pos"][: x.shape[1]].astype(compute_dtype)
    x = x + pos[None]

    enc_adapters = adapters.get("encoder") if adapters else None
    drop = (enc_adapters is not None and dropout_rng is not None
            and lora_dropout > 0.0)

    layers = enc["layers"]
    if _fused_qkv_ok(cfg, x.shape[1], attn_impl):
        # fused wide qkv projection: weight concat hoisted out of the scan.
        # Drop the now-unused per-layer q/k/v weights from the scanned xs
        # (keep only the output projection) so the scan never streams the
        # dead slices from HBM — correctness must not depend on XLA DCE.
        layers = dict(layers,
                      attn_qkv=_fuse_qkv_weights(layers["attn"]),
                      attn={"o": layers["attn"]["o"]})

    def layer(x, xs):
        lp, la, rng = xs
        h = layer_norm(x, lp["ln1"])
        if "attn_qkv" in lp:
            a = _mha_fused_qkv(h, lp["attn"], lp["attn_qkv"],
                               cfg.encoder_heads, lora=la,
                               lora_dropout=lora_dropout if drop else 0.0,
                               dropout_rng=rng, save_tag="enc_qkv")
        else:
            a = mha(h, h, lp["attn"], cfg.encoder_heads, lora=la,
                    impl=attn_impl,
                    lora_dropout=lora_dropout if drop else 0.0,
                    dropout_rng=rng, save_tag="enc_qkv")
        x = _mid(x + a)
        h = layer_norm(x, lp["ln2"])
        x = x + mlp_block(h, lp["mlp"], save_tag="enc_mlp_h")
        return x, None

    body = _ckpt(layer) if remat else layer
    if enc_adapters is None:
        # scan can't mix None xs with real ones; use a two-arg closure instead
        body2 = (lambda c, lp: body(c, (lp, None, None)))
        x, _ = jax.lax.scan(body2, x, layers)
    elif drop:
        keys = jax.random.split(dropout_rng, cfg.encoder_layers)
        x, _ = jax.lax.scan(body, x, (layers, enc_adapters, keys))
    else:
        body2 = (lambda c, xs2: body(c, (xs2[0], xs2[1], None)))
        x, _ = jax.lax.scan(body2, x, (layers, enc_adapters))
    return layer_norm(x, enc["ln_post"])


# ---------------------------------------------------------------------------
# decoder (teacher-forced / full sequence)
# ---------------------------------------------------------------------------

def decode_train(params: Params, tokens: jax.Array, enc_out: jax.Array,
                 cfg: WhisperConfig, adapters: Optional[Params] = None,
                 compute_dtype: jnp.dtype = jnp.bfloat16,
                 remat: bool = False, attn_impl: str = "auto",
                 lora_dropout: float = 0.0,
                 dropout_rng: Optional[jax.Array] = None,
                 return_hidden: bool = False) -> jax.Array:
    """Teacher-forced decode: tokens (B, T) → logits (B, T, vocab).

    return_hidden: return the post-ln hidden states (B, T, d) instead of
    projecting to the vocab — the fused chunked CE (ops/fused_ce.py) does
    the projection inside the loss so (B, T, V) never materializes."""
    dec = params["decoder"]
    B, T = tokens.shape
    x = dec["embed"].astype(compute_dtype)[tokens]
    x = x + dec["pos"][:T].astype(compute_dtype)[None]

    dec_adapters = adapters.get("decoder") if adapters else None
    drop = (dec_adapters is not None and dropout_rng is not None
            and lora_dropout > 0.0)

    # NOTE: hoisting the cross-attention K/V projections out of the scan
    # (all layers project the same enc_out -> two (B·Tk, d)x(d, L·d)
    # matmuls) measured 2.5% SLOWER end-to-end on v5e despite the better
    # matmul shape: the staged (L, B, Tk, d) outputs are ~2 GB and their
    # relayout to the scan's layer-major order costs more HBM traffic
    # than the small in-scan matmuls cost MXU time. Kept per-layer.
    def layer(x, xs):
        lp, la, rng = xs
        sa_l = la.get("self_attn") if la else None
        ca_l = la.get("cross_attn") if la else None
        r_sa = r_ca = None
        if drop:
            r_sa, r_ca = jax.random.split(rng)
        h = layer_norm(x, lp["ln1"])
        x = _mid(x + mha(h, h, lp["self_attn"], cfg.decoder_heads, lora=sa_l,
                         causal=True, impl=attn_impl,
                         lora_dropout=lora_dropout if drop else 0.0,
                         dropout_rng=r_sa, save_tag="dec_qkv"))
        h = layer_norm(x, lp["ln2"])
        # cross-attention is non-causal with Tk=750 rows: eligible for the
        # dense whole-row kernel even when the causal self-attention is
        # pinned to XLA (decoder_attn_impl="xla", the measured-fastest
        # split for T<=448 causal shapes)
        cross_impl = "auto" if attn_impl == "xla" else attn_impl
        x = _mid(x + mha(h, enc_out, lp["cross_attn"], cfg.decoder_heads,
                         lora=ca_l, impl=cross_impl,
                         lora_dropout=lora_dropout if drop else 0.0,
                         dropout_rng=r_ca, save_tag="dec_xkv"))
        h = layer_norm(x, lp["ln3"])
        x = x + mlp_block(h, lp["mlp"], save_tag="dec_mlp_h")
        return x, None

    body = _ckpt(layer) if remat else layer
    if dec_adapters is None:
        body2 = (lambda c, lp: body(c, (lp, None, None)))
        x, _ = jax.lax.scan(body2, x, dec["layers"])
    elif drop:
        keys = jax.random.split(dropout_rng, cfg.decoder_layers)
        x, _ = jax.lax.scan(body, x, (dec["layers"], dec_adapters, keys))
    else:
        body2 = (lambda c, xs2: body(c, (xs2[0], xs2[1], None)))
        x, _ = jax.lax.scan(body2, x, (dec["layers"], dec_adapters))

    x = layer_norm(x, dec["ln_post"])
    if return_hidden:
        return x
    # tied output projection; logits in fp32 for a stable softmax/loss
    logits = jnp.einsum("btd,vd->btv", x, dec["embed"].astype(compute_dtype),
                        preferred_element_type=_pet(compute_dtype))
    return logits


def forward(params: Params, mel: jax.Array, tokens: jax.Array,
            cfg: WhisperConfig, adapters: Optional[Params] = None,
            compute_dtype: jnp.dtype = jnp.bfloat16,
            remat: bool = False, attn_impl: str = "auto",
            decoder_attn_impl: Optional[str] = None,
            lora_dropout: float = 0.0,
            dropout_rng: Optional[jax.Array] = None,
            return_hidden: bool = False) -> jax.Array:
    """Full teacher-forced forward: (mel, decoder_input_ids) → logits.

    attn_impl selects the ENCODER attention ("xla" | "flash" | "auto"),
    decoder_attn_impl the decoder's (defaults to attn_impl). Measured on
    v5e (large-v3 LoRA step, bs 8): encoder-flash + decoder-XLA is the
    winning split — 21.2 utt/s vs 18.5 all-XLA vs 18.0 all-flash. The
    encoder's 1500-frame softmax materializes f32 (B,H,1500,1500) tensors
    under XLA attention (the profiled backward bottleneck), which flash
    avoids; the decoder's short padded sequences don't amortize flash's
    pad/transpose overhead.
    """
    r_enc = r_dec = None
    if dropout_rng is not None and lora_dropout > 0.0:
        r_enc, r_dec = jax.random.split(dropout_rng)
    enc_out = encode(params, mel, cfg, adapters, compute_dtype, remat,
                     attn_impl, lora_dropout, r_enc)
    dec_impl = attn_impl if decoder_attn_impl is None else decoder_attn_impl
    return decode_train(params, tokens, enc_out, cfg, adapters, compute_dtype,
                        remat, dec_impl, lora_dropout, r_dec,
                        return_hidden=return_hidden)


# ---------------------------------------------------------------------------
# incremental decoding with KV cache (used by evaluation/decode.py)
# ---------------------------------------------------------------------------

def init_cache(cfg: WhisperConfig, batch: int, max_len: int,
               dtype: jnp.dtype = jnp.bfloat16, dense: bool = False) -> Params:
    """dense=True is the decode_step_fused layout (L, B, T, d): the cache
    array must keep ONE shape through the whole token loop — a reshape at
    the step boundary materializes two full cache copies per token (the
    round-2 profile's single largest decode cost, ~6 ms/token at large-v3
    bs 8) because XLA can't alias the while-loop carry through it."""
    L, H, hd = cfg.decoder_layers, cfg.decoder_heads, cfg.d_model // cfg.decoder_heads
    shape = ((L, batch, max_len, H * hd) if dense
             else (L, batch, max_len, H, hd))
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def quantize_cross_kv(cross_kv: Params) -> Params:
    """Opt-in int8 cross-KV for decoding: every autoregressive step re-reads
    the full (L, B, S, H, hd) cross K/V (~2 GB at large-v3 bs 8), which is
    the measured decode bottleneck; int8 with per-(batch, head) scales
    halves that traffic. Dequantization happens in decode_step."""
    out = {}
    for name in ("k", "v"):
        x = cross_kv[name].astype(jnp.float32)           # (L, B, S, H, hd)
        absmax = jnp.max(jnp.abs(x), axis=(2, 4), keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        out[name + "_q8"] = q
        out[name + "_scale"] = scale.astype(jnp.float32)
    return out


def _maybe_dequant_kv(xs_k, xs_scale, dtype):
    if xs_scale is None:
        return xs_k.astype(dtype)
    return xs_k.astype(dtype) * xs_scale.astype(dtype)


def precompute_cross_kv(params: Params, enc_out: jax.Array, cfg: WhisperConfig,
                        adapters: Optional[Params] = None) -> Params:
    """Cross-attention K/V once per utterance: (L, B, S, H, hd) each."""
    dec_adapters = adapters.get("decoder") if adapters else None

    def layer(_, xs):
        lp, la = xs
        ca_l = la.get("cross_attn") if la else None
        lv = ca_l.get("v") if ca_l else None
        k = _split_heads(dense(enc_out, lp["cross_attn"]["k"]), cfg.decoder_heads)
        v = _split_heads(dense(enc_out, lp["cross_attn"]["v"], lv), cfg.decoder_heads)
        return None, {"k": k, "v": v}

    layers = params["decoder"]["layers"]
    if dec_adapters is None:
        _, kv = jax.lax.scan(lambda c, lp: layer(c, (lp, None)), None, layers)
    else:
        _, kv = jax.lax.scan(layer, None, (layers, dec_adapters))
    return kv


def decode_step(params: Params, token: jax.Array, pos: jax.Array,
                cache: Params, cross_kv: Params, cfg: WhisperConfig,
                adapters: Optional[Params] = None,
                compute_dtype: jnp.dtype = jnp.bfloat16,
                cross_group: int = 1) -> Tuple[jax.Array, Params]:
    """One autoregressive step.

    token (B,) int32, pos () int32 current position; returns
    (logits (B, vocab) fp32, updated cache).

    cross_group=K > 1 (beam search): cross_kv has B//K batch rows —
    consecutive groups of K token rows (the K hypotheses of one utterance)
    share the row's cross K/V, so the dominant decode-memory tensor is
    never replicated per beam (15.7 GB → 3.9 GB at large-v3 bs16·beam4).
    """
    dec = params["decoder"]
    B = token.shape[0]
    x = dec["embed"].astype(compute_dtype)[token][:, None, :]  # (B, 1, d)
    x = x + jax.lax.dynamic_slice_in_dim(dec["pos"], pos, 1, 0).astype(compute_dtype)[None]

    max_len = cache["k"].shape[2]
    # positions 0..pos are valid
    valid = (jnp.arange(max_len) <= pos)[None, None, None, :]  # (1,1,1,maxT)
    dec_adapters = adapters.get("decoder") if adapters else None
    kv_quant = "k_q8" in cross_kv

    def layer(x, xs):
        if kv_quant:
            lp, la, ck, cv, xk_q, xk_s, xv_q, xv_s = xs
            xk = _maybe_dequant_kv(xk_q, xk_s, x.dtype)
            xv = _maybe_dequant_kv(xv_q, xv_s, x.dtype)
        else:
            lp, la, ck, cv, xk, xv = xs
        sa_l = la.get("self_attn") if la else None
        ca_l = la.get("cross_attn") if la else None
        lq = sa_l.get("q") if sa_l else None
        lv_ = sa_l.get("v") if sa_l else None

        h = layer_norm(x, lp["ln1"])
        q = _split_heads(dense(h, lp["self_attn"]["q"], lq), cfg.decoder_heads)
        k_new = _split_heads(dense(h, lp["self_attn"]["k"]), cfg.decoder_heads)
        v_new = _split_heads(dense(h, lp["self_attn"]["v"], lv_), cfg.decoder_heads)
        zero = jnp.zeros((), pos.dtype)
        ck = jax.lax.dynamic_update_slice(ck, k_new.astype(ck.dtype), (zero, pos, zero, zero))
        cv = jax.lax.dynamic_update_slice(cv, v_new.astype(cv.dtype), (zero, pos, zero, zero))
        attn_out = attention(q, ck.astype(x.dtype), cv.astype(x.dtype), valid)
        x = x + dense(_merge_heads(attn_out), lp["self_attn"]["o"])

        h = layer_norm(x, lp["ln2"])
        cq = ca_l.get("q") if ca_l else None
        q2 = _split_heads(dense(h, lp["cross_attn"]["q"], cq), cfg.decoder_heads)
        if cross_group > 1:
            # beam groups share xk/xv: fold the K beam queries into the
            # query-position axis of one shared-KV attention
            q2g = q2.reshape((B // cross_group, cross_group) + q2.shape[2:])
            attn2 = attention(q2g, xk.astype(x.dtype), xv.astype(x.dtype))
            attn2 = attn2.reshape(q2.shape)
        else:
            attn2 = attention(q2, xk.astype(x.dtype), xv.astype(x.dtype))
        x = x + dense(_merge_heads(attn2), lp["cross_attn"]["o"])

        h = layer_norm(x, lp["ln3"])
        x = x + mlp_block(h, lp["mlp"])
        return x, (ck, cv)

    layers = dec["layers"]
    if kv_quant:
        kv_parts = (cross_kv["k_q8"], cross_kv["k_scale"],
                    cross_kv["v_q8"], cross_kv["v_scale"])
    else:
        kv_parts = (cross_kv["k"], cross_kv["v"])
    if dec_adapters is None:
        xs = (layers, cache["k"], cache["v"]) + kv_parts
        body = lambda c, t: layer(c, (t[0], None) + t[1:])
    else:
        xs = (layers, dec_adapters, cache["k"], cache["v"]) + kv_parts
        body = layer
    x, (new_k, new_v) = jax.lax.scan(body, x, xs)

    x = layer_norm(x, dec["ln_post"])
    logits = jnp.einsum("btd,vd->btv", x, dec["embed"].astype(compute_dtype),
                        preferred_element_type=_pet(compute_dtype))[:, 0, :]
    return logits, {"k": new_k, "v": new_v}


def decode_step_fused(params: Params, token: jax.Array, pos: jax.Array,
                      cache: Params, cross_kv: Params, cfg: WhisperConfig,
                      s_valid: int,
                      compute_dtype: jnp.dtype = jnp.bfloat16,
                      ancestry: Optional[jax.Array] = None,
                      cross_group: int = 1
                      ) -> Tuple[jax.Array, Params]:
    """One autoregressive step through the fused Pallas layer kernels
    (ops/decoder_fused.py): 4 bandwidth-bound kernels per layer instead of
    ~15 XLA ops, AND zero slice copies — the layer loop scans only the layer
    index while the kernels' BlockSpec index_maps (scalar-prefetched l) read
    their blocks directly from the full stacked weight/cache/cross tensors.
    (A scan over stacked xs would dynamic-slice ~46 MB of weights plus the
    layer's KV out of HBM each iteration — a read+write copy before the
    compute reads it again, tripling the step's HBM traffic.)

    Requirements (arranged by evaluation/decode.py): adapters already merged
    into params (training/lora.merge_adapters), cache from
    init_cache(dense=True) — i.e. (L, B, T, d) with T a 128-multiple — and
    cross K/V already dense (L, B, S, d), padded on the source axis to a
    128-multiple with s_valid the real source length (_prepare_fused does
    both). The dense layouts are load-bearing: any reshape of the cache at
    this boundary breaks XLA's while-loop carry aliasing and costs two full
    cache copies per token. int8 cross-KV passes {k_q8, v_q8} (L, B, S, d)
    plus per-(batch, head) scales {k_scale_d, v_scale_d} (L, B, d); dequant
    is fused into the kernel's streamed read.

    ancestry (beam search only): (B, K, T) int32 map of which beam ROW owns
    each hypothesis' cache slot per position. With it the self-attention
    runs the unpermuted-cache beam kernel (ops/decoder_fused.fused_attn_beam)
    and the caller never reorders the cache on the beam axis — the per-step
    full-cache gather that dominates conventional beam decoding (HF
    generate's `_reorder_cache`, which the reference inherits) is replaced
    by a B·K·T·4-byte ancestry gather (~64 KB at bs 8 / beam 4 / T 512).

    cross_group=K (beam search): cross_kv holds B//K batch rows shared by
    each utterance's K hypotheses — the cross-attention kernel streams each
    KV chunk once per group (K× less HBM traffic on the dominant cross-KV
    read) and the cross cache is never replicated per beam (K× less HBM:
    the per-row layout OOMs large-v3 at bs 16 × 4 beams).
    """
    from ..ops import decoder_fused as DF

    if cfg.d_model // cfg.decoder_heads != DF.HEAD_DIM:
        raise ValueError(
            f"decode_step_fused requires {DF.HEAD_DIM}-dim heads (the "
            f"kernels' head-expansion matrices are d//{DF.HEAD_DIM} "
            f"blocks); got {cfg.d_model // cfg.decoder_heads}. Use the "
            "XLA decode path (fused=False) for this model.")
    dec = params["decoder"]
    lay = dec["layers"]
    B = token.shape[0]
    d = cfg.d_model
    L = cfg.decoder_layers
    x = dec["embed"].astype(compute_dtype)[token]                  # (B, d)
    x = x + jax.lax.dynamic_slice_in_dim(dec["pos"], pos, 1, 0).astype(compute_dtype)

    kv_quant = "k_q8" in cross_kv
    ck0 = cache["k"]
    cv0 = cache["v"]
    if kv_quant:
        xk, xv = cross_kv["k_q8"], cross_kv["v_q8"]
        xk_s, xv_s = cross_kv["k_scale_d"], cross_kv["v_scale_d"]
    else:
        xk, xv = cross_kv["k"], cross_kv["v"]
        xk_s = xv_s = None

    def wpart(p):
        """(weight, int8 dequant scale or None) — ops/quant.py layout."""
        if "w_q8" in p:
            return p["w_q8"], p["w_scale"]
        return p["w"], None

    sa, ca, mlp = lay["self_attn"], lay["cross_attn"], lay["mlp"]
    wq_, sq_ = wpart(sa["q"])
    wk_, sk_ = wpart(sa["k"])
    wv_, sv_ = wpart(sa["v"])
    wo_, so_ = wpart(sa["o"])
    cq_, csq_ = wpart(ca["q"])
    co_, cso_ = wpart(ca["o"])
    w1_, s1_ = wpart(mlp["fc1"])
    w2_, s2_ = wpart(mlp["fc2"])
    zero = jnp.zeros((), pos.dtype)

    def body(carry, l):
        x, ck, cv = carry
        q, k_new, v_new = DF.fused_qkv(
            x, lay["ln1"]["scale"], lay["ln1"]["bias"],
            wq_, sa["q"]["b"], wk_, wv_, sa["v"]["b"],
            wq_scale=sq_, wk_scale=sk_, wv_scale=sv_,
            kv_dtype=ck.dtype, layer_idx=l)
        # in-place on the loop carry: writes only the (l, :, pos, :) row
        ck = jax.lax.dynamic_update_slice(
            ck, k_new[None, :, None, :].astype(ck.dtype), (l, zero, pos, zero))
        cv = jax.lax.dynamic_update_slice(
            cv, v_new[None, :, None, :].astype(cv.dtype), (l, zero, pos, zero))
        if ancestry is not None:
            x = DF.fused_attn_beam(x, ck, cv, wo_, sa["o"]["b"], q=q,
                                   pos=pos, ancestry=ancestry,
                                   wo_scale=so_, layer_idx=l)
        else:
            x = DF.fused_attn(x, ck, cv, wo_, sa["o"]["b"],
                              q=q, pos=pos, wo_scale=so_, layer_idx=l)
        x = DF.fused_attn(x, xk, xv, co_, ca["o"]["b"], s_valid=s_valid,
                          ln_scale=lay["ln2"]["scale"],
                          ln_bias=lay["ln2"]["bias"],
                          wq=cq_, bq=ca["q"]["b"],
                          k_scale=xk_s, v_scale=xv_s,
                          wq_scale=csq_, wo_scale=cso_, layer_idx=l,
                          kv_group=cross_group)
        x = DF.fused_mlp(x, lay["ln3"]["scale"], lay["ln3"]["bias"],
                         w1_, mlp["fc1"]["b"], w2_, mlp["fc2"]["b"],
                         w1_scale=s1_, w2_scale=s2_, layer_idx=l)
        return (x, ck, cv), None

    (x, ck, cv), _ = jax.lax.scan(body, (x, ck0, cv0),
                                  jnp.arange(L, dtype=pos.dtype))

    x = layer_norm(x, dec["ln_post"])
    logits = jnp.einsum("bd,vd->bv", x, dec["embed"].astype(compute_dtype),
                        preferred_element_type=_pet(compute_dtype))
    return logits, {"k": ck, "v": cv}


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

IGNORE_ID = -100  # label positions to ignore, matching the reference's collator
                  # masking (datasets_and_collators.py:452-455)


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  label_smoothing: float = 0.0) -> Tuple[jax.Array, jax.Array]:
    """Mean token cross-entropy over labels != IGNORE_ID.

    Returns (loss, num_tokens). Matches HF Seq2SeqTrainer's CE-with-ignore
    semantics (reference trains through WhisperForConditionalGeneration's
    built-in loss).
    """
    vocab = logits.shape[-1]
    mask = labels != IGNORE_ID
    safe_labels = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(_pet(logits.dtype)), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    nll = jnp.where(mask, nll, 0.0)
    n = jnp.maximum(mask.sum(), 1)
    return nll.sum() / n, n
