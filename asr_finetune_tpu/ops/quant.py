"""int8 quantization of the frozen base model.

Capability parity with the reference's `load_in_8bit=True` bitsandbytes path
(whisper_models.py:42,69; trainers.py:499-507 —
`prepare_model_for_kbit_training` over an LLM.int8 quantized base for
LoRA/AdaLoRA).

TPU-native design: symmetric per-output-channel int8 with an fp32 scale,
stored as {"w_q8": int8 (L, d_in, d_out), "w_scale": (L, 1, d_out)} in place
of each stacked linear weight. Dequantization happens at use inside
models/whisper.py `dense()`; XLA fuses the convert+scale into the matmul
operand read, so HBM traffic for frozen weights halves vs bf16 (4x vs fp32)
— the same memory win the reference buys from bitsandbytes, without custom
CUDA. (A fused Pallas dequant-matmul for further gains is a planned hot-op;
see ops/logmel_pallas.py for the kernel pattern used.)

No autograd hook is needed: the quantized base simply isn't differentiated
(the reference needs trainers.py:510-515's conv1 hook because torch autograd
refuses grads through int8 layers).
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _fused_w8a8_enabled() -> bool:
    """Opt-in: the fused kernel wins its microbenchmark on the MLP shapes
    (1.15-1.18x, benchmarks/bench_w8a8_fused.py) but measured NEGATIVE
    end-to-end on the parity trial (13.51 vs 14.01 utt/s/chip, same
    session A/B) — in context XLA overlaps the standalone quant pass with
    neighboring work and reuses the int8 activations across the
    custom_vjp boundary, neither of which the fused schedule can do. Kept
    as an opt-in (ASR_TPU_FUSED_W8A8=1) per-shape tool."""
    return os.environ.get("ASR_TPU_FUSED_W8A8", "0").lower() not in (
        "0", "false", "no", "off")

Params = Dict[str, Any]

QUANT_KEY = "w_q8"
SCALE_KEY = "w_scale"


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """(..., d_in, d_out) fp → int8 values + per-output-channel scales."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return {QUANT_KEY: q.astype(jnp.int8), SCALE_KEY: scale.astype(jnp.float32)}


def dequantize_weight(p: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (p[QUANT_KEY].astype(dtype) * p[SCALE_KEY].astype(dtype))


def quantize_tree_int8(params: Params, min_ndim: int = 3) -> Params:
    """Replace every stacked linear weight {"w": (L, d_in, d_out)} subtree
    entry with its int8 form. Embeddings, conv stem, layernorms, biases and
    the positional tables stay in floating point (matching bitsandbytes'
    Linear-only coverage)."""

    LINEAR_KEYS = ("q", "k", "v", "o", "fc1", "fc2")

    def walk(node, parent=""):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k == "w" and parent in LINEAR_KEYS
                        and hasattr(v, "ndim") and v.ndim >= min_ndim):
                    out.update(quantize_weight(v))
                else:
                    out[k] = walk(v, k)
            return out
        return node

    return walk(params)


def quantized_size_bytes(params: Params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# W8A8 int8 compute (opt-in --int8_matmul)
# ---------------------------------------------------------------------------
# The reference's bitsandbytes base doesn't just STORE int8 — LLM.int8()
# computes the matmul in int8 (vector-wise activation scales x per-channel
# weight scales). The default TPU path here dequantizes into the bf16
# matmul (numerics-safe); this opt-in path runs the frozen-base forward as
# s8xs8->s32 on the MXU, which v5e rates at 2x bf16 (measured ~1.26x on
# Whisper's K=1280 shapes). Outlier decomposition (bnb's fp16 outlier
# columns, threshold 6.0, LLM.int8() §3.2) is available as a fixed-k
# variant via set_int8_outlier_cols(k) / --int8_outlier_cols: the k
# highest-|amax| input FEATURES per matmul are computed against the
# dequantized weight rows in float and masked out of the int8 path. A
# fixed k (top_k) instead of a data-dependent threshold keeps every shape
# static under jit; k=0 (default) is the plain vector-wise path.

_INT8_COMPUTE = False
_INT8_OUTLIER_COLS = 0
_INT8_STATIC_IDX: "tuple | None" = None


def set_int8_compute(on: bool) -> None:
    """Enable W8A8 forward matmuls wherever dense() meets an int8 weight.
    Read at trace time — set before building the jitted step."""
    global _INT8_COMPUTE
    _INT8_COMPUTE = bool(on)


def int8_compute_enabled() -> bool:
    return _INT8_COMPUTE


def set_int8_outlier_cols(k: int) -> None:
    """Mixed-precision decomposition width for W8A8 matmuls: the k input
    features with the largest batch amax go through a float side-matmul
    (bnb LLM.int8()'s outlier columns, jit-friendly fixed-k form). Read at
    trace time — set before building the jitted step."""
    global _INT8_OUTLIER_COLS
    _INT8_OUTLIER_COLS = int(k)


def int8_outlier_cols() -> int:
    return _INT8_OUTLIER_COLS


def set_int8_outlier_static_idx(idx) -> None:
    """CALIBRATED static outlier columns: when set, W8A8 matmuls route
    exactly these input features through the float side-path instead of
    re-ranking columns by batch amax at every matmul. The frozen base's
    outlier features are near-stationary (LLM.int8() §3.2: emergent
    features persist across inputs), so a once-calibrated set preserves
    the decomposition's numerics while removing the per-matmul
    column-amax pass and top_k from the step entirely.

    Accepts either a tuple of feature indices (applied to every matmul;
    indices >= a matmul's d_in are dropped for that matmul) or a dict
    {(d_in, d_out): tuple_of_indices} as produced by
    calibrate_int8_outliers — an EMPTY tuple for a class means
    "calibrated, no outliers": that class runs the pure int8 path
    (exactly bitsandbytes, whose threshold-6.0 rule decomposes nothing
    on outlier-free activations); a MISSING class falls back to the
    dynamic top-k path. Read at trace time."""
    global _INT8_STATIC_IDX
    if idx is None:
        _INT8_STATIC_IDX = None
    elif isinstance(idx, dict):
        _INT8_STATIC_IDX = {k: tuple(int(i) for i in v)
                            for k, v in idx.items()}
    else:
        _INT8_STATIC_IDX = tuple(int(i) for i in idx)


# --- bnb-faithful outlier calibration -------------------------------------
# bitsandbytes' LLM.int8() decomposes ONLY the columns whose activation
# magnitude crosses threshold 6.0 — on activations with no emergent
# outliers it runs pure int8. The fixed-k dynamic path above keeps every
# shape static under jit but pays a ranking pass + two 128-lane-padded MXU
# side-matmuls in EVERY frozen matmul (measured round 5: ~8% of the
# large-v3 parity step at k=8 even with the ranking hoisted — the padding
# waste IS the cost, not the gathers). Calibration restores bnb's actual
# semantics: record per-matmul column amax over a sample batch once,
# install the >= threshold columns as static per-shape-class outlier
# sets, and pay the side-path only where emergent features actually live.

_CALIB_STATS: "dict | None" = None


def _calib_record(col_amax, klass) -> None:
    if _CALIB_STATS is None:  # barrier flushed after calibration ended
        return
    cur = _CALIB_STATS.get(klass)
    a = np.asarray(col_amax, np.float32)
    _CALIB_STATS[klass] = a if cur is None else np.maximum(cur, a)


def calibrate_int8_outliers(run_fn, threshold: float = 6.0,
                            max_cols: int = 16) -> Dict:
    """Run `run_fn()` (any forward over the int8 base — e.g. one jitted
    eval-loss step on a representative batch) with per-matmul column-amax
    recording on, then install calibrated static outlier columns: every
    input feature whose recorded batch amax >= `threshold` (bnb
    LLM.int8()'s default 6.0), largest-first, capped at `max_cols` per
    (d_in, d_out) shape class. Returns the installed
    {(d_in, d_out): (col, ...)} map.

    Reference parity: whisper_models.py:42,69 load_in_8bit →
    bitsandbytes Linear8bitLt(threshold=6.0), which re-detects the same
    near-stationary columns on every forward; calibrating once against a
    FROZEN base gives the same decomposition without the per-matmul
    detection cost (tests/test_ops.py::test_calibrated_outliers_match_dynamic).

    NOTE: recording is baked in at TRACE time — `run_fn` must trace its
    jitted computation freshly inside this call (pass a newly built
    jax.jit callable, not one already compiled with recording off), and
    the training/eval step that should CONSUME the calibrated columns
    must be traced AFTER this returns."""
    global _CALIB_STATS
    _CALIB_STATS = {}
    try:
        run_fn()
        jax.effects_barrier()  # flush the debug callbacks
        idx_map = {}
        for klass, amax in _CALIB_STATS.items():
            cols = np.where(amax >= threshold)[0]
            if max_cols and cols.size > max_cols:
                cols = cols[np.argsort(amax[cols])[::-1][:max_cols]]
            idx_map[klass] = tuple(int(c) for c in np.sort(cols))
    finally:
        _CALIB_STATS = None
    set_int8_outlier_static_idx(idx_map)
    return idx_map


def _w8a8_impl(x: jax.Array, w_q8: jax.Array, w_scale: jax.Array) -> jax.Array:
    """x (..., d_in) float, w_q8 (d_in, d_out) int8, w_scale (1, d_out).

    Dynamic symmetric per-row activation quantization (bnb's vector-wise
    scheme), int8 dot with int32 accumulation, rescale: the row scale and
    the channel scale both factor out of the integer matmul exactly.

    With _INT8_OUTLIER_COLS = k > 0, the k input features with the largest
    |activation| across the batch are removed from the int8 operand (their
    magnitude would otherwise set the per-row scale and crush the int8
    resolution of every inlier in that row) and contribute exactly through
    a (..., k) x (k, d_out) float matmul against the dequantized weight
    rows — the decomposition is exact up to the int8 rounding of the
    inlier part.

    Dispatch: with ASR_TPU_FUSED_W8A8=1 (opt-in, default OFF — see
    _fused_w8a8_enabled for the measured e2e regression) and no outlier
    decomposition, MLP-class shapes go through the fused Pallas kernel
    (ops/w8a8_fused.py — quant prologue + s8xs8 dot + dequant epilogue
    in one kernel, no int8 HBM round-trip). Attention-projection shapes
    and the outlier path always stay on this XLA formulation."""
    if _INT8_OUTLIER_COLS == 0 and _fused_w8a8_enabled():
        from . import w8a8_fused
        k_in, n_out = x.shape[-1], w_q8.shape[-1]
        m = int(np.prod(x.shape[:-1]))
        mt = w8a8_fused.pick_mt(m, k_in, n_out)
        if mt is not None:
            y2 = w8a8_fused.fused_w8a8(x.reshape(m, k_in), w_q8,
                                       w_scale, mt=mt)
            return y2.reshape(*x.shape[:-1], n_out)
    x32 = x.astype(jnp.float32)
    k = _INT8_OUTLIER_COLS
    d_in = x32.shape[-1]
    d_out = w_q8.shape[-1]
    y_out = None
    static_idx = None
    if _INT8_STATIC_IDX is not None:
        if isinstance(_INT8_STATIC_IDX, dict):
            static_idx = _INT8_STATIC_IDX.get((d_in, d_out))
        else:
            static_idx = tuple(i for i in _INT8_STATIC_IDX if i < d_in)
    if k > 0 and static_idx is not None:
        # Calibrated static outliers (set_int8_outlier_static_idx): the
        # selection matrices become compile-time constants — no ranking
        # pass, no top_k; the only per-step cost left is the (N, d_in) x
        # (d_in, k) extraction matmul and the fused keep-mask multiply.
        # An EMPTY calibrated set means bnb's threshold rule found no
        # outlier features for this class: pure int8, zero side-path cost.
        idx_np = np.array([i for i in static_idx if i < d_in],
                          dtype=np.int32)
        if idx_np.size:
            sel_np = np.zeros((idx_np.size, d_in), np.float32)
            sel_np[np.arange(idx_np.size), idx_np] = 1.0
            x_outl = jax.lax.dot_general(
                x, jnp.asarray(sel_np, x.dtype),
                (((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            w_outl = (jax.lax.dot_general(
                jnp.asarray(sel_np, jnp.bfloat16), w_q8.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                * w_scale.reshape(1, -1).astype(jnp.float32))
            y_out = jax.lax.dot_general(
                x_outl, w_outl, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x32 = x32 * jnp.asarray(1.0 - sel_np.sum(0), jnp.float32)
    elif k > 0:
        k = min(k, d_in)
        # Outlier-column selection, MXU-friendly form. The original
        # formulation (round 4) upcast x to f32 for the column-amax pass
        # and routed the outlier columns through jnp.take / .at[].set —
        # gather/scatter on the minor axis lowers to per-element dynamic
        # slices on TPU and cost the parity step ~10% end-to-end
        # (ARCHITECTURE.md round-5 A/B). This form is numerically
        # IDENTICAL (tests/test_ops.py::
        # test_int8_outlier_matmul_form_matches_gather_form):
        #  - the ranking pass reads x in its native dtype (|bf16| is exact,
        #    and top_k only needs the ORDER, which the f32 upcast preserved
        #    bit-for-bit anyway);
        #  - column extraction is a one-hot matmul: products are x_i*{0,1},
        #    exact in any dtype, and (N,d_in)x(d_in,k) rides the MXU;
        #  - the keep-mask is 1 - sum(one_hot) instead of a scatter.
        col_amax = jnp.max(jnp.abs(x),
                           axis=tuple(range(x.ndim - 1)))        # (d_in,)
        _, idx = jax.lax.top_k(col_amax.astype(jnp.float32), k)  # (k,)
        sel = jax.nn.one_hot(idx, d_in, dtype=x.dtype)           # (k, d_in)
        x_outl = jax.lax.dot_general(                            # (..., k)
            x, sel,
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # int8 values are exact in bf16 (|w| <= 127 < 2^8), so the one-hot
        # row extraction below is exact too
        w_outl = (jax.lax.dot_general(
            jax.nn.one_hot(idx, d_in, dtype=jnp.bfloat16),
            w_q8.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * w_scale.reshape(1, -1).astype(jnp.float32))        # (k, d_out)
        y_out = jax.lax.dot_general(
            x_outl, w_outl, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        keep = 1.0 - jnp.sum(sel, axis=0).astype(jnp.float32)    # (d_in,)
        x32 = x32 * keep
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
    y32 = jax.lax.dot_general(x8, w_q8, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = y32.astype(jnp.float32) * xs * w_scale.reshape(-1).astype(jnp.float32)
    if y_out is not None:
        y = y + y_out
    return y.astype(x.dtype)


@jax.custom_vjp
def _int8_matmul_vjp(x: jax.Array, w_q8: jax.Array,
                     w_scale: jax.Array) -> jax.Array:
    return _w8a8_impl(x, w_q8, w_scale)


def int8_matmul(x: jax.Array, w_q8: jax.Array, w_scale: jax.Array) -> jax.Array:
    """W8A8 matmul: int8 forward on the MXU, straight-through backward
    through the dequantized weight (dx = dy @ W_deq^T — the frozen weight
    takes no gradient, and the activation-quantization round is treated as
    identity, the standard QAT estimator; bnb's autograd does the same).

    While calibrate_int8_outliers is recording, also ships this matmul's
    column amax to the host (outside the custom_vjp: debug-callback
    effects are not allowed inside custom_vjp traces)."""
    if _CALIB_STATS is not None:
        ca = jnp.max(jnp.abs(x),
                     axis=tuple(range(x.ndim - 1))).astype(jnp.float32)
        jax.debug.callback(
            functools.partial(_calib_record,
                              klass=(x.shape[-1], w_q8.shape[-1])), ca)
    return _int8_matmul_vjp(x, w_q8, w_scale)


def _int8_matmul_fwd(x, w_q8, w_scale):
    return _w8a8_impl(x, w_q8, w_scale), (w_q8, w_scale)


def _int8_matmul_bwd(res, dy):
    w_q8, w_scale = res
    w = w_q8.astype(dy.dtype) * w_scale.astype(dy.dtype)
    dx = jax.lax.dot_general(dy, w, (((dy.ndim - 1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dx.astype(dy.dtype), None, jnp.zeros_like(w_scale)


_int8_matmul_vjp.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)
