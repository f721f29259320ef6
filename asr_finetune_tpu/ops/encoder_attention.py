"""Whole-row Pallas attention for Whisper encoder shapes (fwd + fused bwd).

Why not upstream flash attention (jax.experimental.pallas.ops.tpu
.flash_attention)? Profiling the round-3 parity train step (large-v3, bs 8,
encoder adapters → real encoder backward) showed the attention stack as the
single largest cost: per layer 1.66 ms flash fwd + 1.66 ms flash fwd
RECOMPUTE inside the backward (the upstream VJP needs out+lse residuals,
which layer remat discards) + 2.4 ms dkv kernel + 1.7 ms dq kernel + 1.2 ms
of XLA-side f32[B,H,T,block] mask/di broadcasts from its SegmentIds
plumbing ≈ 8.6 ms/layer, ~28% of the whole 850 ms step.

Whisper's encoder is a FIXED small shape: T = 1500 (padded 1536), head_dim
64. At that size a full attention ROW fits in VMEM (p tile (1536, 1536) f32
= 9.4 MB), so streaming/online-softmax machinery is pure overhead:

- fwd: one kernel per (batch·head): s = scale·q@kᵀ with an in-kernel iota
  mask at s_valid (no SegmentIds arrays, no mask materialization), fp32
  row softmax, out = p@v. No lse output.
- bwd: ONE kernel per (batch·head) recomputes p from q,k (cheaper than
  saving it) and produces dq, dk, dv in a single pass:
      dp = do@vᵀ, di = rowsum(p⊙dp)  (≡ rowsum(do⊙o) — no o needed),
      ds = p⊙(dp − di), dq = scale·ds@k, dk = scale·dsᵀ@q, dv = pᵀ@do.
  Five matmuls, zero residuals beyond (q, k, v, do) — under layer remat
  the attention fwd never runs twice.

Numerics: matmul accumulation fp32 (preferred_element_type), softmax fp32,
p cast to the input dtype for the p@v / pᵀ@do MXU matmuls — matching the
upstream flash kernel's precision contract and xla_attention's fp32
softmax.

Measured (v5e, B=8 H=20 T=1536 hd=64, bf16): see tests/benchmarks; wired
into ops/attention.attention as the default for long non-causal
self/cross-attention (the Whisper encoder + teacher-forced cross-attn).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # finite -inf keeps masked-row softmax NaN-free

# whole-row (1536, 1536) f32 tiles exceed Mosaic's default 16 MB scoped
# vmem; the bwd kernel's live set is ~35 MB (p, dp, ds + operands)
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, s_valid, Tk):
    # softmax division DEFERRED past the p@v matmul: normalizing the
    # (Tq, hd) output costs Tk/hd = 24x fewer VPU divides than
    # normalizing the (Tq, Tk) probability tile
    for g in range(q_ref.shape[0]):                        # heads per program
        q = q_ref[g]                                       # (Tq, hd)
        k = k_ref[g]                                       # (Tk, hd)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if s_valid < Tk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < s_valid, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        r = 1.0 / jnp.sum(e, axis=1, keepdims=True)        # (Tq, 1)
        ev = jax.lax.dot(e.astype(v_ref.dtype), v_ref[g],
                         preferred_element_type=jnp.float32)
        o_ref[g] = (ev * r).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale, s_valid, Tk):
    for g in range(q_ref.shape[0]):                    # heads per program
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if s_valid < Tk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < s_valid, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)      # (Tq, Tk) f32

        pc = p.astype(do.dtype)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        di = jnp.sum(p * dp, axis=1, keepdims=True)    # rowsum(do·o)
        ds = (p * (dp - di)).astype(q.dtype)           # (Tq, Tk)
        dq_ref[g] = (jax.lax.dot(ds, k, preferred_element_type=jnp.float32)
                     * scale).astype(dq_ref.dtype)
        dk_ref[g] = (jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
        dv_ref[g] = jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _specs(n: int, T: int, hd: int, g: int = 1):
    return [pl.BlockSpec((g, T, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(n)]


def _heads_per_program(BH: int, Tq: int, Tk: int) -> int:
    """Per-program grid overhead is ~6 us; batching G heads per program
    amortizes it. Bounded by the f32 (Tq, Tk) tile staying well under the
    VMEM budget (only one head's tile is live at a time, but operands and
    double-buffered blocks scale with G)."""
    for g in (4, 2):
        if BH % g == 0 and g * (Tq + 2 * Tk) * 64 * 2 < 16 * 1024 * 1024:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dense_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    s_valid: int, interpret: Optional[bool] = None
                    ) -> jax.Array:
    """Attention over (BH, T, hd) with keys masked at col >= s_valid."""
    out, _ = _fwd(q, k, v, s_valid, interpret)
    return out


def _fwd(q, k, v, s_valid, interpret):
    if interpret is None:
        interpret = _interpret_default()
    BH, Tq, hd = q.shape
    Tk = k.shape[1]
    scale = hd ** -0.5
    g = _heads_per_program(BH, Tq, Tk)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, s_valid=s_valid, Tk=Tk),
        out_shape=jax.ShapeDtypeStruct((BH, Tq, hd), q.dtype),
        grid=(BH // g,),
        in_specs=_specs(1, Tq, hd, g) + _specs(2, Tk, hd, g),
        out_specs=_specs(1, Tq, hd, g)[0],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * Tq * Tk * hd,
            bytes_accessed=BH * (2 * Tq + 2 * Tk) * hd * q.dtype.itemsize,
            transcendentals=BH * Tq * Tk),
    )(q, k, v)
    return out, (q, k, v)


def _bwd(s_valid, interpret, res, do):
    q, k, v = res
    if interpret is None:
        interpret = _interpret_default()
    BH, Tq, hd = q.shape
    Tk = k.shape[1]
    scale = hd ** -0.5
    # the bwd live set per head (~28 MB of f32 (Tq,Tk) tiles) leaves less
    # VMEM for block double-buffering than the fwd: cap at 2 heads/program
    g = min(_heads_per_program(BH, Tq, Tk), 2)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, s_valid=s_valid, Tk=Tk),
        out_shape=(jax.ShapeDtypeStruct((BH, Tq, hd), q.dtype),
                   jax.ShapeDtypeStruct((BH, Tk, hd), k.dtype),
                   jax.ShapeDtypeStruct((BH, Tk, hd), v.dtype)),
        grid=(BH // g,),
        in_specs=_specs(2, Tq, hd, g)[:1] + _specs(2, Tk, hd, g)
        + _specs(1, Tq, hd, g),
        out_specs=tuple(_specs(1, Tq, hd, g)[:1] + _specs(2, Tk, hd, g)),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * BH * Tq * Tk * hd,
            bytes_accessed=BH * (3 * Tq + 4 * Tk) * hd * q.dtype.itemsize,
            transcendentals=BH * Tq * Tk),
    )(q, k, v, do)
    return dq, dk, dv


dense_attention.defvjp(_fwd, _bwd)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# packed-layout variant: heads stay side by side in the lane dimension
# ---------------------------------------------------------------------------
# The (BH, T, hd) kernels above need a per-layer (B,T,H,hd)->(BH,T,hd)
# relayout (pad + transpose), measured at ~0.7 ms/layer on the large-v3
# parity step — 71% of the HBM roofline for pure data movement. The packed
# kernels instead consume the qkv projections' NATIVE (B, T, H*hd) layout:
# the grid walks (batch, head-group) and each program's block is a
# lane-aligned (1, T_p, G*hd) slice of the full tensor, so the only prep
# left is the row padding to a 128 multiple (a contiguous append, ~30 us).
# Inside the kernel each head is a static lane slice [i*hd:(i+1)*hd] —
# exactly the (T, hd) operand shape the unpacked kernels already use.


def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale, s_valid, Tk, hd):
    G = q_ref.shape[-1] // hd
    for i in range(G):
        sl = slice(i * hd, (i + 1) * hd)
        q = q_ref[0, :, sl]                                # (Tq, hd)
        k = k_ref[0, :, sl]                                # (Tk, hd)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if s_valid < Tk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < s_valid, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        r = 1.0 / jnp.sum(e, axis=1, keepdims=True)
        ev = jax.lax.dot(e.astype(v_ref.dtype), v_ref[0, :, sl],
                         preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (ev * r).astype(o_ref.dtype)


def _bwd_kernel_packed(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                       *, scale, s_valid, Tk, hd):
    G = q_ref.shape[-1] // hd
    for i in range(G):
        sl = slice(i * hd, (i + 1) * hd)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if s_valid < Tk:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < s_valid, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        pc = p.astype(do.dtype)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        di = jnp.sum(p * dp, axis=1, keepdims=True)
        ds = (p * (dp - di)).astype(q.dtype)
        dq_ref[0, :, sl] = (jax.lax.dot(
            ds, k, preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _specs_packed(n: int, T: int, lanes: int):
    return [pl.BlockSpec((1, T, lanes), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM) for _ in range(n)]


def _group_packed(H: int, hd: int, Tq: int, Tk: int, cap: int = 4):
    """Heads per program for the packed layout: the lane width G*hd must be
    a 128 multiple (block alignment) and H % G == 0. Returns None when no
    grouping works (odd head counts with hd 64) — callers fall back to the
    transpose layout."""
    for g in (4, 2, 1):
        if g > cap or H % g or (g * hd) % 128:
            continue
        if g * hd * 2 * (2 * Tq + 2 * Tk) * 2 < 16 * 1024 * 1024:
            return g
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dense_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                           hd: int, s_valid: int,
                           interpret: Optional[bool] = None) -> jax.Array:
    """Attention over (B, T_pad, H*hd) packed tensors; keys masked at
    col >= s_valid. Row counts must already be 128 multiples."""
    out, _ = _fwd_packed(q, k, v, hd, s_valid, interpret)
    return out


def _fwd_packed(q, k, v, hd, s_valid, interpret):
    if interpret is None:
        interpret = _interpret_default()
    B, Tq, D = q.shape
    Tk = k.shape[1]
    H = D // hd
    scale = hd ** -0.5
    g = _group_packed(H, hd, Tq, Tk)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale, s_valid=s_valid,
                          Tk=Tk, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B, Tq, D), q.dtype),
        grid=(B, H // g),
        in_specs=_specs_packed(1, Tq, g * hd) + _specs_packed(2, Tk, g * hd),
        out_specs=_specs_packed(1, Tq, g * hd)[0],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Tq * Tk * hd,
            bytes_accessed=B * H * (2 * Tq + 2 * Tk) * hd * q.dtype.itemsize,
            transcendentals=B * H * Tq * Tk),
    )(q, k, v)
    return out, (q, k, v)


def _bwd_packed(hd, s_valid, interpret, res, do):
    q, k, v = res
    if interpret is None:
        interpret = _interpret_default()
    B, Tq, D = q.shape
    Tk = k.shape[1]
    H = D // hd
    scale = hd ** -0.5
    g = _group_packed(H, hd, Tq, Tk, cap=2)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_packed, scale=scale, s_valid=s_valid,
                          Tk=Tk, hd=hd),
        out_shape=(jax.ShapeDtypeStruct((B, Tq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, Tk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, Tk, D), v.dtype)),
        grid=(B, H // g),
        in_specs=_specs_packed(2, Tq, g * hd)[:1]
        + _specs_packed(2, Tk, g * hd) + _specs_packed(1, Tq, g * hd),
        out_specs=tuple(_specs_packed(1, Tq, g * hd)[:1]
                        + _specs_packed(2, Tk, g * hd)),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * H * Tq * Tk * hd,
            bytes_accessed=B * H * (3 * Tq + 4 * Tk) * hd * q.dtype.itemsize,
            transcendentals=B * H * Tq * Tk),
    )(q, k, v, do)
    return dq, dk, dv


dense_attention_packed.defvjp(_fwd_packed, _bwd_packed)


def _packed_default() -> bool:
    import os
    return os.environ.get("ASR_TPU_DENSE_PACKED", "1").lower() not in (
        "0", "false", "no", "off")


def _native_t_default() -> bool:
    import os
    return os.environ.get("ASR_TPU_DENSE_NATIVE_T", "1").lower() not in (
        "0", "false", "no", "off")


def encoder_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      interpret: Optional[bool] = None,
                      save_tag: Optional[str] = None) -> jax.Array:
    """(B, Tq, H, hd) non-causal attention. Drop-in for
    ops/attention.attention on the encoder/cross shapes.

    Layout: when the head grouping divides evenly (all released Whisper
    shapes), the packed kernels read the projections' native (B, T, H*hd)
    layout — no per-layer transpose, and (default) no row padding either:
    Mosaic tiles non-8/128-aligned T internally, so the kernel takes
    Tq/Tk as-is. Measured on v5e at the large-v3 encoder shape
    (B8 T1500): native-T is bit-identical to the padded form and faster
    (fwd 2.36 vs 2.61 ms, fwd+bwd 5.83 vs 6.12 incl. prep) — it deletes
    the per-layer XLA pad fusions (~1.5 ms/step each, 6 instances in the
    traced parity step) and shrinks the enc_qkv save-point traffic 2.4%.
    ASR_TPU_DENSE_NATIVE_T=0 restores the 128-aligned row pad. Otherwise
    falls back to the (BH, T, hd) transpose layout.

    save_tag marks the PREPPED tensors as remat save points: they are the
    kernel VJP's exact residuals, so a layer-remat'd backward neither
    re-runs the kernel nor re-does the relayout prep."""
    B, Tq, H, hd = q.shape
    Tk = k.shape[1]
    Tq_p, Tk_p = _round_up(Tq, 128), _round_up(Tk, 128)

    def tag(x):
        if save_tag is not None:
            from jax.ad_checkpoint import checkpoint_name
            x = checkpoint_name(x, save_tag)
        return x

    # Dispatch gates on the BACKWARD grouping (cap=2, matching
    # fused_qkv_supported): the fwd kernel can group up to 4 heads, but
    # _bwd_packed needs a cap=2 grouping, and a shape that only groups at
    # cap=4 (e.g. H=4, hd=32) would crash at grad-trace time if dispatched
    # here. Such shapes take the transpose layout below instead.
    if _group_packed(H, hd, Tq_p, Tk_p, cap=2) and _packed_default():
        if _native_t_default():
            # native-T only on the packed path; the (BH, T, hd) fallback
            # keeps 128-aligned rows (its specs were tuned there)
            Tq_p, Tk_p = Tq, Tk
        def prep_p(x, T_p):
            x = x.reshape(B, x.shape[1], H * hd)           # free
            if x.shape[1] != T_p:
                x = jnp.pad(x, ((0, 0), (0, T_p - x.shape[1]), (0, 0)))
            return tag(x)

        out = dense_attention_packed(prep_p(q, Tq_p), prep_p(k, Tk_p),
                                     prep_p(v, Tk_p), hd, Tk, interpret)
        return out[:, :Tq].reshape(B, Tq, H, hd)

    def prep(x, T_p):
        if x.shape[1] != T_p:
            x = jnp.pad(x, ((0, 0), (0, T_p - x.shape[1]), (0, 0), (0, 0)))
        return tag(x.transpose(0, 2, 1, 3).reshape(B * H, T_p, hd))

    out = dense_attention(prep(q, Tq_p), prep(k, Tk_p), prep(v, Tk_p),
                          Tk, interpret)
    out = out.reshape(B, H, Tq_p, hd).transpose(0, 2, 1, 3)
    return out[:, :Tq]


# ---------------------------------------------------------------------------
# fused-QKV variant: q, k and v arrive as ONE (B, T, 3*H*hd) tensor
# ---------------------------------------------------------------------------
# The encoder's fused qkv projection (models/whisper._mha_fused_qkv) emits
# q/k/v as a single wide-matmul output. These wrappers feed that buffer to
# the UNCHANGED packed kernels by passing it three times with lane-block
# index maps offset to the q/k/v sections — each program still sees the
# same (1, T, G*hd) blocks as the three-tensor form, so the layer needs no
# slice or relayout between the projection and the attention, and the remat
# save point is ONE coalesced (B, T, 3D) buffer instead of three. The VJP
# returns the cotangent in the same packed layout (one concatenate feeding
# the single wide dx matmul of the fused projection's backward).


def _spec_off(T: int, lanes: int, off: int):
    return pl.BlockSpec((1, T, lanes), lambda b, h, off=off: (b, 0, off + h),
                        memory_space=pltpu.VMEM)


def fused_qkv_supported(H: int, hd: int, T: int) -> bool:
    """True when the packed kernels can consume a fused (B, T, 3*H*hd)
    qkv tensor at this shape (lane-aligned head grouping exists for both
    the fwd and the stricter bwd VMEM budget, and the f32 whole-row tile
    fits — mirrors ops/attention.attention's use_dense bound)."""
    T_p = _round_up(T, 128)
    return (T >= 128 and _group_packed(H, hd, T, T, cap=2) is not None
            and _packed_default() and _native_t_default()
            and 3 * T_p * T_p * 4 <= 48 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def dense_attention_qkv(qkv: jax.Array, hd: int,
                        interpret: Optional[bool] = None) -> jax.Array:
    """Self-attention over a fused (B, T, 3*H*hd) qkv tensor (all rows
    valid — the encoder's unmasked T). Returns (B, T, H*hd) packed."""
    out, _ = _fwd_qkv(qkv, hd, interpret)
    return out


def _fwd_qkv(qkv, hd, interpret):
    if interpret is None:
        interpret = _interpret_default()
    B, T, D3 = qkv.shape
    D = D3 // 3
    H = D // hd
    scale = hd ** -0.5
    g = _group_packed(H, hd, T, T)
    nb = H // g
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale, s_valid=T,
                          Tk=T, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B, T, D), qkv.dtype),
        grid=(B, nb),
        in_specs=[_spec_off(T, g * hd, 0), _spec_off(T, g * hd, nb),
                  _spec_off(T, g * hd, 2 * nb)],
        out_specs=_specs_packed(1, T, g * hd)[0],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * T * T * hd,
            bytes_accessed=B * H * 4 * T * hd * qkv.dtype.itemsize,
            transcendentals=B * H * T * T),
    )(qkv, qkv, qkv)
    return out, (qkv,)


def _bwd_qkv(hd, interpret, res, do):
    (qkv,) = res
    if interpret is None:
        interpret = _interpret_default()
    B, T, D3 = qkv.shape
    D = D3 // 3
    H = D // hd
    scale = hd ** -0.5
    g = _group_packed(H, hd, T, T, cap=2)
    nb = H // g
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_packed, scale=scale, s_valid=T,
                          Tk=T, hd=hd),
        out_shape=tuple(jax.ShapeDtypeStruct((B, T, D), qkv.dtype)
                        for _ in range(3)),
        grid=(B, nb),
        in_specs=[_spec_off(T, g * hd, 0), _spec_off(T, g * hd, nb),
                  _spec_off(T, g * hd, 2 * nb)]
        + _specs_packed(1, T, g * hd),
        out_specs=tuple(_specs_packed(3, T, g * hd)),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * H * T * T * hd,
            bytes_accessed=B * H * 7 * T * hd * qkv.dtype.itemsize,
            transcendentals=B * H * T * T),
    )(qkv, qkv, qkv, do)
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


dense_attention_qkv.defvjp(_fwd_qkv, _bwd_qkv)
