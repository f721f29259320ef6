"""Fused Pallas kernels for the autoregressive decoder step.

The measured decode bottleneck (ARCHITECTURE.md, round-1 diagnosis) is op
dispatch: one greedy token-step through a 32-layer large-v3 decoder issues
~500 tiny XLA fusions (~15 per scanned layer), each paying fixed overhead on
a (B, 1, d) activation, for 11-15 ms/step at bs 8 — while the unavoidable
work (streaming ~46 MB of layer weights plus the cross-attention K/V from
HBM) bounds the step at ~4-5 ms. These kernels rebuild the layer as FOUR
bandwidth-saturating Pallas calls so the step runs at the HBM floor:

  1. fused_qkv         ln1 + q/k/v projections (one VMEM-resident matmul set)
  2. fused_attn        online-softmax attention over the cached self-KV,
                       streamed in (1, Tc, d) blocks per batch row, fused
                       with the output projection and residual add
  3. fused_attn        the same kernel over the precomputed cross K/V
                       (ln2 + q-projection folded in, int8 KV dequant fused)
  4. fused_mlp         ln3 + fc1 + GELU + fc2 + residual, weights streamed
                       in (d, Fc) column blocks

Head handling without transposes: K/V stay DENSE (T, d = H*hd) and per-head
score/normalizer bookkeeping goes through a constant 0/1 head-expansion
matrix M (d, HP) with M[j, h] = 1 iff j // hd == h  (HP = 128 padded head
columns):   scores (T, HP) = (K * q) @ M       # k·q per head, on the MXU
            out    (1, d)  = sum_h pv[h] ⊙ Mᵀ  # pv = pᵀ @ V
so every matmul is a plain 2D contraction with 128-multiple shapes — no
(B, T, H, hd) relayouts, which is what blocked the round-1 log-mel kernel.

Capability parity: replaces the per-token work of HF WhisperDecoderLayer
under `generate` (reference inherits it via custom_seq2seq_trainers.py:
235-243 and evaluate_peft.py:370-430); the reference's CUDA analogue is
torch SDPA + cuBLAS per-op dispatch.

All wrappers take `interpret=` (default: auto — True off-TPU) so the same
code path is unit-tested on CPU in interpret mode and compiled on TPU.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEAD_DIM = 64     # every released Whisper variant uses 64-dim heads
HP = 128          # padded head columns (lane width); supports up to 128 heads
NEG = -1e30       # finite -inf: keeps exp()/max() NaN-free in masked blocks


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _head_matrices(d: int, hd: int = HEAD_DIM) -> Tuple[np.ndarray, np.ndarray]:
    """M (d, HP) with M[j, h] = 1 iff j // hd == h, and its transpose."""
    assert d % hd == 0 and d // hd <= HP
    m = np.zeros((d, HP), np.float32)
    m[np.arange(d), np.arange(d) // hd] = 1.0
    return m, m.T.copy()


def _erf(x):
    """erf via Abramowitz–Stegun 7.1.26 (|err| ≤ 1.5e-7): Mosaic lowers
    neither erf nor erfc, and 1.5e-7 is below fp32 noise for GELU."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _ln(x, scale, bias, eps=1e-5):
    """fp32 layer norm over the last axis (matches models/whisper.layer_norm)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)


def _row(x):
    """(d,) param → (1, d) operand (TPU wants ≥2D)."""
    return x.reshape(1, -1)


# ---------------------------------------------------------------------------
# kernel 1: ln + fused q/k/v projection
# ---------------------------------------------------------------------------

def _qkv_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, wv_ref,
                bv_ref, sq_ref, sk_ref, sv_ref, q_ref, k_ref, v_ref,
                *, q_scale, w_quant):
    h = _ln(x_ref[:], lns_ref[:], lnb_ref[:])
    # int8 weights are cast up to the activation dtype at use (VPU-cheap)
    hw = h.astype(x_ref.dtype if w_quant else wq_ref.dtype)

    def proj(w_ref, s_ref):
        w = w_ref[:].astype(hw.dtype) if w_quant else w_ref[:]
        y = jnp.dot(hw, w, preferred_element_type=jnp.float32)
        # per-output-channel int8 scale commutes through the matmul
        return y * s_ref[:] if w_quant else y

    q_ref[:] = (proj(wq_ref, sq_ref)
                + bq_ref[:].astype(jnp.float32)) * q_scale
    k_ref[:] = proj(wk_ref, sk_ref).astype(k_ref.dtype)
    v_ref[:] = (proj(wv_ref, sv_ref)
                + bv_ref[:].astype(jnp.float32)).astype(v_ref.dtype)


def fused_qkv(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
              wq: jax.Array, bq: jax.Array, wk: jax.Array,
              wv: jax.Array, bv: jax.Array,
              wq_scale: Optional[jax.Array] = None,
              wk_scale: Optional[jax.Array] = None,
              wv_scale: Optional[jax.Array] = None,
              kv_dtype=None,
              interpret: Optional[bool] = None
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x (B, d) → (q (B, d) fp32 pre-scaled by hd^-0.5, k (B, d), v (B, d)).

    w*_scale (1, d) fp32: present when the weights are streamed as int8
    (per-output-channel symmetric, ops/quant.py layout); dequantization is
    the post-matmul column scale, so int8 halves the weight HBM traffic at
    zero MXU cost."""
    B, d = x.shape
    kv_dtype = kv_dtype or x.dtype
    if interpret is None:
        interpret = _interpret_default()
    w_quant = wq_scale is not None
    dummy = jnp.zeros((8, 128), jnp.float32)
    scales = ((wq_scale, wk_scale, wv_scale) if w_quant
              else (dummy, dummy, dummy))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_qkv_kernel, q_scale=HEAD_DIM ** -0.5,
                          w_quant=w_quant),
        out_shape=(jax.ShapeDtypeStruct((B, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, d), kv_dtype),
                   jax.ShapeDtypeStruct((B, d), kv_dtype)),
        in_specs=[vspec] * 11,
        out_specs=(vspec, vspec, vspec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, _row(ln_scale), _row(ln_bias), wq, _row(bq), wk, wv, _row(bv),
      *scales)


# ---------------------------------------------------------------------------
# kernels 2+3: online-softmax attention over streamed dense KV
# (one kernel source; self-attn passes q + a position bound, cross-attn
#  computes q in-kernel from ln2(x) and masks the static padded tail)
# ---------------------------------------------------------------------------

def _attn_kernel(pos_ref, q_ref, xres_ref, lns_ref, lnb_ref, wq_ref, bq_ref,
                 k_ref, v_ref, ksc_ref, vsc_ref, m_ref, mt_ref,
                 wo_ref, bo_ref, sq_ref, so_ref, out_ref,
                 q_s, acc_s, m_s, l_s,
                 *, Tc, n_j, s_valid, q_in_kernel, q_scale, quantized,
                 w_quant):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)
        if q_in_kernel:
            h = _ln(xres_ref[0], lns_ref[:], lnb_ref[:])
            h = h.astype(xres_ref.dtype if w_quant else wq_ref.dtype)
            wqm = wq_ref[:].astype(h.dtype) if w_quant else wq_ref[:]
            q = jnp.dot(h, wqm, preferred_element_type=jnp.float32)
            if w_quant:
                q = q * sq_ref[:]
            q = (q + bq_ref[:].astype(jnp.float32)) * q_scale
        else:
            q = q_ref[0]
        if quantized:
            # fold K's per-(batch, head) dequant scale into q once per row:
            # (k_q8 ⊙ ksc) · q == k_q8 · (q ⊙ ksc). V's scale folds into the
            # accumulator at finalize. The streamed chunks then pay only the
            # int8→compute cast, not two dequant multiplies.
            q = q * ksc_ref[0].astype(jnp.float32)
        q_s[:] = q

    k = k_ref[0]
    v = v_ref[0]
    if quantized:
        k = k.astype(m_ref.dtype)
        v = v.astype(m_ref.dtype)
    tmp = k * q_s[:].astype(k.dtype)                      # (Tc, d)
    s = jnp.dot(tmp, m_ref[:], preferred_element_type=jnp.float32)  # (Tc, HP)

    # mask invalid key rows: self-attn → col > pos; cross-attn → padded tail
    col = j * Tc + jax.lax.broadcasted_iota(jnp.int32, (Tc, 1), 0)
    if s_valid is not None:
        valid = col < s_valid
    else:
        valid = col <= pos_ref[0]
    s = jnp.where(valid, s, NEG)

    m_new = jnp.maximum(m_s[:], jnp.max(s, axis=0, keepdims=True))  # (1, HP)
    corr = jnp.exp(m_s[:] - m_new)
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)          # (Tc, HP)
    l_s[:] = l_s[:] * corr + jnp.sum(p, axis=0, keepdims=True)
    m_s[:] = m_new

    # pv[h, :] = sum_t p[t, h] * v[t, :]; keep only each head's own block
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (HP, d)
    corr_d = jnp.dot(corr, mt_ref[:], preferred_element_type=jnp.float32)
    acc_s[:] = acc_s[:] * corr_d + jnp.sum(
        pv * mt_ref[:].astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(j == n_j - 1)
    def _fin():
        l_exp = jnp.dot(l_s[:], mt_ref[:], preferred_element_type=jnp.float32)
        acc = acc_s[:]
        if quantized:
            acc = acc * vsc_ref[0].astype(jnp.float32)     # V dequant, once
        o_dt = xres_ref.dtype if w_quant else wo_ref.dtype
        o = (acc / l_exp).astype(o_dt)                     # (1, d)
        wom = wo_ref[:].astype(o_dt) if w_quant else wo_ref[:]
        out = jnp.dot(o, wom, preferred_element_type=jnp.float32)
        if w_quant:
            out = out * so_ref[:]
        out = out + bo_ref[:].astype(jnp.float32) + xres_ref[0].astype(jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)


def _pick_tc(T: int, prefer=(512, 256, 128)) -> int:
    for tc in prefer:
        if T % tc == 0:
            return tc
    raise ValueError(f"KV length {T} must be a multiple of 128")


def fused_attn(x: jax.Array, k: jax.Array, v: jax.Array,
               wo: jax.Array, bo: jax.Array,
               q: Optional[jax.Array] = None,
               pos: Optional[jax.Array] = None,
               s_valid: Optional[int] = None,
               ln_scale: Optional[jax.Array] = None,
               ln_bias: Optional[jax.Array] = None,
               wq: Optional[jax.Array] = None,
               bq: Optional[jax.Array] = None,
               k_scale: Optional[jax.Array] = None,
               v_scale: Optional[jax.Array] = None,
               wq_scale: Optional[jax.Array] = None,
               wo_scale: Optional[jax.Array] = None,
               interpret: Optional[bool] = None) -> jax.Array:
    """Single-query attention over dense KV + output proj + residual.

    x (B, d) residual input; k/v (B, T, d) with T a 128-multiple.
    Self-attention: pass q (B, d) (from fused_qkv, pre-scaled) and pos —
    keys at col > pos are masked. Cross-attention: pass ln_scale/ln_bias/
    wq/bq instead (q computed in-kernel) and s_valid = real source length
    (the padded tail beyond it is masked).
    int8 KV: pass k/v as int8 with k_scale/v_scale (B, d) per-(batch, head)
    dequant scales expanded over d; dequant is fused into the streamed read.
    int8 weights: pass wq/wo as int8 with wq_scale/wo_scale (1, d)
    per-output-channel scales (applied post-matmul).
    """
    B, d = x.shape
    T = k.shape[1]
    Tc = _pick_tc(T)
    n_j = T // Tc
    if interpret is None:
        interpret = _interpret_default()
    q_in_kernel = q is None
    quantized = k_scale is not None
    w_quant = wo_scale is not None
    # dtype the dequantized / raw KV is used in inside the kernel
    comp_dtype = ((jnp.float32 if interpret else jnp.bfloat16)
                  if quantized else k.dtype)
    m_np, mt_np = _head_matrices(d)
    m_mat = jnp.asarray(m_np, comp_dtype)
    mt_mat = jnp.asarray(mt_np, jnp.float32)

    zero_row = jnp.zeros((1, d), jnp.float32)
    pos_arr = (jnp.zeros((1,), jnp.int32) if pos is None
               else jnp.asarray(pos, jnp.int32).reshape(1))
    q_arr = jnp.zeros((B, d), jnp.float32) if q is None else q
    lns = zero_row if ln_scale is None else _row(ln_scale)
    lnb = zero_row if ln_bias is None else _row(ln_bias)
    # unused operands shrink to a tile so they cost no VMEM/DMA
    wq_arr = jnp.zeros((8, 128), wo.dtype) if wq is None else wq
    bq_arr = zero_row if bq is None else _row(bq)
    ksc = jnp.zeros((B, d), jnp.float32) if k_scale is None else k_scale
    vsc = jnp.zeros((B, d), jnp.float32) if v_scale is None else v_scale

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    res = pl.BlockSpec((d, d), lambda b, j: (0, 0), memory_space=pltpu.VMEM)
    wq_spec = pl.BlockSpec(wq_arr.shape, lambda b, j: (0, 0),
                           memory_space=pltpu.VMEM)
    # per-batch-row operands carry a middle singleton so the (1, 1, d)
    # block's last two dims equal the array dims (Mosaic block rule)
    row_b = pl.BlockSpec((1, 1, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    row_1 = pl.BlockSpec((1, d), lambda b, j: (0, 0), memory_space=pltpu.VMEM)
    kv_blk = pl.BlockSpec((1, Tc, d), lambda b, j: (b, j, 0),
                          memory_space=pltpu.VMEM)

    dummy = jnp.zeros((8, 128), jnp.float32)
    sq_arr = wq_scale if (w_quant and q_in_kernel) else dummy
    so_arr = wo_scale if w_quant else dummy
    full = lambda a: pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _attn_kernel, Tc=Tc, n_j=n_j, s_valid=s_valid,
        q_in_kernel=q_in_kernel, q_scale=HEAD_DIM ** -0.5,
        quantized=quantized, w_quant=w_quant)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_j),
        out_shape=jax.ShapeDtypeStruct((B, 1, d), x.dtype),
        in_specs=[
            smem,                                            # pos
            row_b,                                           # q
            row_b,                                           # x residual
            row_1, row_1,                                    # ln scale/bias
            wq_spec, row_1,                                  # wq, bq
            kv_blk, kv_blk,                                  # k, v
            row_b, row_b,                                    # k/v dequant scales
            pl.BlockSpec((d, HP), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),           # M
            pl.BlockSpec((HP, d), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),           # Mᵀ
            res, row_1,                                      # wo, bo
            full(sq_arr), full(so_arr),                      # int8 w scales
        ],
        out_specs=row_b,
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),                 # q
            pltpu.VMEM((1, d), jnp.float32),                 # acc
            pltpu.VMEM((1, HP), jnp.float32),                # m
            pltpu.VMEM((1, HP), jnp.float32),                # l
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pos_arr, q_arr[:, None, :], x[:, None, :], lns, lnb, wq_arr, bq_arr,
      k, v, ksc[:, None, :], vsc[:, None, :], m_mat, mt_mat, wo, _row(bo),
      sq_arr, so_arr)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# kernel 4: ln + MLP (fc1 → GELU → fc2) + residual, streamed over ff columns
# ---------------------------------------------------------------------------

def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                s1_ref, s2_ref, out_ref, h_s, acc_s, *, n_f, w_quant):
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _init():
        h_s[:] = _ln(x_ref[:], lns_ref[:], lnb_ref[:]).astype(h_s.dtype)
        acc_s[:] = jnp.zeros_like(acc_s)

    w1 = w1_ref[:].astype(h_s.dtype) if w_quant else w1_ref[:]
    t = jnp.dot(h_s[:], w1, preferred_element_type=jnp.float32)
    if w_quant:
        t = t * s1_ref[:]
    t = t + b1_ref[:].astype(jnp.float32)
    g = _gelu_exact(t)                                     # (B, Fc) fp32
    w2 = w2_ref[:].astype(h_s.dtype) if w_quant else w2_ref[:]
    acc_s[:] += jnp.dot(g.astype(w2.dtype), w2,
                        preferred_element_type=jnp.float32)

    @pl.when(f == n_f - 1)
    def _fin():
        out = acc_s[:]
        if w_quant:
            # fc2's per-column scale factors out of the chunk sum
            out = out * s2_ref[:]
        out = out + b2_ref[:].astype(jnp.float32) \
            + x_ref[:].astype(jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)


def fused_mlp(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
              w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
              w1_scale: Optional[jax.Array] = None,
              w2_scale: Optional[jax.Array] = None,
              interpret: Optional[bool] = None) -> jax.Array:
    """x (B, d) → ln → fc1 (d, ff) → exact GELU → fc2 (ff, d) → + x.

    w1_scale (1, ff) / w2_scale (1, d): int8 per-output-channel dequant
    scales (ops/quant.py layout), applied post-matmul."""
    B, d = x.shape
    ff = w1.shape[1]
    Fc = _pick_tc(ff)
    n_f = ff // Fc
    if interpret is None:
        interpret = _interpret_default()
    w_quant = w1_scale is not None
    dummy = jnp.zeros((8, 128), jnp.float32)
    s1 = w1_scale if w_quant else dummy
    s2 = w2_scale if w_quant else dummy
    s1_spec = (pl.BlockSpec((1, Fc), lambda f: (0, f),
                            memory_space=pltpu.VMEM) if w_quant
               else pl.BlockSpec(dummy.shape, lambda f: (0, 0),
                                 memory_space=pltpu.VMEM))
    s2_spec = pl.BlockSpec(s2.shape, lambda f: (0, 0),
                           memory_space=pltpu.VMEM)
    res_b = pl.BlockSpec((B, d), lambda f: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, d), lambda f: (0, 0), memory_space=pltpu.VMEM)
    h_dtype = x.dtype if w_quant else w1.dtype
    return pl.pallas_call(
        functools.partial(_mlp_kernel, n_f=n_f, w_quant=w_quant),
        grid=(n_f,),
        out_shape=jax.ShapeDtypeStruct((B, d), x.dtype),
        in_specs=[
            res_b, row, row,
            pl.BlockSpec((d, Fc), lambda f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fc), lambda f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((Fc, d), lambda f: (f, 0), memory_space=pltpu.VMEM),
            row,
            s1_spec, s2_spec,
        ],
        out_specs=res_b,
        scratch_shapes=[
            pltpu.VMEM((B, d), h_dtype),                    # ln(x)
            pltpu.VMEM((B, d), jnp.float32),                # fc2 accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, _row(ln_scale), _row(ln_bias), w1, _row(b1), w2, _row(b2), s1, s2)
