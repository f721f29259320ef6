"""LoRA / AdaLoRA adapter pytrees.

Capability parity with the reference's PEFT path (trainers.py:472-722):
AdaLoraConfig(init_r=rank, target_modules=["q_proj","v_proj"],
lora_alpha=alpha, lora_dropout=0.05, tinit=0.1*max_steps,
tfinal=0.8*max_steps, deltaT=10, orth_reg_weight=0.8) at trainers.py:523-535.

TPU-native design: adapters are a SEPARATE pytree threaded through the model's
layer scan (models/whisper.py dense()); the frozen base never enters the grad
argnums, so no `prepare_model_for_kbit_training` / conv1 forward hook
(reference trainers.py:507-515) is needed. Each adapter holds the SVD-style
triple (a, e, b): delta(x) = scaling * ((x @ a) * e) @ b — plain LoRA when e
is all-ones and frozen; AdaLoRA trains e and masks it for rank pruning.

AdaLoRA rank allocation here follows the paper's sensitivity-based budgeting:
importance of triplet i = |e_i| * sensitivity(a_:,i) * sensitivity(b_i,:),
smoothed, with the global rank budget annealed cubically from init_r to
target_r between tinit and tfinal, re-allocated every deltaT steps — computed
with fixed shapes (masking, not resizing) so everything stays jittable.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# which projections get adapters, per attention block
TARGETS = ("q", "v")  # reference: target_modules=["q_proj", "v_proj"]


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 8                 # init_r
    alpha: float = 16.0           # lora_alpha
    dropout: float = 0.05
    adalora: bool = False
    target_rank: Optional[int] = None   # AdaLoRA final average rank (r)
    tinit_frac: float = 0.1       # reference trainers.py:528
    tfinal_frac: float = 0.8      # reference trainers.py:529
    delta_t: int = 10             # reference trainers.py:530
    orth_reg_weight: float = 0.8  # reference trainers.py:531
    beta1: float = 0.85           # sensitivity EMA (AdaLoRA defaults)
    beta2: float = 0.85

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def _init_adapter(key: jax.Array, L: int, d_in: int, d_out: int,
                  cfg: LoraConfig) -> Params:
    """One adapter stack for L layers. a ~ N(0, 0.02), b = 0 (standard LoRA
    init: delta starts at zero). e starts at ones (LoRA) and is trainable
    under AdaLoRA."""
    r = cfg.rank
    a = jax.random.normal(key, (L, d_in, r), jnp.float32) * 0.02
    return {
        "a": a,
        "e": jnp.ones((L, 1, r), jnp.float32),
        "b": jnp.zeros((L, r, d_out), jnp.float32),
        "scaling": jnp.full((L,), cfg.scaling, jnp.float32),
    }


def init_adapters(rng: jax.Array, model_cfg, cfg: LoraConfig,
                  encoder: bool = False) -> Params:
    """Adapter pytree matching models/whisper.py's expectations.

    encoder=True (framework default via --lora_targets all) additionally
    adapts encoder self-attention q,v — reference PEFT parity: PEFT's
    target_modules=["q_proj","v_proj"] (trainers.py:525) suffix-matches
    every attention block in the network, encoder included. encoder=False
    (--lora_targets decoder) is the lighter decoder-only placement whose
    encoder backward XLA drops entirely."""
    d = model_cfg.d_model
    keys = jax.random.split(rng, 8)
    out: Params = {"decoder": {
        "self_attn": {t: _init_adapter(keys[i], model_cfg.decoder_layers, d, d, cfg)
                      for i, t in enumerate(TARGETS)},
        "cross_attn": {t: _init_adapter(keys[2 + i], model_cfg.decoder_layers, d, d, cfg)
                       for i, t in enumerate(TARGETS)},
    }}
    if encoder:
        out["encoder"] = {t: _init_adapter(keys[4 + i], model_cfg.encoder_layers, d, d, cfg)
                          for i, t in enumerate(TARGETS)}
    return out


def num_adapter_params(adapters: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(adapters))


# ---------------------------------------------------------------------------
# AdaLoRA: budget schedule + sensitivity-based rank masking
# ---------------------------------------------------------------------------

def rank_budget(step: jax.Array, max_steps: int, cfg: LoraConfig) -> jax.Array:
    """Global average-rank budget b(t): init_r → target_r, cubic anneal
    between tinit and tfinal (AdaLoRA eq. 7)."""
    target = cfg.target_rank if cfg.target_rank is not None else max(cfg.rank // 2, 1)
    tinit = int(cfg.tinit_frac * max_steps)
    tfinal = int(cfg.tfinal_frac * max_steps)
    span = max(tfinal - tinit, 1)
    frac = jnp.clip((step - tinit) / span, 0.0, 1.0)
    b = target + (cfg.rank - target) * (1.0 - frac) ** 3
    return jnp.where(step < tinit, float(cfg.rank), b)


def _adapter_importance(ad: Params, grad: Params, sens: Params,
                        beta1: float) -> Tuple[jax.Array, Params]:
    """Smoothed sensitivity importance per (layer, rank) triplet."""
    new_sens = jax.tree.map(
        lambda s, p, g: beta1 * s + (1 - beta1) * jnp.abs(p * g), sens, ad, grad)
    imp_a = jnp.mean(new_sens["a"], axis=1)          # (L, r)
    imp_b = jnp.mean(new_sens["b"], axis=2)          # (L, r)
    imp_e = new_sens["e"][:, 0, :]                   # (L, r)
    return imp_a + imp_b + imp_e, new_sens


def init_sensitivity(adapters: Params) -> Params:
    return jax.tree.map(jnp.zeros_like, adapters)


def _is_adapter(node) -> bool:
    return isinstance(node, dict) and "a" in node and "e" in node


def init_rank_mask(adapters: Params) -> Params:
    """All-ones rank mask, one (L, 1, r) array per adapter stack."""
    def walk(ad):
        if _is_adapter(ad):
            return jnp.ones_like(ad["e"])
        return {k: walk(v) for k, v in ad.items()}
    return walk(adapters)


def apply_rank_mask(adapters: Params, mask: Optional[Params]) -> Params:
    """Non-destructive rank pruning: multiply e by the mask in the FORWARD
    only, keeping the stored e intact so a pruned triplet is fully
    recoverable if the allocator re-admits it (the paper's behavior; the
    reference gets it from `peft`'s RankAllocator)."""
    if mask is None:
        return adapters

    def walk(ad, m):
        if _is_adapter(ad):
            return {**ad, "e": ad["e"] * m}
        return {k: walk(ad[k], m[k]) for k in ad}
    return walk(adapters, mask)


def adalora_update_mask(adapters: Params, grads: Params, sens: Params,
                        mask: Params, step: jax.Array, max_steps: int,
                        cfg: LoraConfig) -> Tuple[Params, Params]:
    """Every deltaT steps: recompute importance and keep the globally top
    (budget × num_adapters × L) triplets; others get mask 0.

    Fixed-shape masking (never resizes) so the whole thing jits.
    Returns (new_rank_mask, new_sensitivity); the adapters themselves are
    untouched (see apply_rank_mask).
    """
    leaves_ad, treedef = jax.tree.flatten_with_path(adapters)
    # collect per-adapter importance
    imps = []
    new_sens = jax.tree.map(lambda x: x, sens)  # structural copy

    def per_adapter(ad, g, s):
        return _adapter_importance(ad, g, s, cfg.beta1)

    # walk matching subtrees of shape {"a","e","b","scaling"}
    def walk(ad, g, s):
        if isinstance(ad, dict) and "a" in ad and "e" in ad:
            imp, ns = per_adapter(ad, g, s)
            imps.append(imp)  # (L, r)
            return ns
        return {k: walk(ad[k], g[k], s[k]) for k in ad}

    new_sens = walk(adapters, grads, sens)
    all_imp = jnp.stack(imps)                       # (n_adapters, L, r)
    n_ad, L, r = all_imp.shape

    budget = rank_budget(step, max_steps, cfg)      # average rank target
    k_total = jnp.round(budget * n_ad * L).astype(jnp.int32)
    flat = all_imp.reshape(-1)
    # threshold = k_total-th largest importance (fixed-shape sort)
    order = jnp.sort(flat)[::-1]
    k_idx = jnp.clip(k_total - 1, 0, flat.size - 1)
    thresh = order[k_idx]
    keep = (all_imp >= thresh).astype(jnp.float32)  # (n_adapters, L, r)

    i = [0]

    def build_mask(m_old):
        if not isinstance(m_old, dict):
            m = keep[i[0]][:, None, :]              # (L, 1, r)
            i[0] += 1
            return m
        return {k: build_mask(m_old[k]) for k in m_old}

    do_update = (step % cfg.delta_t) == 0
    computed = build_mask(mask)
    new_mask = jax.tree.map(
        lambda new, old: jnp.where(do_update, new, old), computed, mask)
    return new_mask, new_sens


def orth_regularizer(adapters: Params, weight: float) -> jax.Array:
    """AdaLoRA orthogonality penalty: ||AᵀA − I||² + ||BBᵀ − I||² per layer."""
    total = jnp.float32(0.0)
    count = 0

    def walk(ad):
        nonlocal total, count
        if isinstance(ad, dict) and "a" in ad and "e" in ad:
            a, b = ad["a"], ad["b"]              # (L, d, r), (L, r, d)
            r = a.shape[-1]
            eye = jnp.eye(r, dtype=jnp.float32)
            ata = jnp.einsum("ldr,lds->lrs", a, a)
            bbt = jnp.einsum("lrd,lsd->lrs", b, b)
            total = total + jnp.sum((ata - eye) ** 2) + jnp.sum((bbt - eye) ** 2)
            count += a.shape[0] * 2
            return
        for k in ad:
            walk(ad[k])

    walk(adapters)
    return weight * total / max(count, 1)


def merge_adapters(params: Params, adapters: Optional[Params]) -> Params:
    """Fold adapter deltas into the base weights: w' = w + scaling·(a⊙e)@b.

    The eval-time equivalent of PEFT's `merge_and_unload` (the reference's
    PEFT evaluator reloads adapters onto the base model, evaluate_peft.py);
    exact at inference since lora_dropout only applies in training. Used by
    the fused Pallas decode path (ops/decoder_fused.py) so the kernels never
    see adapter pytrees. int8 bases ({"w_q8","w_scale"}) are dequantized to
    fp32 before the delta lands (capacity, not speed, is int8's job here).
    """
    if adapters is None:
        return params
    merged = jax.tree.map(lambda x: x, params)  # shallow-ish structural copy

    def delta(ad: Params) -> jax.Array:
        ae = ad["a"] * ad["e"]                     # (L, d, r)
        return jnp.einsum("ldr,lrk->ldk", ae, ad["b"]) \
            * ad["scaling"][:, None, None]

    def fold(wp: Params, ad: Params) -> Params:
        if "w_q8" in wp:
            w = wp["w_q8"].astype(jnp.float32) * wp["w_scale"].astype(jnp.float32)
        else:
            w = wp["w"]
        out = dict(wp)
        out.pop("w_q8", None)
        out.pop("w_scale", None)
        out["w"] = (w + delta(ad).astype(w.dtype))
        return out

    if "encoder" in adapters:
        attn = dict(merged["encoder"]["layers"]["attn"])
        for t, ad in adapters["encoder"].items():
            attn[t] = fold(attn[t], ad)
        layers = dict(merged["encoder"]["layers"])
        layers["attn"] = attn
        enc = dict(merged["encoder"])
        enc["layers"] = layers
        merged["encoder"] = enc
    if "decoder" in adapters:
        layers = dict(merged["decoder"]["layers"])
        for block, ads in adapters["decoder"].items():
            blk = dict(layers[block])
            for t, ad in ads.items():
                blk[t] = fold(blk[t], ad)
            layers[block] = blk
        dec = dict(merged["decoder"])
        dec["layers"] = layers
        merged["decoder"] = dec
    return merged
