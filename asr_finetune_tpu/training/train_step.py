"""The jitted training step: loss, grads, AdamW update, grad accumulation.

Replaces the reference's HF `Seq2SeqTrainer.training_step` + fp16 autocast +
DDP allreduce + DeepSpeed engine (trainers.py:725-937, 472-722) with ONE
compiled XLA program:

- bf16 compute / fp32 master params (vs the reference's fp16 AMP)
- gradient accumulation via `lax.scan` over microbatches
  (reference: HF gradient_accumulation_steps, trainers.py:438)
- DP gradient reduction is implicit: batch sharded over the mesh "data"
  axis → XLA inserts the psum (reference: NCCL allreduce via DDP)
- full fine-tune and PEFT (LoRA/AdaLoRA adapters-only grads) in the same
  step function; frozen base = not differentiated, no autograd hooks
- optional on-device log-mel: feed raw audio and fuse the frontend into the
  step (the reference pays host CPU for this, SURVEY.md §3.1 hot loops)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import whisper as W
from ..models.configs import WhisperConfig
from ..ops import logmel as logmel_ops
from ..ops.spec_augment import spec_augment
from . import lora as lora_lib

Params = Dict[str, Any]


@dataclasses.dataclass
class TrainStepConfig:
    mode: str = "full"                  # "full" | "peft"
    accum_steps: int = 1
    compute_dtype: Any = jnp.bfloat16
    remat: bool = True
    label_smoothing: float = 0.0
    on_device_logmel: bool = False       # batch carries "audio" not "mel"
    n_mels: int = 80
    spec_augment: bool = False           # on-device SpecAugment (train only)
    attn_impl: str = "auto"              # encoder: flash where available
    decoder_attn_impl: str = "xla"       # decoder: short padded seqs don't
                                         # amortize flash pad/transpose cost
                                         # (see models/whisper.py forward)
    fused_ce: bool = True                # chunked CE; (B,T,V) fp32 logits
                                         # never materialize (ops/fused_ce.py)
    max_steps: int = 10000
    lora: Optional[lora_lib.LoraConfig] = None
    seed: int = 0                        # base of the per-step RNG stream
                                         # (SpecAugment + LoRA dropout);
                                         # run.py folds trial identity in so
                                         # HPO trials draw decorrelated
                                         # augmentation noise and seed sweeps
                                         # actually vary


def make_train_state(params: Params, tx: optax.GradientTransformation,
                     adapters: Optional[Params] = None,
                     adalora: bool = False) -> Dict[str, Any]:
    trainable = adapters if adapters is not None else params
    state = {
        "step": jnp.zeros((), jnp.int32),
        "params": params,
        "adapters": adapters,
        "opt_state": tx.init(trainable),
    }
    if adalora and adapters is not None:
        state["sensitivity"] = lora_lib.init_sensitivity(adapters)
        state["rank_mask"] = lora_lib.init_rank_mask(adapters)
    return state


def _get_mel(batch: Dict[str, jax.Array], cfg: TrainStepConfig) -> jax.Array:
    if cfg.on_device_logmel:
        return logmel_ops.log_mel_spectrogram(batch["audio"], n_mels=cfg.n_mels)
    return batch["mel"]


def make_loss_fn(model_cfg: WhisperConfig, cfg: TrainStepConfig):
    def loss_fn(trainable: Params, frozen: Optional[Params],
                batch: Dict[str, jax.Array],
                rng: Optional[jax.Array] = None,
                rank_mask: Optional[Params] = None
                ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if cfg.mode == "peft":
            params, adapters = frozen, trainable
            # AdaLoRA rank pruning is applied in the forward only, so the
            # stored e stays recoverable (lora.apply_rank_mask)
            adapters = lora_lib.apply_rank_mask(adapters, rank_mask)
        else:
            params, adapters = trainable, None
        mel = _get_mel(batch, cfg)
        if cfg.spec_augment and rng is not None:
            mel = spec_augment(jax.random.fold_in(rng, 0), mel)
        lora_dropout = 0.0
        dropout_rng = None
        if cfg.mode == "peft" and cfg.lora and rng is not None:
            lora_dropout = cfg.lora.dropout
            dropout_rng = jax.random.fold_in(rng, 1)
        out = W.forward(params, mel, batch["decoder_input_ids"], model_cfg,
                        adapters=adapters, compute_dtype=cfg.compute_dtype,
                        remat=cfg.remat, attn_impl=cfg.attn_impl,
                        decoder_attn_impl=cfg.decoder_attn_impl,
                        lora_dropout=lora_dropout, dropout_rng=dropout_rng,
                        return_hidden=cfg.fused_ce)
        if cfg.fused_ce:
            from ..ops.fused_ce import fused_cross_entropy
            loss, n_tok = fused_cross_entropy(
                out, params["decoder"]["embed"], batch["labels"],
                cfg.label_smoothing, embed_grad=(cfg.mode == "full"))
        else:
            loss, n_tok = W.cross_entropy(out, batch["labels"],
                                          cfg.label_smoothing)
        metrics = {"loss": loss, "tokens": n_tok}
        if cfg.mode == "peft" and cfg.lora and cfg.lora.adalora \
                and cfg.lora.orth_reg_weight > 0:
            reg = lora_lib.orth_regularizer(adapters, cfg.lora.orth_reg_weight)
            metrics["orth_reg"] = reg
            loss = loss + reg
        return loss, metrics

    return loss_fn


def make_train_step(model_cfg: WhisperConfig, tx: optax.GradientTransformation,
                    cfg: TrainStepConfig,
                    opt_placements=None, frozen_placements=None) -> Callable:
    """Returns step(state, batch) → (state, metrics).

    For accum_steps > 1, every batch leaf must have leading shape
    (accum_steps, microbatch, ...); grads are averaged over microbatches.

    opt_placements / frozen_placements: optional (device_shardings,
    host_shardings) pairs for host-offloaded state — the TPU analogue of
    DeepSpeed ZeRO-3's `offload_optimizer` / `offload_param` (reference
    trainers.py:400-434). When set, the corresponding state lives in
    pinned host memory between steps (parallel/sharding.py
    host_offload_shardings) and the step device_puts it to HBM at use.
    With frozen_placements the signature changes to
    step(state_without_params, batch, frozen_params): the base is a
    SEPARATE, never-donated argument that does not round-trip through the
    jit (jit outputs always land in device memory, so a pass-through would
    silently re-materialize the base in HBM — and donating it would free
    the host buffer). The caller keeps the host-resident array and
    re-attaches it (see training/trainer.py / offload_opt_state).
    """
    loss_fn = make_loss_fn(model_cfg, cfg)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def single_grads(trainable, frozen, batch, rng, rank_mask):
        (loss, metrics), grads = grad_fn(trainable, frozen, batch, rng,
                                         rank_mask)
        return grads, metrics

    def accum_grads(trainable, frozen, batch, rng, rank_mask):
        def body(carry, xs):
            microbatch, mb_rng = xs
            g_acc, m_acc = carry
            g, m = single_grads(trainable, frozen, microbatch, mb_rng,
                                rank_mask)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            m_acc = {k: m_acc[k] + m[k] for k in m_acc}
            return (g_acc, m_acc), None

        g0 = jax.tree.map(lambda x: jnp.zeros_like(x), trainable)
        m0 = {"loss": jnp.float32(0.0), "tokens": jnp.int32(0)}
        if cfg.mode == "peft" and cfg.lora and cfg.lora.adalora \
                and cfg.lora.orth_reg_weight > 0:
            m0["orth_reg"] = jnp.float32(0.0)
        rngs = jax.random.split(rng, cfg.accum_steps)
        (g, m), _ = jax.lax.scan(body, (g0, m0), (batch, rngs))
        inv = 1.0 / cfg.accum_steps
        g = jax.tree.map(lambda x: x * inv, g)
        m = {k: (v * inv if v.dtype != jnp.int32 else v) for k, v in m.items()}
        return g, m

    def step(state: Dict[str, Any], batch: Dict[str, jax.Array],
             frozen_params: Optional[Params] = None):
        peft = cfg.mode == "peft"
        trainable = state["adapters"] if peft else state["params"]
        if peft and frozen_placements is not None:
            # offloaded base arrives as the separate host-resident arg;
            # gather it into HBM for this step's forward/backward
            frozen = jax.tree.map(jax.device_put, frozen_params,
                                  frozen_placements[0])
        else:
            frozen = state["params"] if peft else None

        rank_mask = state.get("rank_mask")
        rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), state["step"])
        if cfg.accum_steps > 1:
            grads, metrics = accum_grads(trainable, frozen, batch, rng,
                                         rank_mask)
        else:
            grads, metrics = single_grads(trainable, frozen, batch, rng,
                                          rank_mask)

        opt_in = state["opt_state"]
        if opt_placements is not None:
            # host->HBM gather inside the step; the scatter BACK to pinned
            # host happens outside the jit (offload_opt_state below): XLA's
            # CPU backend ignores in-jit host-placement annotations on
            # outputs and rejects host-kind out_shardings, and the
            # outside-jit device_put is an async DMA either way
            opt_in = jax.tree.map(jax.device_put, opt_in, opt_placements[0])
        updates, new_opt = tx.update(grads, opt_in, trainable)
        new_trainable = optax.apply_updates(trainable, updates)

        new_state = dict(state)
        new_state["opt_state"] = new_opt
        new_state["step"] = state["step"] + 1
        if peft:
            new_state["adapters"] = new_trainable
            if cfg.lora and cfg.lora.adalora and "sensitivity" in state:
                mask, sens = lora_lib.adalora_update_mask(
                    new_trainable, grads, state["sensitivity"], rank_mask,
                    state["step"], cfg.max_steps, cfg.lora)
                new_state["rank_mask"] = mask
                new_state["sensitivity"] = sens
        else:
            new_state["params"] = new_trainable

        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def offload_opt_state(state: Dict[str, Any], host_shardings) -> Dict[str, Any]:
    """Scatter the step's freshly-updated optimizer state back to pinned
    host memory (async DMA; overlaps the next step's forward). Pair with
    make_train_step(opt_placements=...) — see its docstring for why this
    leg lives outside the jit."""
    out = dict(state)
    out["opt_state"] = jax.tree.map(jax.device_put, state["opt_state"],
                                    host_shardings)
    return out


def make_eval_loss_step(model_cfg: WhisperConfig, cfg: TrainStepConfig) -> Callable:
    """eval step: batch → (loss, num_tokens); jit-friendly."""
    loss_fn = make_loss_fn(model_cfg, cfg)

    def step(state: Dict[str, Any], batch: Dict[str, jax.Array]):
        peft = cfg.mode == "peft"
        trainable = state["adapters"] if peft else state["params"]
        frozen = state["params"] if peft else None
        loss, metrics = loss_fn(trainable, frozen, batch, None,
                                state.get("rank_mask"))
        return metrics

    return step
