"""Optimizer + LR schedule factory.

Capability parity with the reference's Seq2SeqTrainingArguments optimizer
wiring (finetune/training/trainers/trainers.py:385-469): AdamW with
beta1=0.9, beta2=0.98 (hardcoded there at :447-448), weight decay,
linear/cosine schedules with warmup_steps or warmup_ratio
(ray_searchers_and_schedulers.py:123-128), and global-norm grad clipping
(HF default max_grad_norm=1.0).

TPU-native: a single optax chain; optimizer state sharding (the ZeRO-3
equivalent, reference trainers.py:400-434) is applied by parallel/sharding.py
over this state pytree.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import optax


def adapter_freeze_mask(adapters: Any, adalora: bool) -> Any:
    """Trainability mask for a LoRA adapter pytree (True = trained).

    The reference's PEFT setup trains only lora_A/lora_B (plus lora_E under
    AdaLoRA); `scaling` is the constant alpha/rank. Without this mask,
    adamw weight-decays `scaling` and (plain-LoRA) `e` away from their
    constants.
    """
    def assign(path, leaf):
        name = path[-1].key if path and hasattr(path[-1], "key") else ""
        if name == "scaling":
            return False
        if name == "e" and not adalora:
            return False
        return True

    return jax.tree_util.tree_map_with_path(assign, adapters)


def make_lr_schedule(learning_rate: float, max_steps: int,
                     scheduler: str = "linear",
                     warmup_steps: Optional[int] = None,
                     warmup_ratio: Optional[float] = None) -> optax.Schedule:
    """linear|cosine|constant decay to 0 with linear warmup."""
    if warmup_steps is None:
        warmup_steps = int(round((warmup_ratio or 0.0) * max_steps))
    warmup_steps = min(warmup_steps, max_steps)

    warmup = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
    decay_steps = max(max_steps - warmup_steps, 1)
    if scheduler == "linear":
        decay = optax.linear_schedule(learning_rate, 0.0, decay_steps)
    elif scheduler == "cosine":
        decay = optax.cosine_decay_schedule(learning_rate, decay_steps)
    elif scheduler == "constant":
        decay = optax.constant_schedule(learning_rate)
    else:
        raise ValueError(f"unknown lr scheduler {scheduler!r}")
    if warmup_steps == 0:
        return decay
    return optax.join_schedules([warmup, decay], [warmup_steps])


def make_optimizer(learning_rate: float, max_steps: int,
                   scheduler: str = "linear",
                   warmup_steps: Optional[int] = None,
                   warmup_ratio: Optional[float] = None,
                   weight_decay: float = 0.0,
                   adam_beta1: float = 0.9,
                   adam_beta2: float = 0.98,  # reference trainers.py:447-448
                   adam_eps: float = 1e-8,
                   max_grad_norm: float = 1.0,
                   trainable_mask: Optional[Any] = None
                   ) -> optax.GradientTransformation:
    sched = make_lr_schedule(learning_rate, max_steps, scheduler,
                             warmup_steps, warmup_ratio)
    parts = []
    if max_grad_norm and max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(optax.adamw(sched, b1=adam_beta1, b2=adam_beta2,
                             eps=adam_eps, weight_decay=weight_decay))
    tx = optax.chain(*parts)
    if trainable_mask is not None:
        # frozen leaves get zero updates AND no weight decay / clip share
        labels = jax.tree.map(
            lambda t: "train" if t else "freeze", trainable_mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx
