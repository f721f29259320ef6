"""GSPMD sharding rules for Whisper param/optimizer/adapter pytrees.

TPU-native replacements for the reference's parallelism mechanisms
(SURVEY.md §2.3):
- DP gradient allreduce (torch DDP/NCCL, trainers.py:785-791,914) →
  batch sharded over the "data" mesh axis; XLA inserts the psum.
- DeepSpeed ZeRO-3 optimizer/param sharding with CPU offload
  (trainers.py:400-434) → `zero_shardings`: optimizer state (and optionally
  fp32 master params) sharded over "data"; XLA inserts
  reduce-scatter/all-gather as needed. No host offload required at Whisper
  scale, but the same helper applies to any pytree.
- Tensor parallelism (absent in reference) → `param_shardings`: attention
  head and MLP hidden dims over "model".
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

Params = Dict[str, Any]


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def param_shardings(params: Params, mesh: Mesh) -> Params:
    """Tensor-parallel layout:

    - q/k/v and fc1 weights (L, d_in, d_out): output dim over "model"
    - o and fc2 weights (L, d_in, d_out): input (contracting) dim over "model"
      → XLA psums the partial attention/MLP outputs
    - matching biases sharded to their weight's output layout
    - embeddings / layernorms / convs replicated
    """
    model_size = mesh.shape[MODEL_AXIS]

    def assign(path: tuple, leaf: jax.Array) -> NamedSharding:
        keys = [p.key for p in path if hasattr(p, "key")]
        name = keys[-1] if keys else ""
        parent = keys[-2] if len(keys) >= 2 else ""
        stacked = leaf.ndim >= 1 and "layers" in keys

        def ok(dim_size):
            return dim_size % model_size == 0

        if parent in ("q", "k", "v", "fc1"):
            # int8 bases (ops/quant.py) shard exactly like their fp weights
            if name in ("w", "w_q8") and leaf.ndim == 3 and ok(leaf.shape[2]):
                return _ns(mesh, None, None, MODEL_AXIS)
            if name == "w_scale" and leaf.ndim == 3 and ok(leaf.shape[2]):
                return _ns(mesh, None, None, MODEL_AXIS)
            if name == "b" and leaf.ndim == 2 and ok(leaf.shape[1]):
                return _ns(mesh, None, MODEL_AXIS)
        if parent in ("o", "fc2"):
            if name in ("w", "w_q8") and leaf.ndim == 3 and ok(leaf.shape[1]):
                return _ns(mesh, None, MODEL_AXIS, None)
            # bias and per-OUTPUT-channel w_scale after a psum-reduced
            # matmul stay replicated
        return _ns(mesh)

    return jax.tree_util.tree_map_with_path(assign, params)


def adapter_shardings(adapters: Params, mesh: Mesh) -> Params:
    """LoRA adapters are tiny; keep them replicated (rank dims are far below
    tiling granularity)."""
    return jax.tree.map(lambda _: _ns(mesh), adapters)


def zero_shardings(tree: Params, mesh: Mesh) -> Params:
    """ZeRO-style sharding: each leaf split over "data" along its largest
    divisible axis; small/indivisible leaves replicated.

    Applied to optimizer state (Adam m/v) — the GSPMD equivalent of
    DeepSpeed ZeRO's optimizer partitioning (reference trainers.py:400-422).
    """
    data_size = mesh.shape[DATA_AXIS]
    # leaves below ~64 KB fp32 aren't worth the gather/scatter traffic
    min_size = 16384

    def assign(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.size < min_size:
            return _ns(mesh)
        # largest axis divisible by the data-axis size
        best = None
        for i, s in enumerate(leaf.shape):
            if s % data_size == 0 and (best is None or s > leaf.shape[best]):
                best = i
        if best is None:
            return _ns(mesh)
        spec = [None] * leaf.ndim
        spec[best] = DATA_AXIS
        return _ns(mesh, *spec)

    return jax.tree.map(assign, tree)


def with_memory_kind(shardings: Params, kind: str) -> Params:
    """Same layouts, different memory space ("device" | "pinned_host")."""
    return jax.tree.map(lambda s: s.with_memory_kind(kind), shardings)


def host_offload_shardings(tree: Params, mesh: Mesh) -> Params:
    """ZeRO-offload analogue (reference trainers.py:403-410
    `offload_optimizer`/`offload_param` → CPU): the same per-leaf ZeRO
    layout, resident in pinned host memory instead of HBM. The jitted
    train step device_puts leaves HBM-ward before use and back after
    (training/train_step.py `opt_placements`/`frozen_placements`); XLA
    schedules the transfers so they overlap with compute where possible.

    Unneeded at Whisper scale (large-v3 + Adam fits a 16 GB v5e with
    room), but it is the capability that makes beyond-HBM configs — e.g.
    full-FT Adam m/v for models several times larger — trainable on the
    same mesh."""
    return with_memory_kind(zero_shardings(tree, mesh), "pinned_host")


def shard_tree(tree: Params, shardings: Params) -> Params:
    """device_put a pytree onto its shardings (host → sharded HBM)."""
    return jax.tree.map(jax.device_put, tree, shardings)
