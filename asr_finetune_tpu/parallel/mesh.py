"""Device mesh construction (single-host, pod slice, and hybrid ICI/DCN).

Replaces the reference's entire distributed substrate — Slurm-bootstrapped
Ray control plane + NCCL DDP data plane + Ray object store
(SURVEY.md §2.4; finetune_large_debug_multi_node.sh:63-88,
train_hyper.py:228-231, 312-332) — with the single-controller JAX model:
one process per host, `jax.distributed.initialize`, and a
`jax.sharding.Mesh` whose collectives ride ICI within a slice and DCN
across slices.

Axes:
- "data":  data parallelism (gradient psum; reference's DDP allreduce) and
           ZeRO-style optimizer-state sharding (reference's DeepSpeed stage 3)
- "model": tensor parallelism over attention heads / MLP hidden dim
           (absent in the reference — whisper fits one A100 — but first-class
           here for larger-than-chip configurations)
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init. Coordinator discovery mirrors the reference's
    `ip_head` env-var convention (train_hyper.py:228-231) but feeds
    jax.distributed instead of ray.init."""
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS") \
        or os.environ.get("ip_head")
    if addr is None and num_processes is None:
        return  # single-process
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=num_processes,
                               process_id=process_id)


def create_mesh(data: int = -1, model: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over all (or given) devices; data=-1 → fill remaining."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    try:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_device_mesh((data, model), devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def create_hybrid_mesh(ici_data: int, model: int = 1,
                       dcn_data: Optional[int] = None) -> Mesh:
    """Hybrid mesh for multi-slice pods: DCN-parallel axis outermost so
    cross-slice traffic is pure data-parallel gradient reduction."""
    from jax.experimental import mesh_utils
    dcn_data = dcn_data or (jax.device_count() // (ici_data * model))
    dev = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(ici_data, model), dcn_mesh_shape=(dcn_data, 1))
    return Mesh(dev.reshape(dcn_data * ici_data, model), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim over data axis; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
