"""ZeRO-offload analogue (parallel/sharding.py host_offload_shardings +
train_step opt_placements/frozen_placements): optimizer state and the
frozen PEFT base live in pinned host memory between steps, gathered
HBM-ward inside the jitted step. Replaces the capability of the
reference's DeepSpeed ZeRO-3 CPU offload (trainers.py:400-434).

Runs on the 8-virtual-device CPU mesh; CPU devices expose the same
'pinned_host' memory kind as TPU, so placement semantics (memory_kind on
the committed sharding) and numerics are exercised for real.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import get_config
from asr_finetune_tpu.parallel import mesh as mesh_lib
from asr_finetune_tpu.parallel import sharding as sh
from asr_finetune_tpu.training import lora as lora_lib
from asr_finetune_tpu.training import optim
from asr_finetune_tpu.training.train_step import (
    TrainStepConfig, make_train_state, make_train_step, offload_opt_state)

CFG = get_config("test-nano")


def _batch(rng, B=4, T=8, frames=60):
    mel = jnp.asarray(rng.standard_normal(
        (B, frames, CFG.num_mel_bins)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 200, (B, T)).astype(np.int32))
    labels = jnp.concatenate(
        [toks[:, 1:], jnp.full((B, 1), 256, jnp.int32)], axis=1)
    return {"mel": mel, "decoder_input_ids": toks, "labels": labels}


def _peft_setup(mesh, offload_opt=False, offload_param=False):
    params = W.init_params(jax.random.PRNGKey(0), CFG)
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), CFG, lcfg,
                                      encoder=True)
    tx = optim.make_optimizer(1e-3, max_steps=50, scheduler="constant")
    cfg = TrainStepConfig(mode="peft", compute_dtype=jnp.float32,
                          remat=False, lora=lcfg)
    state = make_train_state(params, tx, adapters=adapters)

    opt_placements = frozen_placements = None
    opt_dev = sh.zero_shardings(state["opt_state"], mesh)
    if offload_opt:
        opt_host = sh.with_memory_kind(opt_dev, "pinned_host")
        opt_placements = (opt_dev, opt_host)
        state["opt_state"] = sh.shard_tree(state["opt_state"], opt_host)
    if offload_param:
        par_dev = sh.param_shardings(state["params"], mesh)
        frozen_placements = (par_dev,
                             sh.with_memory_kind(par_dev, "pinned_host"))
        state["params"] = sh.shard_tree(state["params"],
                                        frozen_placements[1])
    inner = jax.jit(make_train_step(CFG, tx, cfg,
                                    opt_placements=opt_placements,
                                    frozen_placements=frozen_placements))

    def step(state, batch):
        if frozen_placements is not None:
            frozen = state["params"]
            s = {k: v for k, v in state.items() if k != "params"}
            s, m = inner(s, batch, frozen)
            s["params"] = frozen
        else:
            s, m = inner(state, batch)
        if opt_placements is not None:
            s = offload_opt_state(s, opt_placements[1])
        return s, m

    return state, step


def _run(state, step, n=3):
    batch = _batch(np.random.default_rng(0))
    for _ in range(n):
        state, m = step(state, batch)
    return state, float(m["loss"])


def test_host_offload_shardings_memory_kind():
    mesh = mesh_lib.create_mesh()
    tree = {"m": jnp.zeros((8, 4096)), "small": jnp.zeros((3,))}
    host = sh.host_offload_shardings(tree, mesh)
    assert all(s.memory_kind == "pinned_host"
               for s in jax.tree.leaves(host))
    # layouts match the HBM ZeRO shardings exactly
    dev = sh.zero_shardings(tree, mesh)
    for h, d in zip(jax.tree.leaves(host), jax.tree.leaves(dev)):
        assert h.spec == d.spec


@pytest.mark.slow  # multi-minute on CPU (tests/README.md timings)
def test_offloaded_optimizer_matches_resident():
    mesh = mesh_lib.create_mesh()
    s_ref, step_ref = _peft_setup(mesh)
    s_off, step_off = _peft_setup(mesh, offload_opt=True)

    # state actually lives in pinned host memory between steps
    for leaf in jax.tree.leaves(s_off["opt_state"]):
        assert leaf.sharding.memory_kind == "pinned_host"

    s_ref, loss_ref = _run(s_ref, step_ref)
    s_off, loss_off = _run(s_off, step_off)
    assert loss_ref == loss_off
    for leaf in jax.tree.leaves(s_off["opt_state"]):
        assert leaf.sharding.memory_kind == "pinned_host"
    for a, b in zip(jax.tree.leaves(s_ref["adapters"]),
                    jax.tree.leaves(s_off["adapters"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # multi-minute on CPU (tests/README.md timings)
def test_offloaded_frozen_base_matches_resident():
    mesh = mesh_lib.create_mesh()
    s_ref, step_ref = _peft_setup(mesh)
    s_off, step_off = _peft_setup(mesh, offload_opt=True, offload_param=True)

    for leaf in jax.tree.leaves(s_off["params"]):
        assert leaf.sharding.memory_kind == "pinned_host"

    s_ref, loss_ref = _run(s_ref, step_ref)
    s_off, loss_off = _run(s_off, step_off)
    assert loss_ref == loss_off
    # the step must not silently migrate the base back to HBM residency
    for leaf in jax.tree.leaves(s_off["params"]):
        assert leaf.sharding.memory_kind == "pinned_host"
