"""Hardware smoke for the ZeRO-offload analogue: pinned_host residency +
in-jit gather on a real TPU chip (the CPU suite proves numerics on the
virtual mesh; this proves the memory-space plumbing against real HBM/host
DMA). Run with ASR_TPU_TESTS=1 on the bench chip.
"""
import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("ASR_TPU_TESTS") != "1",
    reason="TPU-only: set ASR_TPU_TESTS=1 on hardware")


@requires_tpu
def test_offloaded_optimizer_step_on_tpu():
    import jax
    import jax.numpy as jnp

    from asr_finetune_tpu.models import whisper as W
    from asr_finetune_tpu.models.configs import get_config
    from asr_finetune_tpu.parallel import mesh as mesh_lib
    from asr_finetune_tpu.parallel import sharding as sh
    from asr_finetune_tpu.training import lora as lora_lib
    from asr_finetune_tpu.training import optim
    from asr_finetune_tpu.training.train_step import (
        TrainStepConfig, make_train_state, make_train_step,
        offload_opt_state)

    assert jax.default_backend() == "tpu"
    cfg = get_config("test-nano")
    mesh = mesh_lib.create_mesh()
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8.0)
    adapters = lora_lib.init_adapters(jax.random.PRNGKey(1), cfg, lcfg,
                                      encoder=True)
    tx = optim.make_optimizer(1e-3, max_steps=50, scheduler="constant")
    tcfg = TrainStepConfig(mode="peft", compute_dtype=jnp.bfloat16,
                           remat=False, lora=lcfg)
    state = make_train_state(params, tx, adapters=adapters)

    opt_dev = sh.zero_shardings(state["opt_state"], mesh)
    opt_host = sh.with_memory_kind(opt_dev, "pinned_host")
    state["opt_state"] = sh.shard_tree(state["opt_state"], opt_host)
    for leaf in jax.tree.leaves(state["opt_state"]):
        assert leaf.sharding.memory_kind == "pinned_host"

    inner = jax.jit(make_train_step(cfg, tx, tcfg,
                                    opt_placements=(opt_dev, opt_host)))
    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (4, 60, cfg.num_mel_bins)).astype(np.float32)),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 200, (4, 8)).astype(np.int32)),
        "labels": jnp.asarray(rng.integers(0, 200, (4, 8)).astype(np.int32)),
    }
    losses = []
    for _ in range(3):
        state, m = inner(state, batch)
        state = offload_opt_state(state, opt_host)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    for leaf in jax.tree.leaves(state["opt_state"]):
        assert leaf.sharding.memory_kind == "pinned_host"
