"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices; together they form an 8-device
global mesh. Runs real framework pieces: per-process HDF5 pipeline shard →
make_global_batch → DP train step. Asserts the loss is finite and identical
across ranks (same global program).
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
nproc = int(sys.argv[2])
coord = sys.argv[3]
h5_path = sys.argv[4]

jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=rank)

import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from asr_finetune_tpu.data.collator import Collator, CollatorConfig
from asr_finetune_tpu.data.hdf5 import Hdf5AudioReader
from asr_finetune_tpu.data.pipeline import (DataPipeline, IndexSampler,
                                            make_global_batch)
from asr_finetune_tpu.models import whisper as W
from asr_finetune_tpu.models.configs import get_config
from asr_finetune_tpu.models.tokenizer import ByteFallbackTokenizer
from asr_finetune_tpu.parallel import mesh as mesh_lib
from asr_finetune_tpu.training import optim
from asr_finetune_tpu.training.train_step import (TrainStepConfig,
                                                  make_train_state,
                                                  make_train_step)

assert jax.process_count() == nproc
assert len(jax.devices()) == 8, len(jax.devices())

mesh = mesh_lib.create_mesh(data=8, model=1)
cfg = get_config("test-nano")
params = W.init_params(jax.random.PRNGKey(0), cfg)
tx = optax.sgd(1e-3)
tcfg = TrainStepConfig(mode="full", compute_dtype=np.float32, remat=False,
                       on_device_logmel=False)
state = make_train_state(params, tx)

reader = Hdf5AudioReader(h5_path)
tok = ByteFallbackTokenizer()
col = Collator(tok, CollatorConfig(features="host", n_mels=cfg.num_mel_bins))
# per-process local batch of 8 → global 16 over the 8-device data axis
sampler = IndexSampler(len(reader), 8, seed=0,
                       process_index=jax.process_index(),
                       process_count=jax.process_count())
pipe = DataPipeline(reader, col, sampler, telemetry_every=0)
local = next(iter(pipe))
# crop the 30s mel window so the nano test model stays fast
local["mel"] = local["mel"][:, :60]

bs = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
batch = make_global_batch(local, bs)
assert batch["mel"].shape[0] == 16, batch["mel"].shape
batch = {k: v for k, v in batch.items()
         if k in ("mel", "decoder_input_ids", "labels")}

step = jax.jit(make_train_step(cfg, tx, tcfg))
state, metrics = step(state, batch)
loss = float(metrics["loss"])
assert np.isfinite(loss)
print(f"RANK{rank}_LOSS={loss:.6f}", flush=True)
