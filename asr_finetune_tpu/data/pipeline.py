"""Deterministic host input pipeline: shard, shuffle, batch, prefetch.

Replaces the reference's Ray Data plumbing — `ray.train.get_dataset_shard`
(trainers.py:785-791), `iter_torch_batches(prefetch_batches, batch_size,
collate_fn)` (trainers.py:826-828), and the Ray object store shipping blocks
between processes (SURVEY.md §2.4) — with a per-host pipeline:

- deterministic per-process index sharding keyed by (process_index,
  process_count), the jax.distributed equivalent of Ray's dataset shards
- seeded per-epoch shuffling (reference relies on set_seed, train_hyper.py:215)
- background-thread prefetch with device_put onto the batch sharding, the
  host→HBM double-buffering the reference gets from Ray's prefetch_batches
- samples/sec telemetry matching the reference's collator prints
  (datasets_and_collators.py:197-204)
"""
from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import numpy as np

logger = logging.getLogger(__name__)

NON_DEVICE_KEYS = ("text", "idx")  # host-only fields, never device_put


class IndexSampler:
    """Seeded, sharded, epoch-aware index stream.

    With `lengths`, batches are length-grouped: the shuffled permutation is
    sorted within windows of (global batch × length_group_factor) so each
    batch holds similar-length rows and pays less label padding — the
    reference's group_by_length=True / HF LengthGroupedSampler
    (trainers.py:862, :441). The window sort happens BEFORE the strided
    process shard, so in multi-host runs all processes contribute
    similar-length rows to the same global batch.
    """

    def __init__(self, n: int, batch_size: int, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 lengths: Optional[np.ndarray] = None,
                 length_group_factor: int = 16):
        self.n = n
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.lengths = None if lengths is None else np.asarray(lengths)
        self.length_group_factor = length_group_factor

    def epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        if self.lengths is not None and self.shuffle:
            w = self.batch_size * self.process_count * self.length_group_factor
            for i in range(0, len(idx), w):
                win = idx[i : i + w]
                idx[i : i + len(win)] = win[np.argsort(self.lengths[win],
                                                       kind="stable")]
        # contiguous per-process shard of the (shuffled) permutation
        shard = idx[self.process_index :: self.process_count]
        if self.drop_last:
            usable = (len(shard) // self.batch_size) * self.batch_size
            shard = shard[:usable]
        return shard

    def batches(self, epoch: int) -> Iterator[np.ndarray]:
        shard = self.epoch_indices(epoch)
        for i in range(0, len(shard) - self.batch_size + 1, self.batch_size):
            yield shard[i : i + self.batch_size]

    def batches_from_step(self, start_step: int) -> Iterator[np.ndarray]:
        """Infinite stream resumable at a global step (epoch derived from
        step count) — exact-stream resume, which the reference punts on
        (it restarts the stream and fixes only the counter,
        trainers/utils.py:37-52)."""
        per_epoch = len(self.epoch_indices(0)) // self.batch_size
        if per_epoch == 0:
            raise ValueError(
                f"per-process train shard ({len(self.epoch_indices(0))} rows) "
                f"is smaller than the global batch ({self.batch_size}); "
                "reduce per_device_train_batch_size or provide more data")
        step = start_step
        while True:
            epoch, offset = divmod(step, per_epoch)
            for j, b in enumerate(self.batches(epoch)):
                if j < offset:
                    continue
                yield b
                step += 1


class DataPipeline:
    """reader + collator + sampler → batches of numpy arrays."""

    def __init__(self, reader, collator: Callable, sampler: IndexSampler,
                 telemetry_every: int = 5):
        self.reader = reader
        self.collator = collator
        self.sampler = sampler
        self.telemetry_every = telemetry_every

    def __iter__(self):
        return self.iter_from_step(0)

    def iter_from_step(self, start_step: int) -> Iterator[Dict[str, np.ndarray]]:
        t0 = time.time()
        seen = 0
        for i, idx_batch in enumerate(self.sampler.batches_from_step(start_step)):
            rows = self.reader.read(idx_batch)
            if len(rows) == 0:  # rows may be a list OR an index array
                continue
            want = len(idx_batch)
            if len(rows) < want:
                # readers drop bad rows; repeat good rows so every train
                # batch has the exact configured size (shape-stable jit,
                # consistent global shapes across hosts)
                if isinstance(rows, list):
                    rows = [rows[j % len(rows)] for j in range(want)]
                else:
                    rows = np.asarray(rows)[np.arange(want) % len(rows)]
            batch = self.collator(rows)
            seen += len(rows)
            if self.telemetry_every and (i + 1) % self.telemetry_every == 0:
                dt = time.time() - t0
                logger.info("data: %.1f samples/sec", seen / max(dt, 1e-9))
            yield batch

    def eval_batches(self, indices: Sequence[int], batch_size: int
                     ) -> Iterator[Dict[str, np.ndarray]]:
        """Ordered, non-shuffled pass (offline eval); keeps partial tail."""
        for i in range(0, len(indices), batch_size):
            rows = self.reader.read(list(indices[i : i + batch_size]))
            if rows:
                yield self.collator(rows)


def make_global_batch(batch: Dict[str, np.ndarray], sharding,
                      accum_steps: int = 1) -> Dict[str, Any]:
    """Multi-host feed: each process contributes its LOCAL rows and the
    result is one global jax.Array per leaf — the jax.distributed
    equivalent of the reference's `ray.train.get_dataset_shard` +
    object-store block shipping (trainers.py:785-791). The local batch is
    this process's shard (IndexSampler already splits indices by
    process_index), so global batch = local batch × process_count.
    """
    import jax as _jax

    out: Dict[str, Any] = {}
    pc = _jax.process_count()
    for k, v in batch.items():
        if k in NON_DEVICE_KEYS:
            out[k] = v
            continue
        if accum_steps > 1:
            B = v.shape[0]
            assert B % accum_steps == 0, (B, accum_steps)
            v = v.reshape((accum_steps, B // accum_steps) + v.shape[1:])
            global_shape = (accum_steps, v.shape[1] * pc) + v.shape[2:]
        else:
            global_shape = (v.shape[0] * pc,) + v.shape[1:]
        out[k] = _jax.make_array_from_process_local_data(
            sharding, v, global_shape)
    return out


def device_prefetch(it: Iterator[Dict[str, np.ndarray]],
                    sharding: Optional[Any] = None, size: int = 2,
                    accum_steps: int = 1) -> Iterator[Dict[str, Any]]:
    """Background thread stages host batches; main thread device_puts.

    With accum_steps > 1, reshapes every device leaf to
    (accum, micro, ...) for the train step's scan.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()
    # producer exception, re-raised on the consumer side: without this, a
    # pipeline error (e.g. the per-process-shard < batch ValueError) dies
    # in the thread and the trainer only sees a bare StopIteration
    err: list = []

    def produce():
        # put() with a timeout + stop poll: an abandoned consumer must not
        # leave this thread parked forever in q.put — a frozen daemon
        # thread mid-HDF5-read deadlocks h5py's atexit file close (C-level
        # hang at interpreter shutdown, no Python frame; seen 2026-08-18
        # via bench_dataloader)
        try:
            for b in it:
                while not stop.is_set():
                    try:
                        q.put(b, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — carried to the consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_END, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=produce, daemon=True)
    t.start()

    multihost = jax.process_count() > 1

    try:
        while True:
            b = q.get()
            if b is _END:
                if err:
                    raise err[0]
                return
            if multihost and sharding is not None:
                # each process feeds its local shard of the global batch
                yield make_global_batch(b, sharding, accum_steps)
                continue
            out: Dict[str, Any] = {}
            for k, v in b.items():
                if k in NON_DEVICE_KEYS:
                    out[k] = v
                    continue
                if accum_steps > 1:
                    B = v.shape[0]
                    assert B % accum_steps == 0, (B, accum_steps)
                    v = v.reshape((accum_steps, B // accum_steps) + v.shape[1:])
                out[k] = jax.device_put(v, sharding) if sharding is not None \
                    else jax.device_put(v)
            yield out
    finally:
        # generator close (explicit, GC, or shutdown) releases the producer
        stop.set()
        t.join(timeout=5.0)
