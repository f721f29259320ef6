"""Data layer: HDF5 roundtrip, collator semantics (-100 masking, sot strip,
shift), deterministic sharding, parquet materialization parity."""
import time

import numpy as np
import pytest

from asr_finetune_tpu.data.collator import Collator, CollatorConfig, IGNORE_ID
from asr_finetune_tpu.data.hdf5 import (Hdf5AudioReader, make_synthetic_dataset,
                                        write_hdf5_dataset)
from asr_finetune_tpu.data.parquet import (ParquetCollator, ParquetFeatureReader,
                                           materialize_hdf5_to_parquet)
from asr_finetune_tpu.data.pipeline import DataPipeline, IndexSampler
from asr_finetune_tpu.models.tokenizer import ByteFallbackTokenizer


@pytest.fixture(scope="module")
def h5_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "train.h5"
    make_synthetic_dataset(str(p), n=16, seed=0, min_sec=0.5, max_sec=2.0)
    return str(p)


def test_hdf5_roundtrip(h5_path):
    r = Hdf5AudioReader(h5_path)
    assert len(r) == 16
    rows = r.read([0, 3, 15])
    assert len(rows) == 3
    idx, audio, text = rows[0]
    assert idx == 0 and audio.dtype == np.float32 and isinstance(text, str)
    assert len(text.split()) >= 2


def test_collator_semantics(h5_path):
    tok = ByteFallbackTokenizer()
    col = Collator(tok, CollatorConfig(features="audio"))
    r = Hdf5AudioReader(h5_path)
    batch = col(r.read([0, 1, 2, 3]))
    sp = tok.special

    assert batch["audio"].shape == (4, 480000)
    labels, dec = batch["labels"], batch["decoder_input_ids"]
    assert labels.shape == dec.shape
    # leading sot stripped from labels; decoder input starts with sot
    assert (labels[:, 0] == sp.language_token("de")).all()
    assert (dec[:, 0] == sp.sot).all()
    # shift: dec[:, 1:] equals labels[:, :-1] where labels valid
    valid = labels[:, :-1] != IGNORE_ID
    np.testing.assert_array_equal(dec[:, 1:][valid], labels[:, :-1][valid])
    # each row ends with eot then -100 padding
    for row in labels:
        (nz,) = (row != IGNORE_ID).nonzero()
        assert row[nz[-1]] == sp.eot
    # bucketed shape
    assert labels.shape[1] in CollatorConfig().label_buckets


def test_host_features_match_logmel(h5_path):
    from asr_finetune_tpu.ops import logmel as lm

    tok = ByteFallbackTokenizer()
    col = Collator(tok, CollatorConfig(features="host", n_mels=80))
    r = Hdf5AudioReader(h5_path)
    batch = col(r.read([0]))
    _, audio, _ = r.read([0])[0]
    expect = lm.log_mel_np(lm.pad_or_trim(audio), 80)
    np.testing.assert_allclose(batch["mel"][0], expect, atol=1e-6)


def test_sampler_sharding_and_determinism():
    s0 = IndexSampler(100, 8, seed=7, process_index=0, process_count=4)
    s1 = IndexSampler(100, 8, seed=7, process_index=1, process_count=4)
    a0 = s0.epoch_indices(0)
    b0 = s1.epoch_indices(0)
    assert set(a0).isdisjoint(set(b0))
    np.testing.assert_array_equal(a0, s0.epoch_indices(0))  # deterministic
    assert not np.array_equal(s0.epoch_indices(0), s0.epoch_indices(1))
    # resume: batches_from_step(k) continues the same stream
    full = []
    it = s0.batches_from_step(0)
    for _ in range(6):
        full.append(next(it))
    resumed = []
    it2 = s0.batches_from_step(3)
    for _ in range(3):
        resumed.append(next(it2))
    np.testing.assert_array_equal(np.stack(full[3:]), np.stack(resumed))


def test_pipeline_iteration(h5_path):
    tok = ByteFallbackTokenizer()
    col = Collator(tok, CollatorConfig(features="audio"))
    r = Hdf5AudioReader(h5_path)
    sampler = IndexSampler(len(r), 4, seed=0)
    pipe = DataPipeline(r, col, sampler, telemetry_every=0)
    it = iter(pipe)
    seen = [next(it) for _ in range(5)]  # crosses an epoch boundary (16/4=4)
    assert all(b["audio"].shape[0] == 4 for b in seen)


def test_parquet_materialize_roundtrip(h5_path, tmp_path):
    tok = ByteFallbackTokenizer()
    r = Hdf5AudioReader(h5_path)
    out = tmp_path / "parquet"
    files = materialize_hdf5_to_parquet(r, tok, str(out), n_mels=80,
                                        shard_size=6, limit=10)
    assert len(files) == 2
    pr = ParquetFeatureReader(str(out))
    assert len(pr) == 10

    pc = ParquetCollator(pr, sot=tok.special.sot, pad=tok.special.pad)
    batch = pc([0, 1, 2])
    assert batch["mel"].shape == (3, 3000, 80)
    assert batch["labels"].shape == (3, 448)
    assert (batch["decoder_input_ids"][:, 0] == tok.special.sot).all()

    # features equal the host collator's
    host = Collator(tok, CollatorConfig(features="host"))(r.read([0]))
    np.testing.assert_allclose(batch["mel"][0], host["mel"][0], atol=1e-6)
    # labels equal (up to padding length)
    hl = host["labels"][0]
    hn = (hl != IGNORE_ID).sum()
    np.testing.assert_array_equal(batch["labels"][0][:hn], hl[:hn])
    assert (batch["labels"][0][hn:] == IGNORE_ID).all()


def test_device_prefetch_abandoned_iterator_stops_producer(h5_path):
    """Closing (or abandoning) a device_prefetch iterator must stop its
    producer thread: a daemon thread frozen mid-HDF5-read at interpreter
    shutdown deadlocks h5py's atexit file close (C-level hang, observed
    2026-08-18 via bench_dataloader exiting with rc=124)."""
    import threading
    from asr_finetune_tpu.data.pipeline import device_prefetch

    reader = Hdf5AudioReader(h5_path)
    tok = ByteFallbackTokenizer()
    col = Collator(tok, CollatorConfig(features="audio"))
    sampler = IndexSampler(len(reader), 4, seed=0)
    pipe = DataPipeline(reader, col, sampler, telemetry_every=0)

    before = threading.active_count()
    it = device_prefetch(pipe.iter_from_step(0), sharding=None, size=2)
    next(it)  # producer running, queue filling
    assert threading.active_count() == before + 1
    it.close()  # consumer walks away mid-stream
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
