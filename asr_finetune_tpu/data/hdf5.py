"""HDF5 audio dataset access.

Capability parity with the reference's HDF5 layer: an `audio` dataset of
variable-length float32 waveforms plus a `transcription` dataset of strings,
read per-index by worker processes (datasets_and_collators.py:63-97,
`_init_worker`/`_process_index_shared`), with bad rows dropped rather than
crashing (reference :95-97).

TPU-native role: this is host-side input I/O only; features move to the
device raw (audio) and the log-mel frontend runs on-device (ops/logmel.py),
so HDF5 reads are ~60 KB/utterance instead of 1.5 MB of fp32 mel.
"""
from __future__ import annotations

import logging
import os
import shutil
import tempfile
from typing import List, Optional, Sequence, Tuple

import h5py
import numpy as np

logger = logging.getLogger(__name__)


class Hdf5AudioReader:
    """Per-process handle over an HDF5 file of (audio, transcription) rows."""

    def __init__(self, path: str, copy_to_local: bool = False):
        # copy_to_local mirrors the reference's /tmp staging for slow
        # network filesystems (datasets_and_collators.py:208-227)
        self.path = self._copy_to_local(path) if copy_to_local else path
        self._file: Optional[h5py.File] = None
        self._pid: Optional[int] = None

    @staticmethod
    def _copy_to_local(path: str) -> str:
        local = os.path.join(tempfile.gettempdir(), os.path.basename(path))
        if not os.path.exists(local) or os.path.getsize(local) != os.path.getsize(path):
            logger.info("staging %s -> %s", path, local)
            shutil.copyfile(path, local)
        return local

    @property
    def file(self) -> h5py.File:
        # reopen after fork: h5py handles are not fork-safe
        pid = os.getpid()
        if self._file is None or self._pid != pid:
            self._file = h5py.File(self.path, "r")
            self._pid = pid
        return self._file

    def __len__(self) -> int:
        return len(self.file["audio"])

    def read(self, indices: Sequence[int]) -> List[Tuple[int, np.ndarray, str]]:
        """Read rows; bad rows are dropped with a warning (reference :95-97)."""
        out = []
        f = self.file
        audio_ds, text_ds = f["audio"], f["transcription"]
        for idx in indices:
            try:
                audio = np.asarray(audio_ds[idx], dtype=np.float32)
                text = text_ds[idx]
                if isinstance(text, bytes):
                    text = text.decode("utf-8")
                out.append((int(idx), audio, str(text)))
            except Exception as e:  # noqa: BLE001 — match reference tolerance
                logger.warning("dropping bad row %d: %s", idx, e)
        return out

    def read_transcripts(self, indices: Sequence[int]) -> List[str]:
        """Text-only reads (no audio IO) — multi-host eval reads audio for
        its local slice only but every process needs all reference texts
        for WER scoring (run.py eval_batches_fn). Bad rows read as ''."""
        out = []
        text_ds = self.file["transcription"]
        for idx in indices:
            try:
                t = text_ds[idx]
                out.append(t.decode("utf-8") if isinstance(t, bytes) else str(t))
            except Exception as e:  # noqa: BLE001
                logger.warning("bad transcript row %d: %s", idx, e)
                out.append("")
        return out

    def transcript_lengths(self) -> np.ndarray:
        """Per-row transcript char counts — the group_by_length sort key
        (labels dominate padding waste; audio is a fixed 30 s window)."""
        text_ds = self.file["transcription"]
        return np.asarray([len(t) for t in text_ds[...]], np.int32)

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None


def write_hdf5_dataset(path: str, audios: Sequence[np.ndarray],
                       transcripts: Sequence[str]) -> None:
    """Create a dataset in the reference's layout (tests/benchmarks)."""
    assert len(audios) == len(transcripts)
    with h5py.File(path, "w") as f:
        vlen_f32 = h5py.special_dtype(vlen=np.dtype("float32"))
        ds = f.create_dataset("audio", (len(audios),), dtype=vlen_f32)
        for i, a in enumerate(audios):
            ds[i] = np.asarray(a, np.float32)
        text_dt = h5py.string_dtype(encoding="utf-8")
        f.create_dataset("transcription", data=list(transcripts), dtype=text_dt)


def make_synthetic_dataset(path: str, n: int = 32, seed: int = 0,
                           min_sec: float = 1.0, max_sec: float = 8.0,
                           sample_rate: int = 16000) -> None:
    """Synthetic sine-mixture utterances + pseudo-German transcripts."""
    rng = np.random.default_rng(seed)
    words = ["der", "die", "das", "und", "haus", "hund", "katze", "läuft",
             "springt", "heute", "morgen", "zeit", "geschichte", "erinnerung"]
    audios, texts = [], []
    for _ in range(n):
        dur = rng.uniform(min_sec, max_sec)
        t = np.arange(int(dur * sample_rate)) / sample_rate
        freqs = rng.uniform(80, 2000, size=3)
        sig = sum(np.sin(2 * np.pi * f * t) * rng.uniform(0.05, 0.3) for f in freqs)
        sig += rng.standard_normal(t.shape) * 0.01
        audios.append(sig.astype(np.float32))
        texts.append(" ".join(rng.choice(words, rng.integers(2, 9))))
    write_hdf5_dataset(path, audios, texts)
