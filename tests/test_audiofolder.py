"""Audiofolder reader: WAV parsing (widths/rates/channels), metadata.csv,
split scheme."""
import csv
import wave

import numpy as np
import pytest

from asr_finetune_tpu.data.audiofolder import (AudioFolderReader, read_wav,
                                               train_val_test_split)


def _write_wav(path, data, rate=16000, width=2, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            raw = (np.clip(data, -1, 1) * 32767).astype("<i2").tobytes()
        elif width == 4:
            raw = data.astype("<f4").tobytes()
        else:
            raise ValueError(width)
        w.writeframes(raw)


@pytest.fixture()
def folder(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        sig = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        _write_wav(tmp_path / f"utt{i}.wav", sig)
        rows.append({"file_name": f"utt{i}.wav", "transcription": f"text {i}"})
    with open(tmp_path / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file_name", "transcription"])
        w.writeheader()
        w.writerows(rows)
    return tmp_path


def test_reader(folder):
    r = AudioFolderReader(str(folder))
    assert len(r) == 4
    rows = r.read([0, 2])
    assert rows[0][2] == "text 0"
    assert rows[0][1].dtype == np.float32
    assert abs(len(rows[0][1]) - 8000) <= 1


def test_wav_int16_roundtrip(tmp_path):
    sig = np.sin(np.linspace(0, 20, 8000)).astype(np.float32) * 0.5
    _write_wav(tmp_path / "a.wav", sig)
    out = read_wav(str(tmp_path / "a.wav"))
    np.testing.assert_allclose(out, sig, atol=1e-3)


def test_wav_resample_and_stereo(tmp_path):
    sig = np.sin(np.linspace(0, 20, 8000)).astype(np.float32) * 0.5
    stereo = np.stack([sig, sig], 1).reshape(-1)
    _write_wav(tmp_path / "s.wav", stereo, rate=8000, channels=2)
    out = read_wav(str(tmp_path / "s.wav"))
    assert abs(len(out) - 16000) <= 2  # 8 kHz → 16 kHz


def test_split_scheme():
    train, val, test = train_val_test_split(100, seed=1)
    assert len(test) == 20       # 80/20 first
    assert len(val) == 8         # then 90/10 of the remaining 80
    assert len(train) == 72
    all_idx = np.concatenate([train, val, test])
    assert len(np.unique(all_idx)) == 100
