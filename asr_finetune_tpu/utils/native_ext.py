"""ctypes binding for the C++ host-runtime kernels (native/asr_native.cpp).

Auto-builds the shared library on first use if a toolchain is present;
every caller has a pure-Python fallback, so the framework degrades
gracefully on machines without g++.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libasr_native.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                               check=True, capture_output=True, timeout=120)
            except Exception as e:  # noqa: BLE001
                logger.info("native extension unavailable (%s); using "
                            "pure-Python fallbacks", e)
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            logger.info("failed to load %s: %s", _SO_PATH, e)
            return None

        lib.edit_distance_u32.restype = ctypes.c_int64
        lib.edit_distance_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64]
        lib.corpus_wer_u32.restype = ctypes.c_int64
        lib.corpus_wer_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.assemble_batch_f32.restype = None
        lib.assemble_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _intern(words: Sequence[str], table: Dict[str, int]) -> np.ndarray:
    out = np.empty(len(words), np.uint32)
    for i, w in enumerate(words):
        out[i] = table.setdefault(w, len(table))
    return out


def edit_distance_words(ref_words: Sequence[str],
                        hyp_words: Sequence[str]) -> int:
    lib = _load()
    table: Dict[str, int] = {}
    a = _intern(ref_words, table)
    b = _intern(hyp_words, table)
    if lib is None:
        raise RuntimeError("native extension not loaded")
    return int(lib.edit_distance_u32(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(b)))


def corpus_wer(references: Sequence[str], hypotheses: Sequence[str],
               n_threads: int = 0) -> Tuple[int, int]:
    """(total_errors, total_ref_words) over the whole corpus in one call."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native extension not loaded")
    table: Dict[str, int] = {}
    ref_ids: List[np.ndarray] = [_intern(r.split(), table) for r in references]
    hyp_ids: List[np.ndarray] = [_intern(h.split(), table) for h in hypotheses]
    refs = np.concatenate(ref_ids) if ref_ids else np.empty(0, np.uint32)
    hyps = np.concatenate(hyp_ids) if hyp_ids else np.empty(0, np.uint32)
    ref_off = np.zeros(len(ref_ids) + 1, np.int64)
    np.cumsum([len(r) for r in ref_ids], out=ref_off[1:])
    hyp_off = np.zeros(len(hyp_ids) + 1, np.int64)
    np.cumsum([len(h) for h in hyp_ids], out=hyp_off[1:])
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    total_words = ctypes.c_int64(0)
    errors = lib.corpus_wer_u32(
        refs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ref_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hyps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        hyp_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(ref_ids), n_threads, ctypes.byref(total_words))
    return int(errors), int(total_words.value)


def assemble_batch(audios: Sequence[np.ndarray], target_len: int,
                   n_threads: int = 0) -> np.ndarray:
    """Pad/trim waveforms into a (B, target_len) float32 batch (C++ core)."""
    lib = _load()
    n = len(audios)
    out = np.empty((n, target_len), np.float32)
    if lib is None:
        for i, a in enumerate(audios):
            m = min(len(a), target_len)
            out[i, :m] = a[:m]
            out[i, m:] = 0.0
        return out
    arrs = [np.ascontiguousarray(a, np.float32) for a in audios]
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrs])
    lens = np.asarray([len(a) for a in arrs], np.int64)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.assemble_batch_f32(
        ptrs, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, target_len, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads)
    return out
