"""ctypes bindings for the native C++ parser/hasher (native/cffm_native.cpp).

Auto-builds the shared library on first use if g++ is available; every
entry point has a pure-Python fallback (the readers in readers.py), so
the framework degrades gracefully on toolchain-less machines.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libcffm_native.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.fnv_hash_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32)]
    lib.parse_criteo.restype = ctypes.c_long
    lib.parse_avazu.restype = ctypes.c_long
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_criteo_buffer(buf: bytes, batch_cap: int, vocab_sizes,
                        want_dense: bool = True
                        ) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray, int]:
    """Parse raw Criteo TSV bytes. Returns (ids, dense|None, labels, consumed)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    assert len(vocab_sizes) == 39
    vocab = np.asarray(vocab_sizes, dtype=np.int64)
    ids = np.empty((batch_cap, 39), dtype=np.int32)
    dense = np.empty((batch_cap, 13), dtype=np.float32) if want_dense else None
    labels = np.empty((batch_cap,), dtype=np.float32)
    consumed = ctypes.c_long(0)
    n = lib.parse_criteo(
        buf, ctypes.c_long(len(buf)), ctypes.c_long(batch_cap),
        vocab.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if want_dense else None,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(consumed))
    return (ids[:n], None if dense is None else dense[:n], labels[:n],
            consumed.value)


def parse_avazu_buffer(buf: bytes, batch_cap: int, vocab_sizes
                       ) -> Tuple[np.ndarray, np.ndarray, int]:
    lib = _load()
    assert lib is not None, "native library unavailable"
    assert len(vocab_sizes) == 23
    vocab = np.asarray(vocab_sizes, dtype=np.int64)
    ids = np.empty((batch_cap, 23), dtype=np.int32)
    labels = np.empty((batch_cap,), dtype=np.float32)
    consumed = ctypes.c_long(0)
    n = lib.parse_avazu(
        buf, ctypes.c_long(len(buf)), ctypes.c_long(batch_cap),
        vocab.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(consumed))
    return ids[:n], labels[:n], consumed.value


def hash_strings_native(values: np.ndarray, num_buckets: int) -> np.ndarray:
    """Native FNV over an array of byte-strings (parity with hashing.py)."""
    lib = _load()
    assert lib is not None
    if values.dtype.kind != "S":
        values = values.astype("S")
    w = values.dtype.itemsize
    raw = values.tobytes()
    n = len(values)
    starts = np.arange(n, dtype=np.int64) * w
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(n, w)
    lengths = (mat != 0).cumprod(axis=1).sum(axis=1).astype(np.int64)
    ends = starts + lengths
    out = np.empty((n,), dtype=np.int32)
    lib.fnv_hash_batch(
        raw, starts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ctypes.c_long(n), ctypes.c_long(num_buckets),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
