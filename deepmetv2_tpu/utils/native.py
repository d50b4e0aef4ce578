"""ctypes bindings to the native C++ library (native/deepmet_native.cc).

Builds lazily with make on first use if the shared object is missing (the
toolchain is always available in dev images); every caller has a pure-
Python fallback, so absence of a compiler only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                       "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "libdeepmet_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not osp.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        lib.dm_xxh32.restype = ctypes.c_uint32
        lib.dm_xxh32.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                 ctypes.c_uint32]
        lib.dm_lz4_compress.restype = ctypes.c_int64
        lib.dm_lz4_compress.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_int64]
        lib.dm_lz4_decompress.restype = ctypes.c_int64
        lib.dm_lz4_decompress.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                          ctypes.c_void_p, ctypes.c_int64]
        lib.dm_pack_events.restype = ctypes.c_int
        lib.dm_pack_events.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def xxh32(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    return int(lib.dm_xxh32(data, len(data), seed))


def lz4_compress_block(data: bytes) -> Optional[bytes]:
    """Compress one LZ4 block; None if native lib missing or incompressible."""
    lib = _load()
    if lib is None or len(data) == 0:
        return None
    cap = len(data) + len(data) // 128 + 64
    out = ctypes.create_string_buffer(cap)
    n = lib.dm_lz4_compress(data, len(data), out, cap)
    if n <= 0:
        return None
    return out.raw[:n]


def lz4_decompress_block(data: bytes, max_size: int) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(max_size)
    n = lib.dm_lz4_decompress(data, len(data), out, max_size)
    if n < 0:
        return None  # corrupt OR capacity too small; caller retries/falls back
    return out.raw[:n]


def pack_events(raw: np.ndarray, clip: float = 5000.0):
    """Native ETL packing of a whole slice: raw [12, nev, nmax] float32 →
    (out [nev, nmax, 11] float32, lengths [nev] int32).  Returns None when
    the native lib is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.float32)
    assert raw.ndim == 3 and raw.shape[0] == 12
    _, nev, nmax = raw.shape
    out = np.zeros((nev, nmax, 11), dtype=np.float32)
    lengths = np.zeros((nev,), dtype=np.int32)
    rc = lib.dm_pack_events(
        raw.ctypes.data_as(ctypes.c_void_p), nev, nmax,
        ctypes.c_float(clip),
        out.ctypes.data_as(ctypes.c_void_p),
        lengths.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out, lengths
