"""ctypes bindings for the native data-loading core (loader.cc).

Compiled on first use with g++ (cached next to the source, keyed by a source
hash); falls back cleanly when no toolchain or libjpeg/libpng is available —
callers must check :func:`available` and keep a pure-Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _source_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _so_path() -> str:
    return os.path.join(_DIR, f"_loader_{_source_hash()}.so")


def _build() -> str:
    so = _so_path()
    if os.path.exists(so):
        return so
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
        _SRC, "-o", so + ".tmp", "-ljpeg", "-lpng",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(so + ".tmp", so)
    # Drop stale builds of earlier source versions.
    for name in os.listdir(_DIR):
        if (name.startswith("_loader_") and name.endswith(".so")
                and os.path.join(_DIR, name) != so):
            try:
                os.unlink(os.path.join(_DIR, name))
            except OSError:
                pass
    return so


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            lib = ctypes.CDLL(_build())
        except (OSError, subprocess.CalledProcessError) as e:
            _build_error = str(e)
            return None
        lib.bgt_decode_batch.restype = ctypes.c_int
        lib.bgt_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.bgt_gather_batch.restype = None
        lib.bgt_gather_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def decode_batch(paths: Sequence[str], resolution: int,
                 n_threads: Optional[int] = None) -> np.ndarray:
    """Decode image files → (N, res, res, 3) uint8, in parallel, in C++."""
    lib = _load()
    assert lib is not None, f"native loader unavailable: {_build_error}"
    n = len(paths)
    out = np.empty((n, resolution, resolution, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = n_threads or min(os.cpu_count() or 1, n, 32)
    rc = lib.bgt_decode_batch(
        arr, n, resolution,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    if rc != 0:
        raise IOError(f"failed to decode image: {paths[rc - 1]}")
    return out


def gather_batch(src: np.ndarray, indices: np.ndarray,
                 n_threads: Optional[int] = None) -> np.ndarray:
    """out[i] = src[indices[i]] with parallel row memcpy (large uint8 stores)."""
    lib = _load()
    assert lib is not None, f"native loader unavailable: {_build_error}"
    assert src.dtype == np.uint8 and src.flags.c_contiguous
    idx = np.ascontiguousarray(indices, np.int64)
    n = idx.shape[0]
    item_bytes = int(src.nbytes // src.shape[0])
    out = np.empty((n,) + src.shape[1:], np.uint8)
    threads = n_threads or min(os.cpu_count() or 1, 16)
    lib.bgt_gather_batch(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, item_bytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out
