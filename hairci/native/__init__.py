"""ctypes binding for the native C++ flat index (see flatindex.cpp).

The shared library is built on first use with g++ (cached next to the
source); `NativeFlatIndex` mirrors the FAISS flat-index API surface the
reference uses (`add`, `search`, `write_index`/`read_index` equivalents).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "flatindex.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_flatindex.so")
_lib: Optional[ctypes.CDLL] = None

METRIC_IP = 0
METRIC_L2 = 1


def _build() -> str:
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
               "-fPIC", "-pthread", _SRC, "-o", _LIB]
        log.info("building native flat index: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    lib.flat_index_new.restype = ctypes.c_void_p
    lib.flat_index_new.argtypes = [ctypes.c_int64, ctypes.c_int]
    lib.flat_index_free.argtypes = [ctypes.c_void_p]
    lib.flat_index_size.restype = ctypes.c_int64
    lib.flat_index_size.argtypes = [ctypes.c_void_p]
    lib.flat_index_add.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.flat_index_search.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.flat_index_save.restype = ctypes.c_int
    lib.flat_index_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.flat_index_load.restype = ctypes.c_void_p
    lib.flat_index_load.argtypes = [ctypes.c_char_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception as e:  # noqa: BLE001
        log.warning("native flat index unavailable: %s", e)
        return False


class NativeFlatIndex:
    """FAISS IndexFlat{IP,L2} equivalent on the host CPU."""

    def __init__(self, dim: int, metric: int = METRIC_IP,
                 _handle: Optional[int] = None):
        self._lib = _load()
        self.dim = dim
        self.metric = metric
        self._handle = (_handle if _handle is not None
                        else self._lib.flat_index_new(dim, metric))

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.flat_index_free(self._handle)
            self._handle = None

    def __len__(self) -> int:
        return int(self._lib.flat_index_size(self._handle))

    def add(self, vecs: np.ndarray) -> None:
        vecs = np.ascontiguousarray(vecs, dtype=np.float32)
        assert vecs.shape[1] == self.dim
        self._lib.flat_index_add(
            self._handle, vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            vecs.shape[0])

    def search(self, queries: np.ndarray, k: int,
               num_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        nq = queries.shape[0]
        k = min(k, len(self))
        scores = np.empty((nq, k), np.float32)
        indices = np.empty((nq, k), np.int64)
        self._lib.flat_index_search(
            self._handle,
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nq, k,
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            num_threads)
        return scores, indices

    def save(self, path: str) -> None:
        rc = self._lib.flat_index_save(self._handle, path.encode())
        if rc != 0:
            raise IOError(f"failed to save index to {path}")

    @classmethod
    def load(cls, path: str) -> "NativeFlatIndex":
        lib = _load()
        handle = lib.flat_index_load(path.encode())
        if not handle:
            raise IOError(f"failed to load index from {path}")
        # dim/metric live in the C struct; re-read via a tiny probe
        idx = cls.__new__(cls)
        idx._lib = lib
        idx._handle = handle
        # parse header for dim/metric
        import struct

        with open(path, "rb") as f:
            f.seek(8)
            dim, metric, _ = struct.unpack("<qqq", f.read(24))
        idx.dim = int(dim)
        idx.metric = int(metric)
        return idx
