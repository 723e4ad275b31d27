"""ctypes binding for the native C++ image loader (see imageio.cpp).

`decode_batch(paths, size, mode)` decodes a whole batch with an internal
thread pool (libjpeg/libpng, no GIL) into one uint8 NHWC array. Built on
first use with g++ and cached next to the source, like the flat index.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "imageio.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_imageio.so")
_lib = None
_build_failed = False

MODE_RAW_RESIZE = 0
MODE_CENTER_CROP = 1


def _build() -> str:
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
               "-fPIC", "-pthread", _SRC, "-ljpeg", "-lpng", "-o", _LIB]
        log.info("building native imageio: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load():
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        lib = ctypes.CDLL(_build())
    except (OSError, subprocess.CalledProcessError) as e:
        log.warning("native imageio unavailable (%s); falling back to PIL", e)
        _build_failed = True
        return None
    lib.hairci_decode_batch.restype = ctypes.c_int64
    lib.hairci_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_batch(paths: Sequence[str], size: int, mode: int,
                 n_threads: int = 0
                 ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode ``paths`` → ((N, size, size, 3) uint8, (N,) bool ok-mask).

    Returns None when the native library cannot be built/loaded (caller
    falls back to the PIL path).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    c_paths = (ctypes.c_char_p * n)(
        *[os.fsencode(p) for p in paths])
    if n_threads <= 0:
        n_threads = min(max(os.cpu_count() or 4, 1), 16)
    lib.hairci_decode_batch(
        c_paths, n, size, mode, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, ok.astype(bool)
