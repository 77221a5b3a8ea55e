"""ctypes bridge to the optional native ASCII-PLY parser.

The shared library is built from ``native/fastply.cc`` (see
``native/build.sh``). If it is absent or fails to load, callers fall back to
the NumPy parser in :mod:`.ply`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _find_library() -> Optional[str]:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(root, "native", "libfastply.so")
    return cand if os.path.exists(cand) else None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.fastply_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong),  # out: n_vertices
            ctypes.POINTER(ctypes.c_longlong),  # out: n_channels
        ]
        lib.fastply_read.restype = ctypes.POINTER(ctypes.c_float)
        lib.fastply_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.fastply_free.restype = None
        if hasattr(lib, "fastply_read_bulk"):
            lib.fastply_read_bulk.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),            # paths
                ctypes.c_longlong,                          # n
                ctypes.c_int,                               # nthreads
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),  # out ptrs
                ctypes.POINTER(ctypes.c_longlong),          # out n_vertices
                ctypes.POINTER(ctypes.c_longlong),          # out n_channels
            ]
            lib.fastply_read_bulk.restype = ctypes.c_longlong
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def try_read_ply_native(path: str) -> Optional[np.ndarray]:
    """Parse with the native library if present; None on any failure."""
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_longlong(0)
    c = ctypes.c_longlong(0)
    ptr = lib.fastply_read(path.encode(), ctypes.byref(n), ctypes.byref(c))
    if not ptr or n.value <= 0 or c.value <= 0:
        return None
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(n.value, c.value)).copy()
    finally:
        lib.fastply_free(ptr)
    return arr.astype(np.float32, copy=False)


def try_read_ply_bulk_native(
    paths, nthreads: int = 0
) -> Optional["list[Optional[np.ndarray]]"]:
    """Parse many PLY files with the native thread pool (GIL-free).

    Returns a list aligned with ``paths`` (None entries for files the
    parser rejected — callers fall back per-file), or None if the native
    library (or its bulk entry point) is unavailable. ``nthreads=0`` uses
    all host cores.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "fastply_read_bulk"):
        return None
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)()
    c_ns = (ctypes.c_longlong * n)()
    c_cs = (ctypes.c_longlong * n)()
    lib.fastply_read_bulk(c_paths, n, nthreads, c_outs, c_ns, c_cs)
    results: "list[Optional[np.ndarray]]" = []
    for i in range(n):
        ptr = c_outs[i]
        if not ptr or c_ns[i] <= 0 or c_cs[i] <= 0:
            results.append(None)
            continue
        try:
            arr = np.ctypeslib.as_array(ptr, shape=(c_ns[i], c_cs[i])).copy()
        finally:
            lib.fastply_free(ptr)
        results.append(arr.astype(np.float32, copy=False))
    return results
