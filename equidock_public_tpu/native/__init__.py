"""ctypes bindings for the native preprocessing kernels (graph_builder.cc),
with transparent numpy fallback when the shared library is unavailable.

Auto-builds libgraph_builder.so on first import if g++ is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgraph_builder.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.residue_mean_dist.argtypes = [f32p, i64p, ctypes.c_int64, f32p]
    lib.residue_mean_dist.restype = None
    lib.knn_edges.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                              ctypes.c_int64, i32p, u8p, f32p]
    lib.knn_edges.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def residue_mean_dist(atoms_list) -> Optional[np.ndarray]:
    """Native mean all-atom residue distance matrix; None if lib missing."""
    lib = _load()
    if lib is None:
        return None
    counts = np.array([a.shape[0] for a in atoms_list], dtype=np.int64)
    offsets = np.zeros(len(atoms_list) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    atoms = np.ascontiguousarray(
        np.concatenate(atoms_list, axis=0), dtype=np.float32)
    n = len(atoms_list)
    out = np.empty((n, n), dtype=np.float32)
    lib.residue_mean_dist(atoms, offsets, n, out)
    return out


def knn_edges(dist: np.ndarray, cutoff: float, max_neighbor: int
              ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    n = dist.shape[0]
    dist = np.ascontiguousarray(dist, dtype=np.float32)
    nbr = np.empty((n, max_neighbor), dtype=np.int32)
    mask = np.empty((n, max_neighbor), dtype=np.uint8)
    nd = np.empty((n, max_neighbor), dtype=np.float32)
    lib.knn_edges(dist, n, cutoff, max_neighbor, nbr, mask, nd)
    return nbr, mask.astype(bool), nd
