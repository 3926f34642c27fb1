"""ctypes bindings for the native AOT graph-precompute library.

Loads `native/libgator_precompute.so` when built (`make -C native`);
every entry point has a numpy fallback in `gator_tpu.assets.graphs` /
`gator_tpu.assets.coarsening`, and the tests cross-check the two.
"""
from __future__ import annotations

import ctypes
import os.path as osp
from typing import Optional

import numpy as np

_LIB_PATHS = (
    osp.join(osp.dirname(__file__), "..", "..", "native",
             "libgator_precompute.so"),
    osp.join(osp.dirname(__file__), "libgator_precompute.so"),
)

_lib = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        if osp.isfile(path):
            lib = ctypes.CDLL(osp.abspath(path))
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            lib.gator_floyd_warshall.restype = ctypes.c_int
            lib.gator_floyd_warshall.argtypes = [
                f32p, ctypes.c_int, ctypes.c_int, i32p, i32p]
            lib.gator_gen_edge_input.restype = None
            lib.gator_gen_edge_input.argtypes = [
                i32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
            lib.gator_hem_match.restype = ctypes.c_int
            lib.gator_hem_match.argtypes = [
                i32p, i32p, f32p, ctypes.c_int, i32p]
            _lib = lib
            return _lib
    return None


def available() -> bool:
    return load_library() is not None


def _require_library():
    lib = load_library()
    if lib is None:
        raise RuntimeError(
            "native graph-precompute library not built: run "
            "`make -C native` (or call with use_native=False / check "
            "native.available() first)")
    return lib


def floyd_warshall(adjacency: np.ndarray, sentinel: int = 510):
    """Native all-pairs hops + path matrix; raises if disconnected
    (same contract as graphs.floyd_warshall)."""
    lib = _require_library()
    adj = np.ascontiguousarray(adjacency, np.float32)
    off = adj.copy()
    np.fill_diagonal(off, 0.0)
    n = adj.shape[0]
    dist = np.empty((n, n), np.int32)
    path = np.empty((n, n), np.int32)
    disconnected = lib.gator_floyd_warshall(off, n, sentinel, dist, path)
    if disconnected:
        raise ValueError("joint graph is disconnected; hop tables undefined")
    return dist, path


def gen_edge_input(max_dist: int, path: np.ndarray,
                   edge_feat: np.ndarray, sentinel: int = 510):
    lib = _require_library()
    n = path.shape[0]
    out = np.empty((n, n, max_dist), np.float32)
    lib.gator_gen_edge_input(
        np.ascontiguousarray(path, np.int32),
        np.ascontiguousarray(edge_feat, np.float32),
        n, max_dist, sentinel, out)
    return out


def hem_match(w_csr) -> np.ndarray:
    """Native Graclus HEM pass over a scipy CSR matrix."""
    lib = _require_library()
    n = w_csr.shape[0]
    cluster = np.empty(n, np.int32)
    lib.gator_hem_match(
        np.ascontiguousarray(w_csr.indptr, np.int32),
        np.ascontiguousarray(w_csr.indices, np.int32),
        np.ascontiguousarray(w_csr.data, np.float32),
        n, cluster)
    return cluster.astype(np.int64)
