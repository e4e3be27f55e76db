"""ctypes bindings for the native meshkit (auto-built, numpy fallback).

``load()`` returns the shared library handle or None; callers fall back to
their numpy implementations when unavailable (fem/spaces.py,
mesh/geometry.py, ops/operators.py).  Set NSTPU_NO_NATIVE=1 to force the
numpy paths (used by the parity tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_TRIED = False
_SRC = os.path.join(os.path.dirname(__file__), "meshkit.cpp")


def _so_path() -> str:
    cache = os.environ.get("NSTPU_NATIVE_DIR",
                           os.path.expanduser("~/.cache/nstpu_native"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libmeshkit.so")


def _build(so: str) -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(so) and os.path.getmtime(so) >= src_mtime:
            return True
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
               "-o", so + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so + ".tmp", so)
        return True
    except Exception as e:  # missing compiler, sandbox, ...
        print(f"meshkit native build unavailable ({e}); using numpy paths",
              file=sys.stderr)
        return False


def load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("NSTPU_NO_NATIVE"):
        return None
    so = _so_path()
    if not _build(so):
        return None
    lib = ctypes.CDLL(so)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    lib.edges_begin.restype = ctypes.c_void_p
    lib.edges_begin.argtypes = [c_i32p, ctypes.c_int64, ctypes.c_int32,
                                c_i32p, ctypes.c_int32, ctypes.c_int64]
    lib.edges_count.restype = ctypes.c_int64
    lib.edges_count.argtypes = [ctypes.c_void_p]
    lib.edges_finish.argtypes = [ctypes.c_void_p, c_i64p, c_i32p]
    lib.facets_begin.restype = ctypes.c_void_p
    lib.facets_begin.argtypes = [c_i32p, ctypes.c_int64, ctypes.c_int32,
                                 c_i32p, ctypes.c_int32, ctypes.c_int32]
    lib.facets_count.restype = ctypes.c_int64
    lib.facets_count.argtypes = [ctypes.c_void_p]
    lib.facets_finish.argtypes = [ctypes.c_void_p, c_i32p, c_i32p, c_i32p]
    lib.scatter_plan.argtypes = [c_i32p, ctypes.c_int64, c_i32p, c_i32p]
    _LIB = lib
    return _LIB


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def unique_edges(cells: np.ndarray, edges_local, n_pts: int):
    """(cell_edges (nc, n_le) int64, edge_verts (n_unique, 2) int32) or
    None when the native lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    le = np.ascontiguousarray(np.asarray(edges_local, dtype=np.int32))
    nc, k = cells.shape
    h = lib.edges_begin(_ptr(cells, ctypes.c_int32), nc, k,
                        _ptr(le, ctypes.c_int32), le.shape[0], n_pts)
    n_u = lib.edges_count(h)
    cell_edges = np.empty(nc * le.shape[0], dtype=np.int64)
    edge_verts = np.empty((n_u, 2), dtype=np.int32)
    lib.edges_finish(h, _ptr(cell_edges, ctypes.c_int64),
                     _ptr(edge_verts, ctypes.c_int32))
    return cell_edges.reshape(nc, le.shape[0]), edge_verts


def boundary_facets(cells: np.ndarray, facets_local):
    """(faces (n, fdim) i32, cell_ids (n,) i32, local_ids (n,) i32) or
    None."""
    lib = load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    lf = np.ascontiguousarray(np.asarray(facets_local, dtype=np.int32))
    nc, k = cells.shape
    n_lf, fdim = lf.shape
    h = lib.facets_begin(_ptr(cells, ctypes.c_int32), nc, k,
                         _ptr(lf, ctypes.c_int32), n_lf, fdim)
    n = lib.facets_count(h)
    faces = np.empty((n, fdim), dtype=np.int32)
    cell_ids = np.empty(n, dtype=np.int32)
    local_ids = np.empty(n, dtype=np.int32)
    lib.facets_finish(h, _ptr(faces, ctypes.c_int32),
                      _ptr(cell_ids, ctypes.c_int32),
                      _ptr(local_ids, ctypes.c_int32))
    return faces, cell_ids, local_ids


def scatter_plan(ids: np.ndarray):
    """(order, sorted_ids) int32 stable argsort, or None."""
    lib = load()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids.reshape(-1), dtype=np.int32)
    order = np.empty_like(ids)
    sorted_ids = np.empty_like(ids)
    lib.scatter_plan(_ptr(ids, ctypes.c_int32), ids.shape[0],
                     _ptr(order, ctypes.c_int32),
                     _ptr(sorted_ids, ctypes.c_int32))
    return order, sorted_ids
