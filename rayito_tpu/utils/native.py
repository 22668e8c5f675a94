"""ctypes bindings for the native runtime library (native/rayito_native.cpp).

The TPU compute path is JAX/XLA; host-side performance-bearing runtime work
(BVH ordering over large triangle soups, OBJ parsing) runs in C++ — the same
split of responsibilities as the reference, which does this work in
RAccel.h / OBJMesh.cpp. Every entry point has a pure-Python fallback, so the
framework works without the library; `is_available()` reports which path is
active and scene compile logs it.

Build: `make -C native` (g++, no external deps). The library is looked up
next to the repo's native/ directory and via RAYITO_NATIVE_LIB.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    env = os.environ.get("RAYITO_NATIVE_LIB")
    if env and os.path.exists(env):
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "librayito_native.so")
    return cand if os.path.exists(cand) else None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rayito_bvh_order.restype = ctypes.c_int
    lib.rayito_bvh_order.argtypes = [f32p, f32p, f32p, ctypes.c_int32, i32p]
    if hasattr(lib, "rayito_bvh_order_cuts"):
        lib.rayito_bvh_order_cuts.restype = ctypes.c_int
        lib.rayito_bvh_order_cuts.argtypes = [
            f32p, f32p, f32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p,
        ]
    lib.rayito_obj_parse.restype = ctypes.c_void_p
    lib.rayito_obj_parse.argtypes = [ctypes.c_char_p]
    for name in ("rayito_obj_num_vertices", "rayito_obj_num_normals",
                 "rayito_obj_num_tris"):
        getattr(lib, name).restype = ctypes.c_int32
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.rayito_obj_copy.restype = None
    lib.rayito_obj_copy.argtypes = [ctypes.c_void_p, f32p, f32p, i32p, i32p, i32p]
    lib.rayito_obj_free.restype = None
    lib.rayito_obj_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def is_available() -> bool:
    return _load() is not None


def bvh_order(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> Optional[np.ndarray]:
    """Native DFS primitive order; None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = v0.shape[0]
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    out = np.empty(n, np.int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    depth = lib.rayito_bvh_order(
        v0.ctypes.data_as(f32p),
        v1.ctypes.data_as(f32p),
        v2.ctypes.data_as(f32p),
        np.int32(n),
        out.ctypes.data_as(i32p),
    )
    if depth < 0:
        return None
    return out


def bvh_order_cuts(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                   cap: int):
    """Native DFS order + subtree-aligned cluster cut starts (the lo of
    every maximal subtree with <= cap primitives). Returns (order [N] i32,
    cut_starts [n_cuts] i32) or None when the library (or the entry point)
    is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "rayito_bvh_order_cuts"):
        return None
    n = v0.shape[0]
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    out = np.empty(n, np.int32)
    cuts = np.empty(n, np.int32)
    ncuts = np.zeros(1, np.int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    depth = lib.rayito_bvh_order_cuts(
        v0.ctypes.data_as(f32p),
        v1.ctypes.data_as(f32p),
        v2.ctypes.data_as(f32p),
        np.int32(n),
        np.int32(cap),
        out.ctypes.data_as(i32p),
        cuts.ctypes.data_as(i32p),
        ncuts.ctypes.data_as(i32p),
    )
    if depth < 0:
        return None
    return out, cuts[: int(ncuts[0])].copy()


def parse_obj(path: str):
    """Native OBJ parse. Returns (vertices [V,3], normals [Vn,3]|None,
    tri_idx [T,3], tri_nidx [T,3], face_ids [T]) or None (unavailable /
    unreadable / empty file)."""
    lib = _load()
    if lib is None:
        return None
    h = lib.rayito_obj_parse(path.encode())
    if not h:
        return None
    try:
        nv = lib.rayito_obj_num_vertices(h)
        nn = lib.rayito_obj_num_normals(h)
        nt = lib.rayito_obj_num_tris(h)
        vertices = np.empty((nv, 3), np.float32)
        normals = np.empty((max(nn, 1), 3), np.float32)
        tri_idx = np.empty((nt, 3), np.int32)
        tri_nidx = np.empty((nt, 3), np.int32)
        face_ids = np.empty(nt, np.int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.rayito_obj_copy(
            h,
            vertices.ctypes.data_as(f32p),
            normals.ctypes.data_as(f32p),
            tri_idx.ctypes.data_as(i32p),
            tri_nidx.ctypes.data_as(i32p),
            face_ids.ctypes.data_as(i32p),
        )
    finally:
        lib.rayito_obj_free(h)
    return vertices, (normals if nn else None), tri_idx, tri_nidx, face_ids
