"""ctypes binding to the native (C++) BVH builder.

Loads ``native/libfrt_native.so`` (built by ``make -C native``; see
native/frt_native.cpp).  The native builder is semantics-identical to the
NumPy one in build.py — tests assert bit-equality of all six output arrays —
and exists for large-scene build throughput (the host-side runtime component
the reference implements in C++; SURVEY.md §2 note on native components).

Falls back cleanly: ``available()`` is False when the .so is missing and
``build.py`` keeps using NumPy.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ["available", "build_bvh_native_arrays", "lib_path"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native", "libfrt_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.frt_bvh_build.restype = ctypes.c_void_p
    lib.frt_bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    lib.frt_bvh_num_nodes.restype = ctypes.c_int64
    lib.frt_bvh_num_nodes.argtypes = [ctypes.c_void_p]
    lib.frt_bvh_num_prims.restype = ctypes.c_int64
    lib.frt_bvh_num_prims.argtypes = [ctypes.c_void_p]
    lib.frt_bvh_export.restype = None
    lib.frt_bvh_export.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_float)] * 2 + [
        ctypes.POINTER(ctypes.c_int32)] * 4
    lib.frt_bvh_free.restype = None
    lib.frt_bvh_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_bvh_native_arrays(bmin: np.ndarray, bmax: np.ndarray,
                            max_leaf: int, use_sah: bool):
    """Returns the six flat arrays (NumPy) from the native builder."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            f"native builder not built; run `make -C native` ({lib_path()})")
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    n = bmin.shape[0]
    fptr = ctypes.POINTER(ctypes.c_float)
    handle = lib.frt_bvh_build(
        bmin.ctypes.data_as(fptr), bmax.ctypes.data_as(fptr),
        n, max_leaf, int(use_sah))
    try:
        n_nodes = lib.frt_bvh_num_nodes(handle)
        n_prims = lib.frt_bvh_num_prims(handle)
        node_min = np.empty((n_nodes, 3), np.float32)
        node_max = np.empty((n_nodes, 3), np.float32)
        node_first = np.empty(n_nodes, np.int32)
        node_count = np.empty(n_nodes, np.int32)
        node_skip = np.empty(n_nodes, np.int32)
        prim_ids = np.empty(n_prims, np.int32)
        iptr = ctypes.POINTER(ctypes.c_int32)
        lib.frt_bvh_export(
            handle,
            node_min.ctypes.data_as(fptr), node_max.ctypes.data_as(fptr),
            node_first.ctypes.data_as(iptr),
            node_count.ctypes.data_as(iptr),
            node_skip.ctypes.data_as(iptr),
            prim_ids.ctypes.data_as(iptr))
    finally:
        lib.frt_bvh_free(handle)
    return node_min, node_max, node_first, node_count, node_skip, prim_ids
