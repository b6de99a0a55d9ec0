"""ctypes binding for the native host-side accelerators (``native/``).

The TPU compute path is JAX/Pallas; this wraps the C++ library that
accelerates scene INGESTION (the role Assimp + ``AssimpMeshProvider.cpp``
play in the reference): OBJ parsing with fan triangulation, Morton ordering
of triangle centroids, and area-weighted vertex normals.  Every entry point
has a numpy fallback, so the library is an accelerator, never a dependency.

The shared library is built on demand with ``make -C native`` (g++); a
failed build just means fallbacks are used.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libheatray_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "heatray_native.cpp")
        ):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64 = ctypes.c_int64
        p = ctypes.POINTER
        lib.morton_order.argtypes = [
            p(ctypes.c_float), i64, p(ctypes.c_int32), i64, p(ctypes.c_int64)
        ]
        lib.vertex_normals.argtypes = [
            p(ctypes.c_float), i64, p(ctypes.c_int32), i64, p(ctypes.c_float)
        ]
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p, i64, p(i64)]
        lib.obj_read.argtypes = [ctypes.c_void_p] + [p(ctypes.c_float)] * 3 + [
            p(ctypes.c_int32)
        ] * 3
        lib.obj_free.argtypes = [ctypes.c_void_p]
        lib.bvh_build.restype = ctypes.c_void_p
        lib.bvh_build.argtypes = [
            p(ctypes.c_float), p(ctypes.c_float), i64,
            p(ctypes.c_uint8), i64, i64, p(i64),
        ]
        lib.bvh_read.argtypes = [
            ctypes.c_void_p, p(ctypes.c_float), p(ctypes.c_int32),
            p(ctypes.c_int32), p(ctypes.c_int32),
        ]
        lib.bvh_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def morton_order(positions: np.ndarray, indices: np.ndarray) -> Optional[np.ndarray]:
    """Native Morton permutation of triangle centroids; None -> use the
    numpy path (``scene.geometry._morton_order``)."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    out = np.empty(idx.shape[0], np.int64)
    lib.morton_order(
        _fptr(pos), pos.shape[0], _iptr(idx), idx.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def vertex_normals(positions: np.ndarray, indices: np.ndarray) -> Optional[np.ndarray]:
    """Native area-weighted smooth normals; None -> numpy fallback."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    out = np.empty_like(pos)
    lib.vertex_normals(_fptr(pos), pos.shape[0], _iptr(idx), idx.shape[0], _fptr(out))
    return out


def bvh_build(tri_min, tri_max, include, leaf_size: int, n_bins: int):
    """Native binned-SAH build (the C++ twin of ``ops.bvh.build_topology``).

    ``tri_min``/``tri_max``: planar (3, T) f32; ``include``: (T,) bool or
    None.  Returns (nbox (N, 6), leaf_chunk (N,), skip (N,), slot_tri
    (C * leaf_size,)) or None if the library is missing.
    """
    lib = _load()
    if lib is None:
        return None
    tmin = np.ascontiguousarray(tri_min, np.float32)
    tmax = np.ascontiguousarray(tri_max, np.float32)
    t_count = tmin.shape[1]
    if include is not None:
        inc = np.ascontiguousarray(include, np.uint8)
        inc_ptr = inc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    else:
        inc_ptr = None
    counts = (ctypes.c_int64 * 2)()
    handle = lib.bvh_build(
        _fptr(tmin), _fptr(tmax), t_count, inc_ptr, leaf_size, n_bins, counts
    )
    n_nodes, n_chunks = int(counts[0]), int(counts[1])
    nbox = np.empty((n_nodes, 6), np.float32)
    leaf_chunk = np.empty(n_nodes, np.int32)
    skip = np.empty(n_nodes, np.int32)
    slot_tri = np.empty(n_chunks * leaf_size, np.int32)
    lib.bvh_read(handle, _fptr(nbox), _iptr(leaf_chunk), _iptr(skip), _iptr(slot_tri))
    lib.bvh_free(handle)
    return nbox, leaf_chunk, skip, slot_tri


def parse_obj(text: bytes):
    """Native OBJ tokenize + fan-triangulate.

    Returns (v (V,3), vt (Vt,2), vn (Vn,3), fv (T,3), ft (T,3), fn (T,3))
    with -1 for absent vt/vn references, or None if the library is missing.
    """
    lib = _load()
    if lib is None:
        return None
    counts = (ctypes.c_int64 * 4)()
    handle = lib.obj_parse(text, len(text), counts)
    nv, nt, nn, ntri = (int(counts[i]) for i in range(4))
    v = np.empty((nv, 3), np.float32)
    vt = np.empty((nt, 2), np.float32)
    vn = np.empty((nn, 3), np.float32)
    fv = np.empty((ntri, 3), np.int32)
    ft = np.empty((ntri, 3), np.int32)
    fn = np.empty((ntri, 3), np.int32)
    lib.obj_read(handle, _fptr(v), _fptr(vt), _fptr(vn), _iptr(fv), _iptr(ft), _iptr(fn))
    lib.obj_free(handle)
    return v, vt, vn, fv, ft, fn
