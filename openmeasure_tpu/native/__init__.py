"""Native (C++) host-side runtime components.

The reference's host-side heavy lifting lives in native code inside its
dependencies (VTK locators, LAPACK, libtorch — SURVEY §2 "native beneath").
This package holds the framework's own native tier, built on demand with the
system toolchain and loaded via ctypes (no pybind11 dependency):

* ``raycast.cpp`` — uniform-grid-accelerated segment/cell-AABB intersection
  for unstructured meshes, OpenMP-parallel over rays (the VTK
  ``find_cells_intersecting_line`` replacement for non-voxel meshes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_omtpu_native.so")
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build() -> bool:
    src = os.path.join(_HERE, "raycast.cpp")
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
           "-o", _SO_PATH, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        try:  # retry without -march=native / openmp for maximal portability
            subprocess.run(["g++", "-O3", "-fPIC", "-shared",
                            "-o", _SO_PATH, src],
                           check=True, capture_output=True, timeout=240)
            return True
        except Exception:
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None:
        return _LIB
    if _BUILD_FAILED:
        return None
    if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH)
            < os.path.getmtime(os.path.join(_HERE, "raycast.cpp"))):
        if not _build():
            _BUILD_FAILED = True
            return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.trace_segments_aabb.restype = ctypes.c_long
    lib.trace_segments_aabb.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_long,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def trace_segments_aabb(boxes: np.ndarray, p1s: np.ndarray, p2s: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Intersect segments with cell AABBs.

    boxes: (n_cells, 6) [xmin, xmax, ymin, ymax, zmin, zmax]
    p1s, p2s: (n_rays, 3)

    Returns (ray_ids, cell_ids) int64 hit pairs (per-ray dedup done natively).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native raycast library unavailable (g++ build "
                           "failed); use a VoxelGrid or pyvista mesh instead")
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    p1s = np.ascontiguousarray(p1s, dtype=np.float64)
    p2s = np.ascontiguousarray(p2s, dtype=np.float64)
    n_cells, n_rays = boxes.shape[0], p1s.shape[0]

    max_hits = max(1024, n_rays * 64)
    for _ in range(4):
        out_r = np.empty(max_hits, dtype=np.int64)
        out_c = np.empty(max_hits, dtype=np.int64)
        got = lib.trace_segments_aabb(
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_cells,
            p1s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            p2s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_rays,
            out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            max_hits)
        if got >= 0:
            return out_r[:got], out_c[:got]
        max_hits = -got
    raise RuntimeError("trace_segments_aabb: buffer negotiation failed")
