"""Native (C++) host-side runtime components.

The reference's host-side heavy lifting lives in native code inside its
dependencies (VTK locators, LAPACK, libtorch — SURVEY §2 "native beneath").
This package holds the framework's own native tier, built on demand with the
system toolchain and loaded via ctypes (no pybind11 dependency):

* ``raycast.cpp`` — uniform-grid-accelerated segment/cell-AABB intersection
  for unstructured meshes, OpenMP-parallel over rays (the VTK
  ``find_cells_intersecting_line`` replacement for non-voxel meshes).
* ``npyloader.cpp`` — row-chunk .npy reader (single C-order matrix file, or
  the reference's per-snapshot column-file layout gathered with an
  OpenMP-parallel scatter transpose) feeding the out-of-core POD fit
  (``openmeasure_tpu.streaming``); ctypes releases the GIL for the whole
  read so a prefetch thread overlaps disk with device compute.

Every entry point has a pure-numpy fallback in its caller, so a failed
``g++`` build degrades performance, never functionality.
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


_SOURCES = ("raycast.cpp", "npyloader.cpp")


def _build() -> bool:
    srcs = [os.path.join(_HERE, s) for s in _SOURCES]
    # build to a temp name + atomic replace: rewriting the .so IN PLACE
    # leaves a previously-dlopened stale handle mapped (glibc caches by
    # pathname+inode), so a rebuild-and-reload within one process would
    # silently keep the old symbols
    tmp = _SO_PATH + ".build"
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
           "-o", tmp] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        os.replace(tmp, _SO_PATH)
        return True
    except Exception:
        try:  # retry without -march=native / openmp for maximal portability
            subprocess.run(["g++", "-O3", "-fPIC", "-shared",
                            "-o", tmp] + srcs,
                           check=True, capture_output=True, timeout=240)
            os.replace(tmp, _SO_PATH)
            return True
        except Exception:
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None:
        return _LIB
    if _BUILD_FAILED:
        return None
    src_mtime = max(os.path.getmtime(os.path.join(_HERE, s))
                    for s in _SOURCES)
    if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH) < src_mtime):
        if not _build():
            _BUILD_FAILED = True
            return None
    lib = ctypes.CDLL(_SO_PATH)
    if not hasattr(lib, "omtpu_npy_probe") or \
            not hasattr(lib, "trace_segments_cells"):  # stale .so
        if not _build():
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(_SO_PATH)
    try:
        lib.omtpu_npy_probe.restype = ctypes.c_long
        lib.omtpu_npy_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long)]
        lib.omtpu_read_rows_matrix.restype = ctypes.c_long
        lib.omtpu_read_rows_matrix.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_void_p]
        lib.omtpu_read_rows_files.restype = ctypes.c_long
        lib.omtpu_read_rows_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_void_p]
    except AttributeError:
        _BUILD_FAILED = True
        return None
    try:
        lib.trace_segments_aabb.restype = ctypes.c_long
        lib.trace_segments_aabb.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_long,
        ]
        lib.trace_segments_cells.restype = ctypes.c_long
        lib.trace_segments_cells.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_long,
        ]
    except AttributeError:
        # dlopen caches by pathname: when the stale-.so rebuild above
        # rewrote the file IN PLACE, the second CDLL can return the
        # already-mapped old handle without the new symbols — degrade to
        # the numpy fallbacks instead of crashing callers (the module's
        # failed-build contract)
        _BUILD_FAILED = True
        return None
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


def trace_segments_cells(points: np.ndarray, cells: np.ndarray,
                         p1s: np.ndarray, p2s: np.ndarray
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """EXACT segment/cell intersection for tet (k=4), pyramid (5), wedge
    (6), and hex (8) cells given by ``points (n_pts, 3)`` + ``cells
    (n_cells, k)`` connectivity (VTK vertex orderings).

    VTK-semantics replacement for ``find_cells_intersecting_line`` on
    genuinely unstructured meshes (reference ``utils.py:372``): the cell
    AABB is only a PREFILTER; a hit requires the segment to cross a
    triangulated face or lie inside the cell.  Returns (ray_ids, cell_ids)
    int64 hit pairs, deduped per ray.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native raycast library unavailable (g++ build "
                           "failed); use a VoxelGrid or pyvista mesh instead")
    points = np.ascontiguousarray(points, dtype=np.float64)
    cells = np.ascontiguousarray(cells, dtype=np.int64)
    p1s = np.ascontiguousarray(p1s, dtype=np.float64)
    p2s = np.ascontiguousarray(p2s, dtype=np.float64)
    n_cells, k = cells.shape
    n_rays = p1s.shape[0]
    # validate HERE, not via the C sentinel: a legitimate
    # buffer-too-small reply of -(needed) with needed >= 1e9 would
    # collide with the -1000000000-k range (review finding) — after this
    # check every negative return is unambiguously a buffer request
    if k not in (4, 5, 6, 8):
        raise ValueError(
            f"trace_segments_cells: unsupported cell vertex count {k} "
            "(supported: 4=tet, 5=pyramid, 6=wedge, 8=hex)")

    max_hits = max(1024, n_rays * 64)
    for _ in range(4):
        out_r = np.empty(max_hits, dtype=np.int64)
        out_c = np.empty(max_hits, dtype=np.int64)
        got = lib.trace_segments_cells(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            points.shape[0],
            cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_cells, k,
            p1s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            p2s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_rays,
            out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            max_hits)
        if got >= 0:
            return out_r[:got], out_c[:got]
        max_hits = -got
    raise RuntimeError("trace_segments_cells: buffer negotiation failed")


# --------------------------------------------------------------------- #
# npy row-chunk loader (npyloader.cpp)
# --------------------------------------------------------------------- #

_NPY_ERRORS = {
    -1: "open failed", -2: "bad magic", -3: "bad header",
    -4: "unsupported dtype (need <f4/<f8)", -5: "fortran order unsupported",
    -6: "unsupported shape", -7: "row range out of bounds",
    -8: "read failed", -9: "bad argument",
}


def _npy_check(rc: int, what: str):
    if rc != 0:
        raise RuntimeError(
            f"native npy loader: {what}: "
            f"{_NPY_ERRORS.get(rc, f'error {rc}')}")


def npy_probe(path: str) -> Tuple[int, Tuple[int, int], int]:
    """Parse a .npy header natively.  Returns (itemsize, (n, m), offset);
    1-D files report m=1.  Raises RuntimeError on unsupported files."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    item = ctypes.c_long()
    ndim = ctypes.c_long()
    shape = (ctypes.c_long * 2)()
    off = ctypes.c_long()
    rc = lib.omtpu_npy_probe(path.encode(), ctypes.byref(item),
                             ctypes.byref(ndim), shape, ctypes.byref(off))
    _npy_check(rc, path)
    return int(item.value), (int(shape[0]), int(shape[1])), int(off.value)


def read_rows_matrix(path: str, row0: int, nrows: int, m: int,
                     dtype=np.float32) -> np.ndarray:
    """Rows [row0, row0+nrows) of a C-order (n, m) .npy matrix file, with
    native dtype conversion.  One contiguous pread."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    dtype = np.dtype(dtype)
    out = np.empty((nrows, m), dtype=dtype)
    rc = lib.omtpu_read_rows_matrix(path.encode(), row0, nrows,
                                    dtype.itemsize,
                                    out.ctypes.data_as(ctypes.c_void_p))
    _npy_check(rc, path)
    return out


def read_rows_files(paths, row0: int, nrows: int,
                    dtype=np.float32) -> np.ndarray:
    """Rows [row0, row0+nrows) gathered across per-snapshot column .npy
    files into an (nrows, len(paths)) array — file j becomes column j.
    Files are read in parallel (OpenMP) and scatter-transposed natively."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    dtype = np.dtype(dtype)
    m = len(paths)
    out = np.empty((nrows, m), dtype=dtype)
    arr = (ctypes.c_char_p * m)(*[p.encode() for p in paths])
    rc = lib.omtpu_read_rows_files(arr, m, row0, nrows, dtype.itemsize,
                                   out.ctypes.data_as(ctypes.c_void_p))
    _npy_check(rc, "column files")
    return out
