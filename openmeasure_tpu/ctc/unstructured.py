"""Unstructured mesh support for CTC projection.

The reference handles arbitrary meshes through pyvista/VTK
(``find_cells_intersecting_line``).  :class:`UnstructuredMesh` provides the
same query surface without VTK: cells are summarized by axis-aligned bounding
boxes and rays intersect them through the native C++ uniform-grid caster
(``openmeasure_tpu.native``), OpenMP-parallel over the whole ray bundle.

For hexahedral/voxel cells the AABB equals the cell, so results match VTK
exactly; for skewed elements the AABB is a superset (documented
approximation — tomography operators gain a few near-boundary entries).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .. import native


class UnstructuredMesh:
    """Cell soup defined by per-cell AABBs (or points + connectivity)."""

    def __init__(self, cell_bounds: np.ndarray,
                 cell_centers_xyz: Optional[np.ndarray] = None):
        """cell_bounds: (n_cells, 6) [xmin, xmax, ymin, ymax, zmin, zmax]."""
        self.cell_bounds = np.ascontiguousarray(cell_bounds, dtype=float)
        self.n_cells = self.cell_bounds.shape[0]
        self._centers = cell_centers_xyz

    @classmethod
    def from_cells(cls, points: np.ndarray, cells: np.ndarray
                   ) -> "UnstructuredMesh":
        """points (n_pts, 3); cells (n_cells, k) vertex-index connectivity."""
        pts = np.asarray(points, dtype=float)
        cell_pts = pts[np.asarray(cells)]        # (n_cells, k, 3)
        lo = cell_pts.min(axis=1)
        hi = cell_pts.max(axis=1)
        bounds = np.empty((cell_pts.shape[0], 6))
        bounds[:, 0::2] = lo
        bounds[:, 1::2] = hi
        centers = cell_pts.mean(axis=1)
        return cls(bounds, centers)

    def cell_centers(self) -> np.ndarray:
        if self._centers is None:
            lo = self.cell_bounds[:, 0::2]
            hi = self.cell_bounds[:, 1::2]
            self._centers = 0.5 * (lo + hi)
        return self._centers

    def find_cells_intersecting_line(self, p1, p2) -> np.ndarray:
        _, cells = self.trace_batch(np.asarray(p1, dtype=float)[None, :],
                                    np.asarray(p2, dtype=float)[None, :])
        return cells

    def trace_batch(self, p1s: np.ndarray, p2s: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Native batched trace: returns (ray_ids, cell_ids) hit pairs."""
        return native.trace_segments_aabb(self.cell_bounds, p1s, p2s)
