"""Native C++ tier: build, correctness vs the device DDA, and the
UnstructuredMesh projection path."""

import numpy as np
import pytest

from openmeasure_tpu import native
from openmeasure_tpu.ctc import VoxelGrid, UnstructuredMesh, camera


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")


def voxel_grid_as_unstructured(grid: VoxelGrid) -> UnstructuredMesh:
    """Explode a VoxelGrid into per-cell AABBs — for hex cells the AABB is
    the cell, so native results must match the device DDA exactly."""
    nx, ny, nz = grid.dims
    i = np.arange(nx)
    j = np.arange(ny)
    k = np.arange(nz)
    K, J, I = np.meshgrid(k, j, i, indexing="ij")
    lo = grid.origin[None, :] + np.stack(
        [I.ravel(), J.ravel(), K.ravel()], axis=1) * grid.spacing[None, :]
    hi = lo + grid.spacing[None, :]
    bounds = np.empty((grid.n_cells, 6))
    bounds[:, 0::2] = lo
    bounds[:, 1::2] = hi
    return UnstructuredMesh(bounds)


class TestNativeRaycast:
    def setup_method(self, method):
        self.grid = VoxelGrid(origin=(-1, -1, -1),
                              spacing=(0.25, 0.25, 0.25), dims=(8, 8, 8))
        self.mesh = voxel_grid_as_unstructured(self.grid)

    @pytest.mark.parametrize("seed", range(6))
    def test_matches_device_dda(self, seed):
        rng = np.random.default_rng(seed)
        p1 = rng.uniform(-2, 2, 3)
        p2 = rng.uniform(-2, 2, 3)
        got = np.sort(self.mesh.find_cells_intersecting_line(p1, p2))
        expect = np.sort(self.grid.find_cells_intersecting_line(p1, p2))
        np.testing.assert_array_equal(got, expect)

    def test_batched_many_rays(self):
        rng = np.random.default_rng(42)
        n = 500
        p1 = rng.uniform(-2, 2, (n, 3))
        p2 = rng.uniform(-2, 2, (n, 3))
        ray_ids, cell_ids = self.mesh.trace_batch(p1, p2)
        # spot-check 20 rays against the device DDA
        for r in np.unique(ray_ids)[:20]:
            got = np.sort(cell_ids[ray_ids == r])
            expect = np.sort(
                self.grid.find_cells_intersecting_line(p1[r], p2[r]))
            np.testing.assert_array_equal(got, expect)

    def test_miss(self):
        hit = self.mesh.find_cells_intersecting_line(
            np.array([-5.0, 9.0, 0.0]), np.array([5.0, 9.0, 0.0]))
        assert hit.size == 0

    def test_from_cells_constructor(self):
        # two tetra-ish cells from points
        pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                        [2, 2, 2], [3, 2, 2], [2, 3, 2], [2, 2, 3]],
                       dtype=float)
        cells = np.array([[0, 1, 2, 3], [4, 5, 6, 7]])
        mesh = UnstructuredMesh.from_cells(pts, cells)
        assert mesh.n_cells == 2
        hit = mesh.find_cells_intersecting_line(
            np.array([-1.0, 0.4, 0.4]), np.array([1.5, 0.4, 0.4]))
        np.testing.assert_array_equal(np.sort(hit), [0])
        cc = mesh.cell_centers()
        np.testing.assert_allclose(cc[0], [0.25, 0.25, 0.25])

    def test_camera_project_unstructured_matches_voxel(self):
        cam = camera(np.array([0, 0, 2.0, 1.0]), np.zeros(3), 0.05, 2.8,
                     0.06, np.array([8, 8]), 0.5 / 8 / 1.0)
        grid = VoxelGrid.from_bounds((-0.5, 0.5, -0.5, 0.5, -0.5, 0.5),
                                     (6, 6, 6))
        mesh = voxel_grid_as_unstructured(grid)
        C_vox = cam.project(grid, "parallel")
        C_uns = cam.project(mesh, "parallel")
        assert (C_vox != C_uns).nnz == 0
