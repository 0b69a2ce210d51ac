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


# --------------------------------------------------------------------- #
# Exact (VTK-semantics) unstructured intersection — round-5 task:
# oracle-tested on deliberately sheared meshes where the AABB path
# over-reports (VERDICT r4 missing #2; reference utils.py:372 is exact
# for arbitrary cells).
# --------------------------------------------------------------------- #


def _sheared_hex_mesh(nx=4, ny=3, nz=3, shear=((1.0, 0.55, 0.3),
                                               (0.0, 1.0, 0.45),
                                               (0.0, 0.0, 1.0))):
    """Regular unit-cube grid pushed through a linear shear: every cell is
    a parallelepiped (affine image of [0,1]^3), so an independent oracle
    can decide intersections EXACTLY by slab-clipping in the cell's
    pre-image coordinates."""
    S = np.asarray(shear)
    xs, ys, zs = np.arange(nx + 1), np.arange(ny + 1), np.arange(nz + 1)
    P = np.array([[x, y, z] for z in zs for y in ys for x in xs],
                 dtype=float)
    pts = P @ S.T
    vid = lambda x, y, z: x + (nx + 1) * (y + (ny + 1) * z)
    cells = []
    for z in range(nz):
        for y in range(ny):
            for x in range(nx):
                cells.append([vid(x, y, z), vid(x + 1, y, z),
                              vid(x + 1, y + 1, z), vid(x, y + 1, z),
                              vid(x, y, z + 1), vid(x + 1, y, z + 1),
                              vid(x + 1, y + 1, z + 1),
                              vid(x, y + 1, z + 1)])
    return pts, np.asarray(cells), S


def _oracle_hits_parallelepiped(S, origin_u, p1, p2):
    """Exact segment-vs-sheared-unit-cell via slab clip in pre-image
    coordinates u = S^-1 x - origin (an algorithm intentionally DIFFERENT
    from the implementation's triangulated-face test)."""
    Sinv = np.linalg.inv(S)
    u1 = Sinv @ p1 - origin_u
    u2 = Sinv @ p2 - origin_u
    d = u2 - u1
    t0, t1 = 0.0, 1.0
    for a in range(3):
        if abs(d[a]) < 1e-300:
            if u1[a] < 0.0 or u1[a] > 1.0:
                return False
            continue
        ta, tb = (0.0 - u1[a]) / d[a], (1.0 - u1[a]) / d[a]
        if ta > tb:
            ta, tb = tb, ta
        t0, t1 = max(t0, ta), min(t1, tb)
        if t0 > t1:
            return False
    return True


def _oracle_hits_tet(v, p1, p2):
    """Exact segment-vs-tet via half-space clipping in barycentric
    coordinates (again different from the triangle-face implementation)."""
    A = np.stack([v[1] - v[0], v[2] - v[0], v[3] - v[0]], axis=1)
    Ainv = np.linalg.inv(A)
    b1 = Ainv @ (p1 - v[0])
    b2 = Ainv @ (p2 - v[0])
    d = b2 - b1
    # constraints: b_i >= 0 (i=0..2), 1 - sum(b) >= 0  ->  g + h*t >= 0
    g = np.array([b1[0], b1[1], b1[2], 1.0 - b1.sum()])
    h = np.array([d[0], d[1], d[2], -d.sum()])
    t0, t1 = 0.0, 1.0
    for gi, hi in zip(g, h):
        if abs(hi) < 1e-300:
            if gi < 0.0:
                return False
            continue
        t = -gi / hi
        if hi > 0:
            t0 = max(t0, t)
        else:
            t1 = min(t1, t)
        if t0 > t1:
            return False
    return True


def _hit_sets(rays, cells, n_rays):
    out = [set() for _ in range(n_rays)]
    for r, c in zip(rays, cells):
        out[int(r)].add(int(c))
    return out


class TestExactUnstructured:
    def test_sheared_hex_matches_affine_oracle(self):
        pts, cells, S = _sheared_hex_mesh()
        mesh = UnstructuredMesh.from_cells(pts, cells)        # exact default
        assert mesh.exact
        rng = np.random.default_rng(7)
        n_rays = 120
        p1s = rng.uniform([-2, -2, -2], [0, 4, 4], size=(n_rays, 3)) @ S.T
        p2s = rng.uniform([4, -1, -1], [7, 4, 4], size=(n_rays, 3)) @ S.T
        r_ids, c_ids = mesh.trace_batch(p1s, p2s)
        got = _hit_sets(r_ids, c_ids, n_rays)

        nxyz = (4, 3, 3)
        origins = np.array([[x, y, z] for z in range(nxyz[2])
                            for y in range(nxyz[1])
                            for x in range(nxyz[0])], dtype=float)
        for r in range(n_rays):
            expect = {c for c in range(cells.shape[0])
                      if _oracle_hits_parallelepiped(S, origins[c],
                                                     p1s[r], p2s[r])}
            assert got[r] == expect, f"ray {r}"

    def test_aabb_fast_path_is_strict_superset_on_shear(self):
        pts, cells, S = _sheared_hex_mesh()
        exact = UnstructuredMesh.from_cells(pts, cells, exact=True)
        aabb = UnstructuredMesh.from_cells(pts, cells, exact=False)
        rng = np.random.default_rng(3)
        n_rays = 60
        p1s = rng.uniform([-2, -2, -2], [0, 4, 4], size=(n_rays, 3)) @ S.T
        p2s = rng.uniform([4, -1, -1], [7, 4, 4], size=(n_rays, 3)) @ S.T
        ge = _hit_sets(*exact.trace_batch(p1s, p2s), n_rays)
        ga = _hit_sets(*aabb.trace_batch(p1s, p2s), n_rays)
        assert all(ge[r] <= ga[r] for r in range(n_rays))
        # the shear must actually produce phantom AABB hits somewhere
        assert any(ge[r] < ga[r] for r in range(n_rays))

    def test_sheared_tet_matches_barycentric_oracle(self):
        pts, cells, S = _sheared_hex_mesh(nx=3, ny=2, nz=2)
        # 5-tet decomposition of each (sheared) cube
        TETS = [(0, 1, 2, 5), (0, 2, 7, 5), (0, 2, 3, 7), (0, 5, 7, 4),
                (2, 7, 5, 6)]
        tet_cells = np.array([[cell[i] for i in tet]
                              for cell in cells for tet in TETS])
        mesh = UnstructuredMesh.from_cells(pts, tet_cells)
        rng = np.random.default_rng(11)
        n_rays = 80
        p1s = rng.uniform([-2, -2, -2], [0, 3, 3], size=(n_rays, 3)) @ S.T
        p2s = rng.uniform([3, -1, -1], [6, 3, 3], size=(n_rays, 3)) @ S.T
        got = _hit_sets(*mesh.trace_batch(p1s, p2s), n_rays)
        V = pts[tet_cells]                          # (n_tets, 4, 3)
        for r in range(n_rays):
            expect = {c for c in range(tet_cells.shape[0])
                      if _oracle_hits_tet(V[c], p1s[r], p2s[r])}
            assert got[r] == expect, f"ray {r}"

    def test_contained_segment_hits_enclosing_cell(self):
        pts, cells, S = _sheared_hex_mesh(nx=2, ny=2, nz=2)
        mesh = UnstructuredMesh.from_cells(pts, cells)
        # short segment strictly inside cell (1,1,1) = index 7 (pre-image
        # coords (1.3..1.7)^3 mapped through the shear)
        u1, u2 = np.array([1.3, 1.4, 1.45]), np.array([1.7, 1.5, 1.55])
        p1, p2 = S @ u1, S @ u2
        hit = mesh.find_cells_intersecting_line(p1, p2)
        np.testing.assert_array_equal(np.sort(hit), [7])

    def test_numpy_fallback_matches_native(self, monkeypatch):
        pts, cells, S = _sheared_hex_mesh(nx=2, ny=2, nz=2)
        mesh = UnstructuredMesh.from_cells(pts, cells)
        rng = np.random.default_rng(5)
        n_rays = 25
        p1s = rng.uniform([-2, -2, -2], [0, 3, 3], size=(n_rays, 3)) @ S.T
        p2s = rng.uniform([3, -1, -1], [5, 3, 3], size=(n_rays, 3)) @ S.T
        native_hits = _hit_sets(*mesh.trace_batch(p1s, p2s), n_rays)
        monkeypatch.setattr(native, "available", lambda: False)
        numpy_hits = _hit_sets(*mesh.trace_batch(p1s, p2s), n_rays)
        assert native_hits == numpy_hits

    def test_axis_aligned_exact_equals_aabb(self):
        pts, cells, _ = _sheared_hex_mesh(shear=np.eye(3))
        exact = UnstructuredMesh.from_cells(pts, cells, exact=True)
        aabb = UnstructuredMesh.from_cells(pts, cells, exact=False)
        rng = np.random.default_rng(9)
        n_rays = 40
        p1s = rng.uniform([-2, -2, -2], [0, 4, 4], size=(n_rays, 3))
        p2s = rng.uniform([4, -1, -1], [7, 4, 4], size=(n_rays, 3))
        assert _hit_sets(*exact.trace_batch(p1s, p2s), n_rays) == \
            _hit_sets(*aabb.trace_batch(p1s, p2s), n_rays)

    def test_unsupported_vertex_count_raises(self):
        pts = np.random.rand(10, 3)
        with pytest.raises(ValueError, match="vertex count"):
            UnstructuredMesh.from_cells(pts, np.arange(7)[None, :])

    def test_camera_project_exact_vs_aabb_on_sheared_mesh(self):
        """Full CTC workflow integration: camera.project over a sheared
        hex mesh routes through the exact caster — its operator's support
        is a subset of the AABB mesh's (phantom near-boundary entries
        removed), strictly smaller somewhere, with identical shape."""
        pts, cells, S = _sheared_hex_mesh(nx=6, ny=6, nz=6)
        # center the mesh near the origin so the default camera sees it
        center = pts.mean(axis=0)
        scale = 0.2 / np.abs(pts - center).max()
        pts_c = (pts - center) * scale
        exact = UnstructuredMesh.from_cells(pts_c, cells)
        aabb = UnstructuredMesh.from_cells(pts_c, cells, exact=False)
        cam = camera(np.array([0.0, 0.0, 1.0, 1.0]), np.zeros(3), 0.05,
                     2.8, 0.06, np.array([16, 16]), 0.5 / 16)
        C_ex = cam.project(exact, "parallel")
        C_ab = cam.project(aabb, "parallel")
        assert C_ex.shape == C_ab.shape == (256, cells.shape[0])
        ex = set(zip(*C_ex.nonzero()))
        ab = set(zip(*C_ab.nonzero()))
        assert ex <= ab                     # exact never adds entries
        assert len(ex) < len(ab)            # shear produces phantoms
        assert len(ex) > 0                  # and the rays do hit cells

    def test_pyramid_closed_surface(self):
        """Review regression: PYR_TRIS was missing the (3,0,4) side face,
        leaving the pyramid surface open — a segment inside the AABB but
        outside the cell got phantom parity hits."""
        pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                        [0.5, 0.5, 1.0]], dtype=float)
        cells = np.array([[0, 1, 2, 3, 4]])
        mesh = UnstructuredMesh.from_cells(pts, cells)
        # inside the AABB, outside the pyramid (the reviewer's repro)
        assert mesh.find_cells_intersecting_line(
            np.array([0.05, 0.2, 0.8]), np.array([0.05, 0.8, 0.8])).size \
            == 0
        # contained segment low in the cell
        np.testing.assert_array_equal(
            mesh.find_cells_intersecting_line(
                np.array([0.45, 0.5, 0.2]), np.array([0.55, 0.5, 0.2])),
            [0])
        # crossing segment
        np.testing.assert_array_equal(
            mesh.find_cells_intersecting_line(
                np.array([-1.0, 0.5, 0.3]), np.array([2.0, 0.5, 0.3])),
            [0])
        # numpy fallback agrees on all three
        from openmeasure_tpu.ctc.unstructured import (
            _cell_face_triangles, _segment_hits_cells_numpy)
        tris = _cell_face_triangles(5)
        for p1, p2, expect in (
                ([0.05, 0.2, 0.8], [0.05, 0.8, 0.8], False),
                ([0.45, 0.5, 0.2], [0.55, 0.5, 0.2], True),
                ([-1.0, 0.5, 0.3], [2.0, 0.5, 0.3], True)):
            hit = _segment_hits_cells_numpy(pts, cells, tris,
                                            np.asarray(p1, float),
                                            np.asarray(p2, float))
            assert bool(hit[0]) is expect, (p1, p2)

    def test_center_contained_segment_axis_aligned_hex(self):
        """Review regression: a +x containment-parity ray from a
        symmetric midpoint passed exactly through the quad-face diagonal
        and double-counted — center-contained segments reported as
        misses.  The parity ray now uses a generic direction."""
        pts, cells, _ = _sheared_hex_mesh(nx=1, ny=1, nz=1,
                                          shear=np.eye(3))
        mesh = UnstructuredMesh.from_cells(pts, cells)
        hit = mesh.find_cells_intersecting_line(
            np.array([0.45, 0.5, 0.5]), np.array([0.55, 0.5, 0.5]))
        np.testing.assert_array_equal(np.sort(hit), [0])
        # numpy fallback too
        from openmeasure_tpu.ctc.unstructured import (
            _cell_face_triangles, _segment_hits_cells_numpy)
        hitn = _segment_hits_cells_numpy(
            pts.astype(float), cells, _cell_face_triangles(8),
            np.array([0.45, 0.5, 0.5]), np.array([0.55, 0.5, 0.5]))
        assert bool(hitn[0])
