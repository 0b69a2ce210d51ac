"""Camera model and CTC projection operators.

API-parity re-implementation of the reference ``camera``
(``utils.py:101-468``): pinhole/thin-lens geometry on homogeneous
4-vectors, extrinsics E = R_x R_y R_z with translation, sensor pixel grid,
random lens-disc sampling, magnification m = d_sensor/f − 1, and
``project()`` producing the sparse binary measurement matrix
C (n_pixels, n_cells) for three projection models ('parallel', 'pinhole',
'thin_lens').

TPU-native difference: when the object mesh is a
:class:`openmeasure_tpu.ctc.grid.VoxelGrid`, ALL rays trace in one vmapped
DDA program on device (the reference loops over pixels in Python calling
VTK per ray, its hot loop ``utils.py:365-463``).  Unstructured meshes go through the native C++
uniform-grid AABB caster (``openmeasure_tpu.ctc.unstructured``); any other
mesh exposing ``find_cells_intersecting_line`` (e.g. pyvista) works via the
per-ray host path.

Determinism: the reference draws fresh OS-seeded RNG per pixel
(``utils.py:388,429``); here a single ``numpy`` Generator is used, seedable
via the ``seed`` argument.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from scipy.sparse import csr_matrix

from .grid import VoxelGrid


class camera:
    """See reference ``utils.py:101-213`` for the attribute glossary."""

    def __init__(self, p_cam, theta, f_length, n_aper, d_sensor,
                 sensor_size_px, px_size):
        self.p_cam = np.asarray(p_cam, dtype=float)
        self.theta = np.asarray(theta, dtype=float)
        self.f_length = f_length
        self.n_aper = n_aper
        self.d_sensor = d_sensor
        self.sensor_size_px = np.asarray(sensor_size_px)
        self.px_size = px_size

        self.n_pixels = int(sensor_size_px[0] * sensor_size_px[1])
        self.sensor_size_m = px_size * self.sensor_size_px
        self.d = np.linalg.norm(self.p_cam - np.array([0, 0, 0, 1.0]))

        m = d_sensor / f_length - 1
        if m > 1e-2:
            self.m = m
            self.d_object = f_length / (1 - f_length / d_sensor)
        else:
            self.m = 0
            self.d_object = -1

    # ------------------------------------------------------------------ #
    # Geometry (reference utils.py:215-285)
    # ------------------------------------------------------------------ #

    def _extr_matrix(self) -> np.ndarray:
        cx, sx = np.cos(self.theta[0]), np.sin(self.theta[0])
        cy, sy = np.cos(self.theta[1]), np.sin(self.theta[1])
        cz, sz = np.cos(self.theta[2]), np.sin(self.theta[2])
        R_x = np.array([[1, 0, 0, 0], [0, cx, -sx, 0],
                        [0, sx, cx, 0], [0, 0, 0, 1.0]])
        R_y = np.array([[cy, 0, sy, 0], [0, 1, 0, 0],
                        [-sy, 0, cy, 0], [0, 0, 0, 1.0]])
        R_z = np.array([[cz, -sz, 0, 0], [sz, cz, 0, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1.0]])
        E = R_x @ R_y @ R_z
        T = -E @ self.p_cam
        E[:-1, -1] = T[:-1]
        return E

    def _sensor_coordinates(self) -> np.ndarray:
        xs = np.linspace(-self.sensor_size_m[0] / 2 + self.px_size / 2,
                         self.sensor_size_m[0] / 2 - self.px_size / 2,
                         self.sensor_size_px[0])
        ys = np.linspace(self.sensor_size_m[1] / 2 - self.px_size / 2,
                         -self.sensor_size_m[1] / 2 + self.px_size / 2,
                         self.sensor_size_px[1])
        xg, yg = np.meshgrid(xs, ys)
        xyz_sl = np.zeros((xg.size, 4))
        xyz_sl[:, 0] = xg.ravel()
        xyz_sl[:, 1] = yg.ravel()
        xyz_sl[:, 3] = 1.0
        return xyz_sl

    def _random_lens(self, N_rand: int, rng) -> np.ndarray:
        R = self.f_length / (self.n_aper * 2)
        r = R * np.sqrt(rng.random(size=N_rand))
        th = rng.random(size=N_rand) * 2 * np.pi
        xyz_ll = np.zeros((N_rand, 4))
        xyz_ll[:, 0] = r * np.cos(th)
        xyz_ll[:, 1] = r * np.sin(th)
        xyz_ll[:, 2] = -self.d_sensor
        xyz_ll[:, 3] = 1.0
        return xyz_ll

    def generate_camera(self):
        """Pyvista visualization object (reference ``utils.py:287-316``);
        requires the optional pyvista dependency."""
        try:
            import pyvista as pv
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "generate_camera() needs the optional pyvista package for "
                "visualization") from e
        box_length = 2 * self.f_length
        boxl = pv.Box([-box_length / 2, box_length / 2,
                       -box_length / 2, box_length / 2,
                       -box_length / 2, box_length / 2])
        conel = pv.Cone(center=(0, 0, -3 * box_length / 4),
                        direction=(0, 0, 1), height=box_length / 2,
                        radius=box_length / 4, resolution=20)
        linel = pv.Line((0, 0, 0), (0, 0, -2 * self.d), resolution=2)
        groupl = boxl.merge([conel, linel])
        E_inv = np.linalg.inv(self._extr_matrix())
        return groupl.transform(E_inv)

    # ------------------------------------------------------------------ #
    # Ray generation (device-batched)
    # ------------------------------------------------------------------ #

    def _make_rays(self, type_rec: str, N_rand: int, rng):
        """Global-frame segment endpoints for every ray, plus the pixel id
        each ray belongs to.  Returns (p1 (R,3), p2 (R,3), pixel_ids (R,))."""
        E_inv = np.linalg.inv(self._extr_matrix())
        xyz_sl = self._sensor_coordinates()

        if type_rec == "parallel":
            p1l = xyz_sl
            p2l = xyz_sl.copy()
            p2l[:, 2] = -2 * self.d
            pix = np.arange(self.n_pixels)

        elif type_rec == "pinhole":
            pll = np.array([0, 0, -self.d_sensor, 1.0])
            dx = self.px_size * (rng.random((self.n_pixels, N_rand)) - 0.5)
            dy = self.px_size * (rng.random((self.n_pixels, N_rand)) - 0.5)
            psl = np.zeros((self.n_pixels, N_rand, 4))
            psl[:, :, 0] = xyz_sl[:, [0]] + dx
            psl[:, :, 1] = xyz_sl[:, [1]] + dy
            psl[:, :, 3] = 1.0
            v = pll[None, None, :] - psl
            v = v / np.linalg.norm(v[:, :, :3], axis=2, keepdims=True)
            pfl = psl + 2 * self.d * v
            p1l = psl.reshape(-1, 4)
            p2l = pfl.reshape(-1, 4)
            pix = np.repeat(np.arange(self.n_pixels), N_rand)

        elif type_rec == "thin_lens":
            if self.m == 0:
                raise ValueError("For focus at infinity use a different model")
            xyz_ll = self._random_lens(self.n_pixels * N_rand, rng)
            dx = self.px_size * (rng.random((self.n_pixels, N_rand)) - 0.5)
            dy = self.px_size * (rng.random((self.n_pixels, N_rand)) - 0.5)
            psl = np.zeros((self.n_pixels, N_rand, 4))
            psl[:, :, 0] = xyz_sl[:, [0]] + dx
            psl[:, :, 1] = xyz_sl[:, [1]] + dy
            psl[:, :, 3] = 1.0
            # reference indexes one lens point per pixel (utils.py:439)
            pll = xyz_ll[: self.n_pixels][:, None, :] * np.ones(
                (1, N_rand, 1))
            pol = np.zeros_like(pll)
            pol[:, :, 0] = -psl[:, :, 0] / self.m
            pol[:, :, 1] = -psl[:, :, 1] / self.m
            pol[:, :, 2] = -(self.d_object + self.d_sensor)
            pol[:, :, 3] = 1.0
            v = pol - pll
            v = v / np.linalg.norm(v[:, :, :3], axis=2, keepdims=True)
            pfl = pll + 2 * self.d * v
            p1l = pll.reshape(-1, 4)
            p2l = pfl.reshape(-1, 4)
            pix = np.repeat(np.arange(self.n_pixels), N_rand)
        else:
            raise NotImplementedError(
                f"projection type {type_rec!r} not implemented")

        p1g = (E_inv @ p1l.T).T[:, :3]
        p2g = (E_inv @ p2l.T).T[:, :3]
        return p1g, p2g, pix

    # ------------------------------------------------------------------ #
    # Projection (reference utils.py:318-468)
    # ------------------------------------------------------------------ #

    def project(self, obj_mesh, type_rec: str = "parallel",
                N_rand: int = 10, verbose: bool = False,
                seed: Optional[int] = None) -> csr_matrix:
        """Binary sparse measurement matrix C (n_pixels, n_cells): C[i, j]=1
        iff any ray of pixel i intersects cell j."""
        rng = np.random.default_rng(seed)
        p1, p2, pix = self._make_rays(type_rec, N_rand, rng)
        n_cells = obj_mesh.n_cells

        if isinstance(obj_mesh, VoxelGrid):
            cells, counts = obj_mesh.trace_batch(p1, p2)  # device-batched
            ray_ids = np.repeat(np.arange(cells.shape[0]), cells.shape[1])
            flat = cells.ravel()
            valid = flat >= 0
            rows = pix[ray_ids[valid]]
            cols = flat[valid]
        elif hasattr(obj_mesh, "trace_batch"):
            # native batched path (UnstructuredMesh): all rays in one call
            ray_ids, cols = obj_mesh.trace_batch(p1, p2)
            rows = pix[ray_ids]
        else:
            rows_l, cols_l = [], []
            for i in range(p1.shape[0]):
                hit = obj_mesh.find_cells_intersecting_line(p1[i], p2[i])
                rows_l.extend([pix[i]] * len(hit))
                cols_l.extend(list(hit))
                if verbose:
                    print(f"Ray {i+1}/{p1.shape[0]}", end="\r", flush=True)
            rows = np.asarray(rows_l, dtype=np.int64)
            cols = np.asarray(cols_l, dtype=np.int64)

        data = np.ones(len(rows), dtype=np.int64)
        C = csr_matrix((data, (rows, cols)),
                       shape=(self.n_pixels, n_cells))
        # binary dedup (reference dedups per pixel, utils.py:409-410)
        C.sum_duplicates()
        C.data[:] = 1
        return C
