"""Differential conformance of the CTC ray construction vs the reference.

Imports the reference's ``utils.py`` (with a bare pyvista stub — the
``camera`` class only touches pyvista inside ``generate_camera``) and
cross-checks our ``ctc.camera`` ray geometry against the actual reference
``project()`` (``/root/reference/src/openmeasure/utils.py:318-468``) using a
*recording stub mesh*: a fake object mesh whose
``find_cells_intersecting_line(p1, p2)`` captures every segment endpoint the
reference traces.

For ``'parallel'`` the construction is deterministic (``utils.py:358-379``)
and we assert exact endpoint + full-C parity.  For the stochastic
``'pinhole'``/``'thin_lens'`` models (``utils.py:381-463``) the reference
draws fresh OS-seeded generators per pixel, so we pin the randomness with a
*scripted RNG*: one seeded draw table is generated up front and served to
the reference in its per-pixel call order and to our vectorised
``_make_rays`` in its batched call order.  Under identical draws both sides
must produce bit-identical ray segments and identical binary C matrices —
this exercises the jitter mapping, the lens-centre ray (pinhole), the
object-plane crossing with magnification (thin lens), the 2·d extension and
the extrinsics inverse, not just nnz>0.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from openmeasure_tpu.ctc import camera as our_camera_mod
from openmeasure_tpu.ctc.camera import camera as OurCamera

REF_UTILS = "/root/reference/src/openmeasure/utils.py"


@pytest.fixture(scope="module")
def ref_utils():
    """Reference utils module with a bare pyvista stub."""
    stub = types.ModuleType("pyvista")
    saved = sys.modules.get("pyvista")
    sys.modules["pyvista"] = stub
    try:
        spec = importlib.util.spec_from_file_location("ref_utils", REF_UTILS)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        if saved is None:
            sys.modules.pop("pyvista", None)
        else:
            sys.modules["pyvista"] = saved


class RecordingMesh:
    """Stub mesh: records every traced segment, returns deterministic hits.

    The hit list is a pure function of the call index so that both
    implementations (which must issue identical call sequences) assemble
    their C matrices from identical hit lists.
    """

    def __init__(self, n_cells=40):
        self.n_cells = n_cells
        self.calls = []

    def find_cells_intersecting_line(self, p1, p2):
        i = len(self.calls)
        self.calls.append((np.array(p1, dtype=float),
                           np.array(p2, dtype=float)))
        # 2-3 distinct cells per ray, spread over the grid
        return [(3 * i) % self.n_cells, (3 * i + 7) % self.n_cells,
                (5 * i + 11) % self.n_cells][: 2 + i % 2]


class ScriptedRNG:
    """Serves a fixed queue of arrays through the Generator.random API."""

    def __init__(self, script):
        self._script = list(script)

    def random(self, size=None):
        if not self._script:
            raise AssertionError("scripted RNG exhausted")
        arr = self._script.pop(0)
        expect = (arr.size,) if np.isscalar(size) else tuple(size)
        assert arr.shape == expect or arr.shape == (size,), (
            f"draw-order mismatch: asked {size}, scripted {arr.shape}")
        return arr.reshape(size if size is not None else arr.shape)

    @property
    def exhausted(self):
        return not self._script


CAM_KW = dict(f_length=0.03, n_aper=2.0, d_sensor=0.05,
              sensor_size_px=np.array([4, 3]), px_size=2e-3)
POSES = [
    # (p_cam, theta) — axis-aligned and a fully generic pose
    (np.array([0.0, 0.0, 1.0, 1.0]), np.array([0.0, 0.0, 0.0])),
    (np.array([0.3, -0.2, 0.8, 1.0]), np.array([0.3, -0.5, 1.1])),
]


def _cameras(ref_utils, p_cam, theta):
    ref_cam = ref_utils.camera(p_cam, theta, **CAM_KW)
    our_cam = OurCamera(p_cam, theta, **CAM_KW)
    return ref_cam, our_cam


def _draw_table(n_pixels, N_rand, seed):
    """Seeded per-pixel jitter + lens-disc draw tables."""
    g = np.random.default_rng(seed)
    return dict(dx=g.random((n_pixels, N_rand)),
                dy=g.random((n_pixels, N_rand)),
                r=g.random(n_pixels * N_rand),
                th=g.random(n_pixels * N_rand))


def _scripts(table, model):
    """(reference-order script, our-order script) from one draw table."""
    n_pixels, N_rand = table["dx"].shape
    ref, ours = [], []
    if model == "thin_lens":
        # reference: _random_lens draws r then theta first (utils.py:425,
        # 275-277); ours likewise in _make_rays
        ref += [table["r"], table["th"]]
        ours += [table["r"], table["th"]]
    # reference: per pixel, fresh rng -> dx (N_rand,), dy (N_rand,)
    # (utils.py:388-390, 429-431); ours: dx (n,N) then dy (n,N)
    for i in range(n_pixels):
        ref += [table["dx"][i], table["dy"][i]]
    ours += [table["dx"], table["dy"]]
    return ScriptedRNG(ref), ScriptedRNG(ours)


class TestParallelRayParity:
    @pytest.mark.parametrize("pose", POSES, ids=["axis", "generic"])
    def test_endpoints_and_C_exact(self, ref_utils, pose):
        ref_cam, our_cam = _cameras(ref_utils, *pose)

        mesh_ref = RecordingMesh()
        C_ref = ref_cam.project(mesh_ref, type_rec="parallel")

        mesh_ours = RecordingMesh()
        C_ours = our_cam.project(mesh_ours, type_rec="parallel")

        assert len(mesh_ref.calls) == len(mesh_ours.calls) == 12
        for (p1r, p2r), (p1o, p2o) in zip(mesh_ref.calls, mesh_ours.calls):
            assert_allclose(p1o, p1r, rtol=0, atol=1e-13)
            assert_allclose(p2o, p2r, rtol=0, atol=1e-13)
        assert_array_equal(C_ours.toarray(), C_ref.toarray())


class TestStochasticRayParity:
    """Exact parity for pinhole/thin_lens under identical pinned draws."""

    @pytest.mark.parametrize("model", ["pinhole", "thin_lens"])
    @pytest.mark.parametrize("pose", POSES, ids=["axis", "generic"])
    def test_endpoints_and_C_exact(self, ref_utils, monkeypatch, model,
                                   pose):
        ref_cam, our_cam = _cameras(ref_utils, *pose)
        N_rand = 3
        table = _draw_table(ref_cam.n_pixels, N_rand, seed=2024)
        ref_rng, our_rng = _scripts(table, model)

        # the reference creates a fresh default_rng() per pixel (and one in
        # _random_lens); route every creation to the single scripted stream
        monkeypatch.setattr(np.random, "default_rng",
                            lambda *a, **k: ref_rng)
        mesh_ref = RecordingMesh()
        C_ref = ref_cam.project(mesh_ref, type_rec=model, N_rand=N_rand)
        assert ref_rng.exhausted

        monkeypatch.setattr(np.random, "default_rng",
                            lambda *a, **k: our_rng)
        mesh_ours = RecordingMesh()
        C_ours = our_cam.project(mesh_ours, type_rec=model, N_rand=N_rand)
        assert our_rng.exhausted

        assert len(mesh_ref.calls) == len(mesh_ours.calls) \
            == ref_cam.n_pixels * N_rand
        for k, ((p1r, p2r), (p1o, p2o)) in enumerate(
                zip(mesh_ref.calls, mesh_ours.calls)):
            assert_allclose(p1o, p1r, rtol=0, atol=1e-12,
                            err_msg=f"ray {k} start")
            assert_allclose(p2o, p2r, rtol=0, atol=1e-12,
                            err_msg=f"ray {k} end")
        # both C are binary with identical support
        assert set(np.unique(C_ref.data)) <= {1}
        assert_array_equal(C_ours.toarray(), C_ref.toarray())

    def test_lens_disc_radius_law(self, ref_utils):
        """The thin-lens lens points follow the area-uniform disc law with
        aperture radius f/(2N) on both sides (utils.py:266-285)."""
        ref_cam, our_cam = _cameras(ref_utils, *POSES[0])
        g = np.random.default_rng(7)
        pts_ref_rng = ScriptedRNG([g.random(5000), g.random(5000)])
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(np.random, "default_rng", lambda *a, **k: pts_ref_rng)
            pts_ref = ref_cam._random_lens(5000)
        g = np.random.default_rng(7)
        pts_ours = our_cam._random_lens(5000, g)
        assert_allclose(pts_ours, pts_ref, rtol=0, atol=1e-15)
        R = CAM_KW["f_length"] / (2 * CAM_KW["n_aper"])
        r = np.hypot(pts_ours[:, 0], pts_ours[:, 1])
        assert r.max() <= R
        # area-uniform: median radius ~ R/sqrt(2)
        assert abs(np.median(r) - R / np.sqrt(2)) < 0.02 * R
