"""Differential conformance vs the actual reference ``gpr.py`` and
``utils.py`` (camera).

The reference's GP module imports gpytorch at module scope but touches it
only inside train/predict/update; everything numpy-side — constructor
validation, the 14-type parameter scaling (C20), and ``GPR.fit``'s
Vr/Sigma_r/P0 pipeline (C21) — runs without it.  A minimal gpytorch stub
(torch itself is real) lets us import the module as part of the
``openmeasure`` package and cross-check those paths on identical data.
The same trick with a pyvista stub imports ``utils.py`` and cross-checks
the deterministic camera geometry (C30).
"""

import sys
import types

import numpy as np
import pytest

REF_SRC = "/root/reference/src"



def _raise_info(fn):
    """Run fn; return (exception type name, message) or (None, None)."""
    try:
        fn()
    except Exception as e:              # noqa: BLE001 - intentional capture
        return type(e).__name__, str(e)
    return None, None


class _Cls:
    def __init__(self, *a, **k):
        pass


@pytest.fixture(scope="module")
def refgpr():
    stubs = {}
    gp = types.ModuleType("gpytorch")
    models = types.ModuleType("gpytorch.models")
    models.ExactGP = type("ExactGP", (), {"__init__":
                                          lambda self, *a, **k: None})
    likelihoods = types.ModuleType("gpytorch.likelihoods")
    likelihoods.MultitaskGaussianLikelihood = _Cls
    likelihoods.GaussianLikelihood = _Cls
    distributions = types.ModuleType("gpytorch.distributions")
    distributions.MultivariateNormal = _Cls
    distributions.MultitaskMultivariateNormal = _Cls
    mlls = types.ModuleType("gpytorch.mlls")
    mlls.ExactMarginalLogLikelihood = _Cls
    gp.models, gp.likelihoods = models, likelihoods
    gp.distributions, gp.mlls = distributions, mlls
    stubs.update({"gpytorch": gp, "gpytorch.models": models,
                  "gpytorch.likelihoods": likelihoods,
                  "gpytorch.distributions": distributions,
                  "gpytorch.mlls": mlls})
    cv = types.ModuleType("cvxpy")
    cv.multiply = lambda a, b: np.multiply(a, b)
    stubs["cvxpy"] = cv

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_SRC)
    # the reference package may already be cached from the sparse_sensing
    # differential suite under a different name; import fresh
    for mod in [m for m in list(sys.modules)
                if m == "openmeasure" or m.startswith("openmeasure.")]:
        saved.setdefault(mod, sys.modules[mod])
        del sys.modules[mod]
    try:
        import openmeasure.gpr as ref_gpr
        yield ref_gpr
    finally:
        sys.path.remove(REF_SRC)
        for mod in [m for m in list(sys.modules)
                    if m == "openmeasure" or m.startswith("openmeasure.")]:
            del sys.modules[mod]
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n_points, n_features, m, d = 25, 3, 8, 2
    X = rng.random((n_points * n_features, m)) + 0.5
    P = rng.random((m, d)) + 0.2
    xyz = rng.random((n_points, 3))
    return dict(X=X, P=P, xyz=xyz, n_features=n_features)


ALL_P_SCALES = ["std", "none", "pareto", "vast", "range", "level", "max",
                "variance", "median", "poisson", "vast_2", "vast_3",
                "vast_4", "l2-norm"]


class TestGPRDiff:
    def test_ctor_validation_matches(self, refgpr, data):
        from openmeasure_tpu import GPR
        X, xyz = data["X"], data["xyz"]
        P_bad = np.zeros((X.shape[1] + 1, 2))

        grab = _raise_info

        rt = grab(lambda: refgpr.GPR(X, data["n_features"], xyz, P_bad))
        ot = grab(lambda: GPR(X, data["n_features"], xyz, P_bad))
        assert rt[0] is not None
        assert ot == rt

    @pytest.mark.parametrize("stype", ALL_P_SCALES)
    def test_scale_GPR_data_all_types(self, refgpr, data, stype):
        """C20: per-column parameter scaling, all 14 types — including the
        vast_2/3/4 kurtosis variants, which are well-formed here because the
        per-column x is 1-D (unlike the feature-block path's shape bug)."""
        from openmeasure_tpu import GPR
        X, P, xyz, nf = data["X"], data["P"], data["xyz"], data["n_features"]
        ref = refgpr.GPR(X, nf, xyz, P)
        ours = GPR(X, nf, xyz, P)
        P0_ref = ref.scale_GPR_data(P, stype)
        P0_our = np.asarray(ours.scale_GPR_data(P, stype))
        np.testing.assert_allclose(P0_our, P0_ref, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours.P_cnt), ref.P_cnt,
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours.P_scl), ref.P_scl,
                                   rtol=1e-10, atol=1e-12)

    def test_scale_GPR_data_unknown_type_matches(self, refgpr, data):
        from openmeasure_tpu import GPR
        X, P, xyz, nf = data["X"], data["P"], data["xyz"], data["n_features"]
        ref = refgpr.GPR(X, nf, xyz, P)
        ours = GPR(X, nf, xyz, P)

        grab = _raise_info

        assert grab(lambda: ours.scale_GPR_data(P, "bogus")) == \
            grab(lambda: ref.scale_GPR_data(P, "bogus"))

    def test_fit_outputs_match(self, refgpr, data):
        """C21: scale → decompose → normalize → parameter scaling, end to
        end vs the actual reference fit (up to per-mode sign of the SVD)."""
        from openmeasure_tpu import GPR
        X, P, xyz, nf = data["X"], data["P"], data["xyz"], data["n_features"]
        ref = refgpr.GPR(X, nf, xyz, P)
        ref.fit(select_modes="number", n_modes=4)
        ours = GPR(X, nf, xyz, P)
        ours.fit(select_modes="number", n_modes=4)

        np.testing.assert_allclose(np.asarray(ours.Sigma_r), ref.Sigma_r,
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(ours.P0), ref.P0, rtol=1e-10)
        for k in range(4):
            sgn = np.sign(np.dot(np.asarray(ours.Ur[:, k]), ref.Ur[:, k]))
            np.testing.assert_allclose(sgn * np.asarray(ours.Ur[:, k]),
                                       ref.Ur[:, k], atol=1e-8)
            np.testing.assert_allclose(sgn * np.asarray(ours.Vr[:, k]),
                                       ref.Vr[:, k], atol=1e-8)


@pytest.fixture(scope="module")
def refutils():
    """Import the reference utils.py (camera geometry) with a pyvista stub —
    pyvista is touched only in generate_camera/project/resample_to_grid."""
    pv = types.ModuleType("pyvista")
    for name in ("Box", "Cone", "Line", "StructuredGrid", "create_grid"):
        setattr(pv, name, _Cls)
    saved = {"pyvista": sys.modules.get("pyvista")}
    sys.modules["pyvista"] = pv
    sys.path.insert(0, REF_SRC)
    for mod in [m for m in list(sys.modules)
                if m == "openmeasure" or m.startswith("openmeasure.")]:
        saved.setdefault(mod, sys.modules[mod])
        del sys.modules[mod]
    try:
        import openmeasure.utils as ref_utils
        yield ref_utils
    finally:
        sys.path.remove(REF_SRC)
        for mod in [m for m in list(sys.modules)
                    if m == "openmeasure" or m.startswith("openmeasure.")]:
            del sys.modules[mod]
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


class TestCameraDiff:
    """C30: the deterministic camera geometry — extrinsics, magnification,
    object distance, sensor pixel grid — vs the actual reference ``camera``
    class (the lens-disc sampling is RNG-driven and differs by design:
    our RNG is seedable, the reference uses the numpy global state)."""

    CASES = [
        dict(p_cam=np.array([0.0, 0.0, 1.0, 1.0]),
             theta=np.zeros(3), f=0.05, n_aper=2.8, d_sensor=0.06),
        dict(p_cam=np.array([1.0, -0.5, 0.3, 1.0]),
             theta=np.array([0.3, -1.1, 2.0]), f=0.035, n_aper=4.0,
             d_sensor=0.052),
        dict(p_cam=np.array([0.2, 0.9, -0.4, 1.0]),
             theta=np.array([np.pi / 2, 0.0, -np.pi / 3]), f=0.05,
             n_aper=2.8, d_sensor=0.05),   # m == 0 branch
    ]

    @pytest.mark.parametrize("case", range(3))
    def test_geometry_matches(self, refutils, case):
        from openmeasure_tpu.ctc import camera
        c = self.CASES[case]
        px = np.array([7, 5])
        ref_cam = refutils.camera(c["p_cam"], c["theta"], c["f"],
                                  c["n_aper"], c["d_sensor"], px, 1e-4)
        our_cam = camera(c["p_cam"], c["theta"], c["f"], c["n_aper"],
                         c["d_sensor"], px, 1e-4)
        assert our_cam.m == pytest.approx(ref_cam.m, rel=1e-12)
        assert our_cam.d_object == pytest.approx(ref_cam.d_object,
                                                 rel=1e-12)
        assert our_cam.d == pytest.approx(ref_cam.d, rel=1e-12)
        np.testing.assert_allclose(our_cam._extr_matrix(),
                                   ref_cam._extr_matrix(),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(our_cam._sensor_coordinates(),
                                   ref_cam._sensor_coordinates(),
                                   rtol=1e-12, atol=1e-14)


@pytest.fixture(scope="module")
def refck():
    """Import the reference cokriging.py: stub openmdao's MultiFiCoKriging
    (only used in fit/predict) and satisfy its non-relative
    ``import sparse_sensing`` (the packaging bug, SURVEY §4) by putting the
    reference package directory itself on sys.path."""
    om_pkg = types.ModuleType("openmdao")
    om_sm = types.ModuleType("openmdao.surrogate_models")
    om_mfk = types.ModuleType("openmdao.surrogate_models.multifi_cokriging")
    om_mfk.MultiFiCoKriging = _Cls
    om_pkg.surrogate_models = om_sm
    om_sm.multifi_cokriging = om_mfk
    cv = types.ModuleType("cvxpy")
    cv.multiply = lambda a, b: np.multiply(a, b)
    stubs = {"openmdao": om_pkg, "openmdao.surrogate_models": om_sm,
             "openmdao.surrogate_models.multifi_cokriging": om_mfk,
             "cvxpy": cv}
    saved = {k: sys.modules.get(k) for k in stubs}
    saved["sparse_sensing"] = sys.modules.get("sparse_sensing")
    saved["cokriging"] = sys.modules.get("cokriging")
    sys.modules.update(stubs)
    pkg_dir = REF_SRC + "/openmeasure"
    sys.path.insert(0, pkg_dir)
    try:
        import importlib
        import cokriging as ref_ck
        ref_ck = importlib.reload(ref_ck)
        yield ref_ck
    finally:
        sys.path.remove(pkg_dir)
        for k in ("sparse_sensing", "cokriging"):
            sys.modules.pop(k, None)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


class TestCoKrigingDiff:
    """C26/C27: container validation and the Procrustes manifold alignment
    vs the actual reference cokriging.py (fit/predict delegate to openmdao
    and are fixture-tested in test_multifi instead)."""

    @pytest.fixture(scope="class")
    def ckdata(self):
        rng = np.random.default_rng(42)
        nf, nc_hf, nc_lf = 2, 40, 25
        n_l, n_u, d = 6, 9, 2
        X_l = rng.random((n_l, d))
        X_u = rng.random((n_u, d))
        Y_lf_l = rng.random((nf * nc_lf, n_l)) + 0.5
        Y_lf_u = rng.random((nf * nc_lf, n_u)) + 0.5
        Y_hf_l = rng.random((nf * nc_hf, n_l)) + 0.5
        xyz_lf = rng.random((nc_lf, 3))
        xyz_hf = rng.random((nc_hf, 3))
        return (X_l, X_u, Y_lf_l, Y_lf_u, Y_hf_l, xyz_lf, xyz_hf, nf)

    def test_ctor_validation_matches(self, refck, ckdata):
        from openmeasure_tpu import CoKriging
        args = list(ckdata)

        grab = _raise_info

        bad = list(args)
        bad[2] = bad[2][:, :-1]          # Y_lf_l column mismatch
        assert grab(lambda: CoKriging(*bad)) == \
            grab(lambda: refck.CoKriging(*bad))
        bad2 = list(args)
        bad2[3] = bad2[3][:, :-1]        # Y_lf_u column mismatch
        assert grab(lambda: CoKriging(*bad2)) == \
            grab(lambda: refck.CoKriging(*bad2))

    @pytest.mark.slow
    def test_manifold_alignment_random_configs(self, refck):
        """Seeded randomized sweep over shapes/mode selections — same
        per-mode-sign-aligned bars as the fixed-shape test above."""
        from openmeasure_tpu import CoKriging
        rng = np.random.default_rng(7)
        for trial in range(4):
            nf = int(rng.integers(1, 4))
            nc_hf = int(rng.integers(15, 50))
            nc_lf = int(rng.integers(10, 40))
            n_l = int(rng.integers(4, 9))
            n_u = int(rng.integers(3, 10))
            d = int(rng.integers(1, 4))
            args = (rng.random((n_l, d)), rng.random((n_u, d)),
                    rng.random((nf * nc_lf, n_l)) + 0.5,
                    rng.random((nf * nc_lf, n_u)) + 0.5,
                    rng.random((nf * nc_hf, n_l)) + 0.5,
                    rng.random((nc_lf, 3)), rng.random((nc_hf, 3)), nf)
            kw = (dict(select_modes="number",
                       n_modes_hf=int(rng.integers(2, min(n_l, 5))),
                       n_modes_lf=int(rng.integers(2, min(n_l + n_u, 6))))
                  if trial % 2 else
                  dict(select_modes="variance", n_modes_hf=99,
                       n_modes_lf=99))
            ref = refck.CoKriging(*args)
            ours = CoKriging(*args)
            ref.manifold_alignment(**kw)
            ours.manifold_alignment(**kw)
            assert ours.n_latent == ref.n_latent, (trial, kw)
            assert (ours.r_hf, ours.r_lf) == (ref.r_hf, ref.r_lf)
            Zh_o, Zh_r = np.asarray(ours.Zr_hf), np.asarray(ref.Zr_hf)
            Za_o = np.asarray(ours.Zr_aligned)
            Za_r = np.asarray(ref.Zr_aligned)
            for k in range(ref.n_latent):
                sgn = np.sign(np.dot(Zh_o[k], Zh_r[k]))
                np.testing.assert_allclose(sgn * Zh_o[k], Zh_r[k],
                                           rtol=1e-7, atol=1e-9)
                np.testing.assert_allclose(sgn * Za_o[k], Za_r[k],
                                           rtol=1e-7, atol=1e-9)

    def test_manifold_alignment_matches(self, refck, ckdata):
        from openmeasure_tpu import CoKriging
        ref = refck.CoKriging(*ckdata)
        ours = CoKriging(*ckdata)
        ref.manifold_alignment(select_modes="number", n_modes_hf=4,
                               n_modes_lf=3)
        ours.manifold_alignment(select_modes="number", n_modes_hf=4,
                                n_modes_lf=3)
        assert ours.n_latent == ref.n_latent
        assert (ours.r_hf, ours.r_lf) == (ref.r_hf, ref.r_lf)
        Zh_o, Zh_r = np.asarray(ours.Zr_hf), np.asarray(ref.Zr_hf)
        Za_o, Za_r = np.asarray(ours.Zr_aligned), np.asarray(ref.Zr_aligned)
        for k in range(ref.n_latent):
            # per-mode SVD sign: the aligned LF scores co-flip with the HF
            # scores (the Procrustes rotation absorbs LF-side signs)
            sgn = np.sign(np.dot(Zh_o[k], Zh_r[k]))
            np.testing.assert_allclose(sgn * Zh_o[k], Zh_r[k],
                                       rtol=1e-8, atol=1e-10)
            np.testing.assert_allclose(sgn * Za_o[k], Za_r[k],
                                       rtol=1e-8, atol=1e-10)
