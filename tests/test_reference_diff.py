"""Differential conformance vs the actual reference implementation.

Imports the reference's ``sparse_sensing.py`` directly from the read-only
mount (with a minimal cvxpy stub — cvxpy is only touched at import time and
in the COLS/CPOD paths we don't exercise here) and cross-checks our ROM/SPR
against it on identical random data: all 14 scale types, limit scaling with
the ±1000 clamp, decomposition/reduction/fit, reconstruction, measurement
scaling, QRCP placement, and weighted/unweighted OLS prediction.

This is the strongest available parity evidence given the reference's heavy
dependencies (gpytorch/openmdao/pyvista) are not installed.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

REF_PATH = "/root/reference/src/openmeasure/sparse_sensing.py"


class _Expr:
    """cvxpy-expression stand-in: carries .value and supports '+'."""

    def __init__(self, v):
        self.value = np.asarray(v)

    def __add__(self, other):
        return _Expr(self.value + other)

    def __radd__(self, other):
        return _Expr(other + self.value)


@pytest.fixture(scope="module")
def ref():
    stub = types.ModuleType("cvxpy")
    stub.multiply = lambda a, b: _Expr(np.multiply(a, b))

    def _unused(*a, **k):  # pragma: no cover
        raise NotImplementedError("cvxpy stub: COLS/CPOD not exercised here")

    for name in ("Variable", "Parameter", "Minimize", "Problem",
                 "sum_squares"):
        setattr(stub, name, _unused)

    saved = sys.modules.get("cvxpy")
    sys.modules["cvxpy"] = stub
    try:
        spec = importlib.util.spec_from_file_location("ref_sparse_sensing",
                                                      REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        if saved is None:
            sys.modules.pop("cvxpy", None)
        else:
            sys.modules["cvxpy"] = saved


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(123)
    n_points, n_features, m = 30, 3, 7
    X = rng.random((n_points * n_features, m)) + 0.5
    xyz = rng.random((n_points, 3))
    return dict(X=X, xyz=xyz, n_points=n_points, n_features=n_features, m=m)


ALL_SCALES = ["std", "none", "pareto", "vast", "range", "level", "max",
              "variance", "median", "poisson", "l2-norm"]
# vast_2/3/4 excluded: the reference's kurtosis call broadcasts only when
# m == n_points (latent shape bug, SURVEY §2 C2) — covered separately below.


class TestScalingDiff:
    @pytest.mark.parametrize("scale_type", ALL_SCALES)
    def test_scale_data(self, ref, data, scale_type):
        from openmeasure_tpu import ROM
        r1 = ref.ROM(data["X"], data["n_features"], data["xyz"])
        X0_ref = r1.scale_data(scale_type)
        r2 = ROM(data["X"], data["n_features"], data["xyz"])
        X0_ours = r2.scale_data(scale_type)
        np.testing.assert_allclose(np.asarray(X0_ours), X0_ref, rtol=1e-12,
                                   atol=1e-14)
        np.testing.assert_allclose(np.asarray(r2.X_cnt), r1.X_cnt,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(r2.X_scl), r1.X_scl,
                                   rtol=1e-12)

    def test_scale_data_axis_none(self, ref, data):
        from openmeasure_tpu import ROM
        r1 = ref.ROM(data["X"], data["n_features"], data["xyz"])
        X0_ref = r1.scale_data("std", axis_cnt=None)
        r2 = ROM(data["X"], data["n_features"], data["xyz"])
        X0_ours = r2.scale_data("std", axis_cnt=None)
        np.testing.assert_allclose(np.asarray(X0_ours), X0_ref, rtol=1e-12)

    @pytest.mark.parametrize("stype", ["vast_2", "vast_3", "vast_4"])
    def test_vast_family_when_square_block(self, ref, stype):
        """m == n_points is the one regime where the reference's
        ``kurtosis(x)`` (axis=0, per-COLUMN) broadcasts into the per-row
        scale slots (sparse_sensing.py:148) — pin down BOTH behaviors:
        the reference must equal its literal per-column form, and ours must
        equal the documented flattened-kurtosis deviation."""
        from scipy.stats import kurtosis
        rng = np.random.default_rng(5)
        X = rng.random((10, 10)) + 0.5
        xyz = rng.random((10, 3))

        r1 = ref.ROM(X, 1, xyz)
        r1.scale_data(stype)
        denom = {"vast_2": np.average(X), "vast_3": np.max(X),
                 "vast_4": np.max(X) - np.min(X)}[stype]
        scl_ref = np.std(X) ** 2 * kurtosis(X) ** 2 / denom  # per-column!
        np.testing.assert_allclose(r1.X_scl[:, 0], scl_ref, rtol=1e-12)

        from openmeasure_tpu import ROM
        r2 = ROM(X, 1, xyz)
        r2.scale_data(stype)
        scl_ours = np.std(X) ** 2 * kurtosis(X, axis=None) ** 2 / denom
        np.testing.assert_allclose(np.asarray(r2.X_scl[:, 0]),
                                   np.full(10, scl_ours), rtol=1e-10)

    def test_constant_block_reference_nans_ours_raises(self, ref, data):
        """Documented deviation (degenerate-scale guard): a constant
        (dead) feature block under 'std' yields scl = 0; the reference
        divides anyway and the NaN silently poisons the whole fit
        (``sparse_sensing.py:114-165``) — ours raises at the API layer
        with the offending feature ids (``rom.py scale_data``), matching
        the streaming tier's existing loud failure."""
        X = data["X"].copy()
        npts = data["n_points"]
        X[npts:2 * npts] = 7.5                     # block 1 constant
        r1 = ref.ROM(X, data["n_features"], data["xyz"])
        with np.errstate(divide="ignore", invalid="ignore"):
            X0_ref = r1.scale_data("std")
        # the reference's silent-corruption behavior, pinned
        assert np.isnan(X0_ref[npts:2 * npts]).all()
        assert not np.isnan(X0_ref[:npts]).any()

        from openmeasure_tpu import ROM
        r2 = ROM(X, data["n_features"], data["xyz"])
        with pytest.raises(ValueError, match=r"feature block\(s\) \[1\]"):
            r2.scale_data("std")

    def test_scale_limits(self, ref, data):
        from openmeasure_tpu import ROM
        r1 = ref.ROM(data["X"], data["n_features"], data["xyz"])
        r1.scale_data("std")
        lim = [np.array([-1e9, 0.2, 0.4]), np.array([1e9, 0.9, 2.0])]
        ref_lims = r1.scale_limits(lim)
        r2 = ROM(data["X"], data["n_features"], data["xyz"])
        r2.scale_data("std")
        ours = r2.scale_limits(lim)
        np.testing.assert_allclose(np.asarray(ours[0]), ref_lims[0],
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(ours[1]), ref_lims[1],
                                   rtol=1e-12)

    def test_unscale_data(self, ref, data):
        from openmeasure_tpu import ROM
        r1 = ref.ROM(data["X"], data["n_features"], data["xyz"])
        X0 = r1.scale_data("std")
        r2 = ROM(data["X"], data["n_features"], data["xyz"])
        r2.scale_data("std")
        np.testing.assert_allclose(
            np.asarray(r2.unscale_data(X0[:, 0])),
            r1.unscale_data(X0[:, 0]), rtol=1e-12)


class TestDecompositionDiff:
    def test_fit_and_reconstruct(self, ref, data):
        from openmeasure_tpu import ROM
        r1 = ref.ROM(data["X"], data["n_features"], data["xyz"])
        r1.fit(select_modes="number", n_modes=4)
        r2 = ROM(data["X"], data["n_features"], data["xyz"])
        r2.fit(select_modes="number", n_modes=4)

        np.testing.assert_allclose(np.asarray(r2.Sigma_r), r1.Sigma_r,
                                   rtol=1e-9)
        # reconstruction is sign-invariant
        x1 = r1.reconstruct(r1.Ar[0, :])
        x2 = np.asarray(r2.reconstruct(np.asarray(r2.Ar)[0, :]))
        np.testing.assert_allclose(x2, x1, rtol=1e-8, atol=1e-10)

    def test_variance_truncation_agrees(self, ref, data):
        from openmeasure_tpu import ROM
        for target in (80, 95, 99, 99.9):
            r1 = ref.ROM(data["X"], data["n_features"], data["xyz"])
            r1.fit(select_modes="variance", n_modes=target)
            r2 = ROM(data["X"], data["n_features"], data["xyz"])
            r2.fit(select_modes="variance", n_modes=target)
            assert r1.r == r2.r, f"rank mismatch at {target}%"


class TestSPRDiff:
    def _setup_pair(self, ref, data, n_modes=5):
        from openmeasure_tpu import SPR
        s1 = ref.SPR(data["X"], data["n_features"], data["xyz"])
        s1.fit(select_modes="number", n_modes=n_modes)
        s2 = SPR(data["X"], data["n_features"], data["xyz"])
        s2.fit(select_modes="number", n_modes=n_modes)
        return s1, s2

    def test_qr_placement_identical(self, ref, data):
        s1, s2 = self._setup_pair(ref, data)
        C1 = s1.optimal_placement()
        C2 = np.asarray(s2.optimal_placement())
        np.testing.assert_array_equal(np.argmax(C2, axis=1),
                                      np.argmax(C1, axis=1))

    def test_predict_ols_identical(self, ref, data):
        s1, s2 = self._setup_pair(ref, data)
        C1 = s1.optimal_placement()
        s1.train(C1)
        s2.train(C1)

        n_points = data["n_points"]
        y = np.zeros((C1.shape[0], 3))
        y[:, 0] = C1 @ data["X"][:, 2]
        y[:, 2] = np.argmax(C1, axis=1) // n_points
        a1, sig1 = s1.predict(y)
        a2, sig2 = s2.predict(y)
        # per-mode SVD sign is arbitrary: coefficients agree up to sign,
        # reconstructions agree exactly
        np.testing.assert_allclose(np.abs(np.asarray(a2)), np.abs(a1),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_array_equal(np.asarray(sig2), sig1)
        x1 = s1.reconstruct(a1)
        x2 = np.asarray(s2.reconstruct(a2))
        np.testing.assert_allclose(x2, x1, rtol=1e-7, atol=1e-9)

    def test_predict_weighted_identical(self, ref, data):
        s1, s2 = self._setup_pair(ref, data)
        C1 = s1.optimal_placement()
        s1.train(C1)
        s2.train(C1)
        n_points = data["n_points"]
        y = np.zeros((C1.shape[0], 3))
        y[:, 0] = C1 @ data["X"][:, 2]
        y[:, 1] = 0.25
        y[:, 2] = np.argmax(C1, axis=1) // n_points
        a1, sig1 = s1.predict(y)
        a2, sig2 = s2.predict(y)
        np.testing.assert_allclose(np.abs(np.asarray(a2)), np.abs(a1),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(sig2), sig1, rtol=1e-7,
                                   atol=1e-9)
        x1 = s1.reconstruct(a1)
        x2 = np.asarray(s2.reconstruct(a2))
        np.testing.assert_allclose(x2, x1, rtol=1e-6, atol=1e-8)

    def test_scale_vector_identical(self, ref, data):
        s1, s2 = self._setup_pair(ref, data)
        C1 = s1.optimal_placement()
        s1.train(C1)
        s2.train(C1)
        n_points = data["n_points"]
        y = np.zeros((C1.shape[0], 3))
        y[:, 0] = C1 @ data["X"][:, 0]
        y[:, 1] = 0.1
        y[:, 2] = np.argmax(C1, axis=1) // n_points
        np.testing.assert_allclose(s2.scale_vector(y), s1.scale_vector(y),
                                   rtol=1e-12)


class TestGEMDiff:
    def test_gem_selection_matches_reference(self, ref, data):
        """Reference GEM is RNG-jittered (sparse_sensing.py:667); on data
        with well-separated conditional variances the 1e-5 jitter cannot
        change the argmax, so selections must coincide exactly."""
        from openmeasure_tpu import SPR
        np.random.seed(0)  # reference uses the global numpy RNG
        s1 = ref.SPR(data["X"], data["n_features"], data["xyz"])
        s1.fit(select_modes="number", n_modes=5)
        C1 = s1.optimal_placement(calc_type="gem", n_sensors=6)

        s2 = SPR(data["X"], data["n_features"], data["xyz"])
        s2.fit(select_modes="number", n_modes=5)
        # align the basis signs to the reference so GEM sees identical rows
        Ur1 = s1.Ur
        Ur2 = np.asarray(s2.Ur)
        signs = np.sign(np.sum(Ur1 * Ur2, axis=0))
        s2.Ur = s2.Ur * signs[None, :]
        C2 = np.asarray(s2.optimal_placement(calc_type="gem", n_sensors=6))

        sel_ref = np.argmax(C1, axis=1)
        sel_ours = np.argmax(C2, axis=1)
        # The reference's random jitter can make Sigma_AA^-1 indefinite once
        # the selected set grows, at which point it degenerately RE-SELECTS
        # an already-chosen sensor (observed: duplicate at step 5).  Our
        # deterministic jitter avoids that; assert exact agreement on the
        # well-conditioned prefix and no duplicates on our side.
        n_prefix = 4
        np.testing.assert_array_equal(sel_ours[:n_prefix],
                                      sel_ref[:n_prefix])
        assert len(set(sel_ours.tolist())) == len(sel_ours)

    def test_gem_with_dmin_matches_reference(self, ref, data):
        from openmeasure_tpu import SPR
        np.random.seed(1)
        s1 = ref.SPR(data["X"], data["n_features"], data["xyz"])
        s1.fit(select_modes="number", n_modes=4)
        C1 = s1.optimal_placement(calc_type="gem", n_sensors=4, d_min=0.3)

        s2 = SPR(data["X"], data["n_features"], data["xyz"])
        s2.fit(select_modes="number", n_modes=4)
        signs = np.sign(np.sum(s1.Ur * np.asarray(s2.Ur), axis=0))
        s2.Ur = s2.Ur * signs[None, :]
        C2 = np.asarray(s2.optimal_placement(calc_type="gem", n_sensors=4,
                                             d_min=0.3))
        sel_ref = np.argmax(C1, axis=1)
        sel_ours = np.argmax(C2, axis=1)
        np.testing.assert_array_equal(sel_ours[:3], sel_ref[:3])
        assert len(set(sel_ours.tolist())) == len(sel_ours)


class TestMoreDiff:
    def test_reconstruct_with_sampling(self, ref, data):
        from openmeasure_tpu import ROM
        r1 = ref.ROM(data["X"], data["n_features"], data["xyz"])
        r1.fit(select_modes="number", n_modes=4)
        r2 = ROM(data["X"], data["n_features"], data["xyz"])
        r2.fit(select_modes="number", n_modes=4)
        S = np.zeros((7, data["X"].shape[0]))
        S[np.arange(7), np.arange(0, 70, 10)] = 1.0
        x1 = r1.reconstruct(r1.Ar[1, :], sampling=S)
        # same coefficients through our basis need the sign alignment
        signs = np.sign(np.sum(r1.Ur * np.asarray(r2.Ur), axis=0))
        x2 = np.asarray(r2.reconstruct(np.asarray(r1.Ar)[1, :] * signs,
                                       sampling=S))
        np.testing.assert_allclose(x2, x1, rtol=1e-7, atol=1e-9)

    def test_predict_list_matches_reference_loop(self, ref, data):
        from openmeasure_tpu import SPR
        s1 = ref.SPR(data["X"], data["n_features"], data["xyz"])
        s1.fit(select_modes="number", n_modes=5)
        s2 = SPR(data["X"], data["n_features"], data["xyz"])
        s2.fit(select_modes="number", n_modes=5)
        C = s1.optimal_placement()
        s1.train(C)
        s2.train(C)
        n_points = data["n_points"]
        ys = []
        for col in (0, 3, 5):
            y = np.zeros((C.shape[0], 3))
            y[:, 0] = C @ data["X"][:, col]
            y[:, 1] = 0.1 if col == 3 else 0.0   # mixed sigma/no-sigma list
            y[:, 2] = np.argmax(C, axis=1) // n_points
            ys.append(y)
        a1, sig1 = s1.predict(ys)
        a2, sig2 = s2.predict(ys)
        x1 = s1.reconstruct(a1)
        x2 = np.asarray(s2.reconstruct(a2))
        np.testing.assert_allclose(x2, x1, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(sig2), sig1, rtol=1e-6,
                                   atol=1e-9)

    def test_condition_number_matches(self, ref, data):
        from openmeasure_tpu import SPR
        s1 = ref.SPR(data["X"], data["n_features"], data["xyz"])
        s1.fit(select_modes="number", n_modes=5)
        s2 = SPR(data["X"], data["n_features"], data["xyz"])
        s2.fit(select_modes="number", n_modes=5)
        C = s1.optimal_placement()
        s1.train(C, cond=True)     # square Theta branch
        s2.train(C, cond=True)
        np.testing.assert_allclose(s2.k, s1.k, rtol=1e-6)
        # non-square branch (identity C)
        I = np.eye(data["X"].shape[0])
        s1.train(I, cond=True)
        s2.train(I, cond=True)
        np.testing.assert_allclose(s2.k, s1.k, rtol=1e-6)


class TestErrorSurfaceDiff:
    """Validation-error parity: the exception TYPE and MESSAGE a user sees
    must match the actual reference module (SURVEY §5: 'keep the same
    validation surface')."""

    @staticmethod
    def _raises(fn):
        try:
            fn()
        except Exception as e:          # noqa: BLE001 - intentional capture
            return type(e).__name__, str(e)
        return None, None

    def _pair(self, ref_fn, our_fn):
        rt, rm = self._raises(ref_fn)
        ot, om = self._raises(our_fn)
        assert rt is not None, "reference did not raise"
        assert (ot, om) == (rt, rm)

    def test_ctor_validation_matches(self, ref, data):
        from openmeasure_tpu import ROM
        X, xyz = data["X"], data["xyz"]
        self._pair(lambda: ref.ROM([[1.0]], 1, xyz),
                   lambda: ROM([[1.0]], 1, xyz))
        self._pair(lambda: ref.ROM(X, 2.5, xyz),
                   lambda: ROM(X, 2.5, xyz))
        self._pair(lambda: ref.ROM(X[:89], 2, xyz),
                   lambda: ROM(X[:89], 2, xyz))

    def test_reduction_validation_matches(self, ref, data):
        from openmeasure_tpu import ROM
        X, xyz, nf = data["X"], data["xyz"], data["n_features"]

        def ref_fit(**kw):
            r = ref.ROM(X, nf, xyz)
            r.fit(**kw)

        def our_fit(**kw):
            r = ROM(X, nf, xyz)
            r.fit(**kw)

        for kw in (dict(select_modes="variance", n_modes=150),
                   dict(select_modes="number", n_modes=2.5),
                   dict(select_modes="number", n_modes=True),  # bool != int
                   dict(select_modes="bogus", n_modes=3)):
            self._pair(lambda kw=kw: ref_fit(**kw),
                       lambda kw=kw: our_fit(**kw))

    def test_spr_validation_matches(self, ref, data):
        from openmeasure_tpu import SPR
        X, xyz, nf = data["X"], data["xyz"], data["n_features"]

        def make(mod_cls):
            s = mod_cls(X, nf, xyz)
            s.fit(select_modes="number", n_modes=3)
            return s

        # train: C column count mismatch
        bad_C = np.zeros((3, X.shape[0] + 1))
        self._pair(lambda: make(ref.SPR).train(bad_C),
                   lambda: make(SPR).train(bad_C))
        # predict: y row-count mismatch vs Theta
        C = np.zeros((3, X.shape[0])); C[[0, 1, 2], [0, 1, 2]] = 1.0

        def ref_predict(y):
            s = make(ref.SPR); s.train(C); s.predict(y)

        def our_predict(y):
            s = make(SPR); s.train(C); s.predict(y)

        self._pair(lambda: ref_predict(np.zeros((5, 3))),
                   lambda: our_predict(np.zeros((5, 3))))
        self._pair(lambda: ref_predict(np.zeros((3, 2))),
                   lambda: our_predict(np.zeros((3, 2))))


class TestAdaptiveSamplingDiff:
    """C8: the reference's leave-one-out influence uses a scalar where a
    rank-1 projector was intended (``sparse_sensing.py:402``).

    ``Vt[k,:] @ V[k,:]`` contracts two 1-D rows to a SCALAR
    ``c_k = Σ_i Vt[k,i]·Vt[i,k]``, so the reference forms
    ``M = diag(S)(I − c_k·𝟙𝟙ᵀ)`` — a uniform all-ones shift unrelated to
    removing snapshot k's right-singular direction (the comment at
    ``sparse_sensing.py:403`` says "Influence of snapshot j on mode i", and
    the cited method needs the projector ``I − v_k v_kᵀ``).  The literal
    form is finite but meaningless; we implement the intended projector
    (``rom/rom.py adaptive_sampling``).  These tests (a) reproduce the
    reference's literal output bit-for-bit with a seeded candidate pool —
    proving the deviation claim pins the reference's ACTUAL semantics — and
    (b) assert our implementation equals an independent numpy oracle of the
    intended form, which genuinely diverges from the literal form here.
    """

    @staticmethod
    def _influence_pair(X0):
        """(literal, intended) relative-influence vectors, numpy float64."""
        _, S, Vt = np.linalg.svd(X0, full_matrices=False)
        V = Vt.T
        p = V.shape[0]
        lit = np.zeros(p)
        intended = np.zeros(p)
        for k in range(p):
            M_lit = np.diag(S) @ (np.eye(p) - Vt[k, :] @ V[k, :])
            M_int = np.diag(S) @ (np.eye(p) - np.outer(V[:, k], V[:, k]))
            for tgt, M in ((lit, M_lit), (intended, M_int)):
                Un = np.linalg.svd(M, full_matrices=False)[0]
                tgt[k] = np.sum(S * (1.0 / np.abs(np.diagonal(Un)) - 1.0))
        return lit / lit.sum(), intended / intended.sum()

    @staticmethod
    def _candidates(P, seed):
        from scipy.stats import qmc
        q = 100 * P.shape[1]
        s0 = qmc.LatinHypercube(d=P.shape[1], seed=seed).random(n=q)
        span = P.max(axis=0) - P.min(axis=0)
        return span[None, :] * s0 + P.min(axis=0)[None, :]

    @staticmethod
    def _pick(sample, P, inf_rel):
        dist = np.linalg.norm(sample[:, None, :] - P[None, :, :], axis=2)
        j = np.argmin(dist, axis=1)
        pot = dist[np.arange(sample.shape[0]), j] * inf_rel[j]
        return int(np.argmax(pot))

    def test_reference_literal_form_pinned_and_ours_intended(
            self, ref, data, monkeypatch):
        from scipy.stats import qmc
        from openmeasure_tpu import ROM

        X, xyz, nf, m = data["X"], data["xyz"], data["n_features"], data["m"]
        P = np.random.default_rng(7).random((m, 3)) * 2.0 + 1.0
        seed = 42

        class _SeededQMC:
            class LatinHypercube:
                def __init__(self, d):
                    self._s = qmc.LatinHypercube(d=d, seed=seed)

                def random(self, n):
                    return self._s.random(n)

        monkeypatch.setattr(ref, "qmc", _SeededQMC)
        s_ref = ref.ROM(X, nf, xyz).adaptive_sampling(P)

        X0 = ref.ROM(X, nf, xyz).scale_data("std")
        lit_rel, int_rel = self._influence_pair(X0)
        sample = self._candidates(P, seed)

        # (a) the reference's output IS the literal-scalar pipeline, exactly
        np.testing.assert_array_equal(
            s_ref, sample[self._pick(sample, P, lit_rel)])

        # (b) ours is the intended-projector pipeline, exactly (same seeded
        # candidate pool -> the returned row is bitwise one of `sample`)
        s_ours = np.asarray(ROM(X, nf, xyz).adaptive_sampling(P, seed=seed))
        np.testing.assert_array_equal(
            s_ours, sample[self._pick(sample, P, int_rel)])

        # the two forms genuinely diverge on this data (documents that the
        # deviation is substantive, not a formatting nicety)
        assert np.abs(lit_rel - int_rel).max() > 0.05
        assert not np.array_equal(s_ref, s_ours)


class TestRandomizedSweep:
    """Seeded randomized differential sweep: random (n_features, n_points,
    m, r, s) shapes x 11 shape-safe scale types x weighted/unweighted
    predicts, compared at RECONSTRUCTION level (coefficient signs follow
    each side's SVD sign convention — reconstruction is sign-invariant).
    Complements the fixed-shape conformance tests above with broad
    configuration coverage; seed-pinned so failures reproduce."""

    @pytest.mark.slow
    def test_spr_flow_matches_reference_on_random_configs(self, ref):
        from openmeasure_tpu import SPR
        rng = np.random.default_rng(42)
        scales = ["std", "none", "pareto", "vast", "range", "level",
                  "max", "variance", "median", "poisson", "l2-norm"]
        for trial in range(6):
            nf = int(rng.integers(1, 4))
            npts = int(rng.integers(20, 60))
            m = int(rng.integers(6, 16))
            r = int(rng.integers(2, min(m, 7)))
            s = int(rng.integers(r, r + 3))
            st = scales[int(rng.integers(len(scales)))]
            # positive data: poisson/vast scaling are sqrt/ratio of means
            X = np.asarray(rng.uniform(1.0, 100.0, (nf * npts, m))
                           * rng.uniform(0.5, 5))
            xyz = rng.standard_normal((npts, 3))

            R = ref.SPR(X, nf, xyz)
            X0r = R.scale_data(scale_type=st)
            Ur_, Ar_, ev_ = R.decomposition(X0r, select_modes="number",
                                            n_modes=r)
            Urr, _ = R.reduction(Ur_, Ar_, ev_, "number", r)
            R.Ur = Urr
            Cr = np.zeros((s, nf * npts))
            rows = rng.choice(nf * npts, s, replace=False)
            Cr[np.arange(s), rows] = 1
            R.train(Cr)
            y = np.zeros((s, 3))
            y[:, 0] = X[rows, int(rng.integers(m))]
            if trial % 2:
                y[:, 1] = rng.uniform(0.01, 0.5, s)
            y[:, 2] = rows // npts
            ar_ref, _ = R.predict(y)
            xr_ref = np.asarray(R.reconstruct(
                np.asarray(ar_ref).reshape(1, -1))).ravel()

            O = SPR(X, nf, xyz)
            O.fit(scale_type=st, select_modes="number", n_modes=r)
            O.train(Cr)
            ar_our, _ = O.predict(y)
            xr_our = np.asarray(O.reconstruct(np.asarray(ar_our))).ravel()

            scale = max(np.max(np.abs(xr_ref)), 1e-12)
            d = float(np.max(np.abs(xr_our - xr_ref)) / scale)
            assert d < 1e-8, (trial, st, nf, m, r, s, d)
