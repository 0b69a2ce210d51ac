"""Linalg-tier conformance: Gram-route SVD vs LAPACK, greedy QRCP vs geqp3,
ADMM box-QP vs SLSQP/KKT."""

import numpy as np
import pytest
import scipy.linalg as la
from scipy.optimize import minimize

import jax.numpy as jnp

from openmeasure_tpu.linalg import svd as _svd
from openmeasure_tpu.linalg import qrcp as _qrcp
from openmeasure_tpu.linalg import boxls as _boxls

RNG = np.random.default_rng(42)


class TestSVD:
    def test_matches_lapack_tall(self):
        X = RNG.standard_normal((300, 12))
        U, S, Vt = _svd.svd_tall(X)
        Un, Sn, Vtn = np.linalg.svd(X, full_matrices=False)
        np.testing.assert_allclose(S, Sn, rtol=1e-10)
        # compare up to per-mode sign
        for k in range(12):
            sgn = np.sign(np.dot(np.asarray(U[:, k]), Un[:, k]))
            np.testing.assert_allclose(np.asarray(U[:, k]) * sgn, Un[:, k],
                                       atol=1e-8)
            np.testing.assert_allclose(np.asarray(Vt[k]) * sgn, Vtn[k],
                                       atol=1e-8)

    def test_reconstruction_exact(self):
        X = RNG.standard_normal((200, 8))
        U, S, Vt = _svd.svd_tall(X)
        np.testing.assert_allclose(np.asarray(U * S[None, :] @ Vt), X,
                                   atol=1e-9)

    def test_all_zero_panel_is_finite(self):
        """A single-snapshot fit centers X0 to EXACTLY zero; LAPACK returns
        finite vectors for the zero matrix, so the Gram route must too (the
        tiny absolute floor in the U normalization — a purely relative
        floor is 0/0 there)."""
        Z = np.zeros((50, 4))
        for rank in (None, 2):
            U, S, Vt = _svd.svd_tall(Z, canonicalize=rank is None,
                                     rank=rank)
            assert np.isfinite(np.asarray(U)).all()
            np.testing.assert_allclose(np.asarray(S), 0.0, atol=1e-12)

    def test_tail_mode_normalization_large_n_fp32(self):
        """Regression: the rank-deficiency floor must scale as eps·max·√n,
        not eps·max·n.  In fp32 at n ≈ 1e5+ rows, an n-proportional floor
        exceeds the norms of REAL tail modes (eps·n = 0.014 at n=120k) and
        silently divides them by the floor instead of their true column
        norms — measured as a 3.1e-3 max|U| error on the 1.7M-row 3D set
        (modes with σ_k < 0.2·σ_1 shrunk up to 4×) while reconstruction
        NRMSE hid it (pinv(C Ur) cancels column scaling)."""
        n, m = 120_000, 6
        rng = np.random.default_rng(3)
        U0, _ = np.linalg.qr(rng.standard_normal((n, m)))
        V0, _ = np.linalg.qr(rng.standard_normal((m, m)))
        s = np.array([1.0, 0.5, 0.1, 0.03, 0.01, 0.003])
        X = ((U0 * s[None, :]) @ V0.T).astype(np.float32)
        Un, Sn, _ = np.linalg.svd(X.astype(np.float64), full_matrices=False)
        eps32 = np.finfo(np.float32).eps
        # precondition: the tail sits in the old-bug region
        assert Sn[-1] < eps32 * n * Sn[0]
        assert Sn[-1] > 10 * eps32 * np.sqrt(n) * Sn[0]
        for rank in (None, m):
            U = np.asarray(_svd.svd_tall(X, canonicalize=rank is None,
                                         rank=rank)[0], dtype=np.float64)
            np.testing.assert_allclose(np.linalg.norm(U, axis=0),
                                       np.ones(m), rtol=1e-5)
            for k in range(m):
                sgn = np.sign(np.dot(U[:, k], Un[:, k]))
                np.testing.assert_allclose(U[:, k] * sgn, Un[:, k],
                                           atol=2e-5)

    def test_ill_conditioned(self):
        # condition number ~1e6: the fp64 Gram route must still match.
        n, m = 500, 10
        U0, _ = np.linalg.qr(RNG.standard_normal((n, m)))
        s = np.logspace(0, -6, m)
        V0, _ = np.linalg.qr(RNG.standard_normal((m, m)))
        X = U0 * s[None, :] @ V0.T
        _, S, _ = _svd.svd_tall(X)
        np.testing.assert_allclose(S, np.sort(s)[::-1], rtol=1e-6)

    def test_explained_variance(self):
        S = jnp.asarray([3.0, 2.0, 1.0])
        ev = _svd.explained_variance(S)
        L = np.array([9.0, 4.0, 1.0])
        np.testing.assert_allclose(ev, 100 * np.cumsum(L) / L.sum(),
                                   rtol=1e-12)

    def test_select_rank(self):
        ev = np.array([50.0, 80.0, 95.0, 99.5, 100.0])
        assert _svd.select_rank(ev, "variance", 99, 5) == 4
        assert _svd.select_rank(ev, "variance", 100, 5) == 5
        assert _svd.select_rank(ev, "number", 3, 5) == 3
        with pytest.raises(ValueError):
            _svd.select_rank(ev, "variance", 101, 5)
        with pytest.raises(TypeError):
            _svd.select_rank(ev, "number", 2.5, 5)
        with pytest.raises(ValueError):
            _svd.select_rank(ev, "bogus", 3, 5)

    def test_randomized_svd(self):
        # decaying spectrum, as in real snapshot matrices
        n, m, k = 400, 60, 10
        U0, _ = np.linalg.qr(RNG.standard_normal((n, m)))
        V0, _ = np.linalg.qr(RNG.standard_normal((m, m)))
        s = np.exp(-0.5 * np.arange(m))
        X = U0 * s[None, :] @ V0.T
        S = _svd.randomized_svd(X, k, n_iter=6)[1]
        np.testing.assert_allclose(S, s[:k], rtol=1e-6)


class TestQRCP:
    @pytest.mark.parametrize("shape", [(5, 40), (12, 300), (14, 2000)])
    def test_pivots_match_lapack(self, shape):
        A = RNG.standard_normal(shape)
        k = shape[0]
        piv = np.asarray(_qrcp.qrcp_pivots(A, k))
        _, _, P = la.qr(A, pivoting=True, mode="economic")
        np.testing.assert_array_equal(piv, P[:k])

    def test_onehot(self):
        piv = jnp.asarray([3, 0, 2], dtype=jnp.int32)
        C = np.asarray(_qrcp.pivots_to_onehot(piv, 5))
        expect = np.zeros((3, 5))
        expect[0, 3] = expect[1, 0] = expect[2, 2] = 1
        np.testing.assert_array_equal(C, expect)

    def test_pallas_kernels_reject_k_beyond_direction_cap(self):
        """The Pallas kernels lane-pad the accepted-directions block to 128
        columns; k > 128 must raise (a silent cap would stop deflating past
        column 127 and return wrong pivots).  The auto router falls back to
        the jnp sweep instead."""
        from openmeasure_tpu.linalg import qrcp_pallas as _pl
        A = jnp.asarray(RNG.standard_normal((140, 400)), jnp.float32)
        with pytest.raises(ValueError, match="k <= 128"):
            _pl.qrcp_pivots_pallas(A, 130)
        with pytest.raises(ValueError, match="k <= 128"):
            _pl.qrcp_pivots_streamed(A, 130)
        piv = np.asarray(_pl.qrcp_pivots_auto(A, 130))  # jnp fallback
        assert piv.shape == (130,) and len(set(piv.tolist())) == 130


class TestBoxQP:
    @staticmethod
    def _assert_kkt(H, c, A, lo, hi, g, bar=1e-6, act_tol=1e-6):
        """First-order (KKT) optimality certificate for
        ``min ½gᵀHg − cᵀg  s.t. lo ≤ Ag ≤ hi`` — solver-independent, so it
        catches a wrong answer even if two iterative solvers agreed on it.

        Stationarity: ∇f(g) + Aᵀμ = 0 with μ_i ≥ 0 on upper-active rows,
        μ_i ≤ 0 on lower-active rows, free on equality rows (lo == hi), and
        0 on inactive rows.  μ is recovered on the active set by least
        squares, projected onto its sign constraints, and the remaining
        stationarity residual (the projected gradient) must be ≤ `bar`
        relative to the gradient scale; feasibility must hold to the same
        order."""
        g = np.asarray(g, np.float64)
        grad = H @ g - c
        Ag = A @ g
        scale = 1.0 + np.linalg.norm(c) + np.linalg.norm(H @ g)
        # feasibility
        viol = max(np.max(lo - Ag, initial=0.0),
                   np.max(Ag - hi, initial=0.0))
        assert viol <= bar * (1.0 + np.max(np.abs(np.concatenate(
            [lo[np.isfinite(lo)], hi[np.isfinite(hi)]])))), \
            f"constraint violation {viol:.3e}"
        act_lo = (Ag - lo) <= act_tol * (1.0 + np.abs(np.where(
            np.isfinite(lo), lo, 0.0)))
        act_hi = (hi - Ag) <= act_tol * (1.0 + np.abs(np.where(
            np.isfinite(hi), hi, 0.0)))
        act_lo &= np.isfinite(lo)
        act_hi &= np.isfinite(hi)
        eq = np.isfinite(lo) & np.isfinite(hi) & (hi - lo <= act_tol)
        act = act_lo | act_hi
        if not np.any(act):
            resid = np.linalg.norm(grad)
        else:
            A_act = A[act]
            mu, *_ = np.linalg.lstsq(A_act.T, -grad, rcond=None)
            lo_only = act_lo[act] & ~act_hi[act] & ~eq[act]
            hi_only = act_hi[act] & ~act_lo[act] & ~eq[act]
            mu = np.where(lo_only, np.minimum(mu, 0.0), mu)
            mu = np.where(hi_only, np.maximum(mu, 0.0), mu)
            resid = np.linalg.norm(grad + A_act.T @ mu)
        assert resid / scale <= bar, \
            f"projected-gradient residual {resid / scale:.3e} > {bar:.1e}"

    @staticmethod
    def _trust_constr(H, c, A, lo, hi, x0, maxiter=3000):
        """Second independent solver family (interior-point flavored
        trust-region SQP) — SURVEY hard-part #2 asks for a conic-grade
        oracle beyond SLSQP; trust-constr with tight tolerances is the
        strongest one available offline (cvxpy/Clarabel not installed).

        Measured limitation on the ill-scaled active sets below: it
        terminates on xtol with an objective ABOVE the ADMM solution's
        (even when warm-started AT the ADMM solution it drifts upward),
        so pointwise x-agreement at 1e-5 is not attainable from it; the
        ill-scaled tests therefore use objective domination + the KKT
        certificate instead of pointwise comparison."""
        from scipy.optimize import LinearConstraint
        res = minimize(lambda g: 0.5 * g @ H @ g - c @ g, x0,
                       jac=lambda g: H @ g - c, hess=lambda g: H,
                       method="trust-constr",
                       constraints=[LinearConstraint(A, lo, hi)],
                       options={"gtol": 1e-12, "xtol": 1e-14,
                                "maxiter": maxiter})
        assert res.status in (1, 2), res.message
        return res.x

    def _slsqp(self, H, c, A, lo, hi, x0):
        fun = lambda g: 0.5 * g @ H @ g - c @ g
        jac = lambda g: H @ g - c
        cons = [
            {"type": "ineq", "fun": lambda g: A @ g - lo,
             "jac": lambda g: A},
            {"type": "ineq", "fun": lambda g: hi - A @ g,
             "jac": lambda g: -A},
        ]
        res = minimize(fun, x0, jac=jac, constraints=cons, method="SLSQP",
                       options={"maxiter": 500, "ftol": 1e-14})
        assert res.success
        return res.x

    def test_inactive_constraints_equal_ols(self):
        s, r, n = 20, 5, 50
        Theta = RNG.standard_normal((s, r))
        y = RNG.standard_normal(s)
        A, _ = np.linalg.qr(RNG.standard_normal((n, r)))
        lo = -1e6 * np.ones(n)
        hi = 1e6 * np.ones(n)
        w = np.ones(s)
        g, info = _boxls.box_constrained_lstsq(Theta, y, w, A, lo, hi)
        g_ols = np.linalg.pinv(Theta) @ y
        np.testing.assert_allclose(np.asarray(g), g_ols, atol=1e-6)
        self._assert_kkt(Theta.T @ Theta, Theta.T @ y, A, lo, hi,
                         np.asarray(g))

    def test_active_constraints_match_slsqp(self):
        s, r, n = 15, 4, 30
        Theta = RNG.standard_normal((s, r))
        y = 3 * RNG.standard_normal(s)
        A, _ = np.linalg.qr(RNG.standard_normal((n, r)))
        lo = -0.3 * np.ones(n)
        hi = 0.3 * np.ones(n)
        w = np.ones(s)
        g, info = _boxls.box_constrained_lstsq(Theta, y, w, A, lo, hi,
                                               max_iter=20000, tol=1e-12)
        H = Theta.T @ Theta
        c = Theta.T @ y
        g_ref = self._slsqp(H, c, A, lo, hi, np.zeros(r))
        np.testing.assert_allclose(np.asarray(g), g_ref, atol=2e-5)
        self._assert_kkt(H, c, A, lo, hi, np.asarray(g))

    def test_weighted(self):
        s, r, n = 12, 3, 20
        Theta = RNG.standard_normal((s, r))
        y = RNG.standard_normal(s)
        w = RNG.random(s) + 0.5
        A, _ = np.linalg.qr(RNG.standard_normal((n, r)))
        lo, hi = -0.2 * np.ones(n), 0.2 * np.ones(n)
        g, _ = _boxls.box_constrained_lstsq(Theta, y, w, A, lo, hi,
                                            max_iter=20000, tol=1e-12)
        H = (Theta * w[:, None] ** 2).T @ Theta
        c = Theta.T @ (w ** 2 * y)
        g_ref = self._slsqp(H, c, A, lo, hi, np.zeros(r))
        np.testing.assert_allclose(np.asarray(g), g_ref, atol=2e-5)
        self._assert_kkt(H, c, A, lo, hi, np.asarray(g))

    def test_map_qp(self):
        r, n = 5, 40
        L = RNG.standard_normal((r, r))
        cov = L @ L.T + r * np.eye(r)
        mean = RNG.standard_normal(r)
        A, _ = np.linalg.qr(RNG.standard_normal((n, r)))
        lo, hi = -0.1 * np.ones(n), 0.1 * np.ones(n)
        v, _ = _boxls.box_constrained_map(mean, cov, A, lo, hi,
                                          max_iter=20000, tol=1e-12)
        H = np.linalg.inv(cov)
        g_ref = self._slsqp(H, H @ mean, A, lo, hi, np.zeros(r))
        np.testing.assert_allclose(np.asarray(v), g_ref, atol=2e-5)
        self._assert_kkt(H, H @ mean, A, lo, hi, np.asarray(v))

    def test_map_qp_equality_pins(self):
        # mixed set: box rows + equality pins (lo == hi) — the bc0_limits
        # pattern of reference gpr.py:575-578
        r, n = 4, 25
        L = RNG.standard_normal((r, r))
        cov = L @ L.T + r * np.eye(r)
        mean = RNG.standard_normal(r)
        A, _ = np.linalg.qr(RNG.standard_normal((n, r)))
        lo, hi = -0.5 * np.ones(n), 0.5 * np.ones(n)
        pin_val = 0.17
        lo[3] = hi[3] = pin_val          # equality row
        lo[7] = -np.inf                  # one-sided row
        v, _ = _boxls.box_constrained_map(mean, cov, A, lo, hi,
                                          max_iter=40000, tol=1e-12)
        v = np.asarray(v)
        np.testing.assert_allclose(A[3] @ v, pin_val, atol=1e-6)
        # SLSQP cross-check with explicit equality constraint
        H = np.linalg.inv(cov)
        fun = lambda g: 0.5 * (g - mean) @ H @ (g - mean)
        jac = lambda g: H @ (g - mean)
        ineq_rows = [i for i in range(n) if i != 3]
        Ai = A[ineq_rows]
        loi, hii = lo[ineq_rows], hi[ineq_rows]
        cons = [{"type": "eq", "fun": lambda g: A[3] @ g - pin_val,
                 "jac": lambda g: A[3]},
                {"type": "ineq",
                 "fun": lambda g: np.where(np.isfinite(loi),
                                           Ai @ g - loi, 1.0)},
                {"type": "ineq", "fun": lambda g: hii - Ai @ g}]
        res = minimize(fun, mean, jac=jac, constraints=cons, method="SLSQP",
                       options={"maxiter": 500, "ftol": 1e-14})
        assert res.success
        np.testing.assert_allclose(v, res.x, atol=5e-5)
        self._assert_kkt(H, H @ mean, A, lo, hi, v)

    def test_ill_scaled_cols_vs_trust_constr(self):
        """Reference COLS shape (s = r = 14 sensors/modes, tall constraint
        operator, sparse_sensing.py:880-892) with decade-spanning weights
        and an ill-conditioned Theta (cond(H) ~ 1e6), ~half the constraint
        rows active: ADMM must (a) carry a first-order KKT certificate and
        (b) reach an objective AT LEAST as low as the second, independent
        solver family (trust-constr) at matching feasibility (SURVEY
        hard-part #2).  Measured: trust-constr stalls on xtol ABOVE the
        ADMM objective here (Δf ≈ 2e-5 relative, persisting even when
        warm-started at the ADMM point), so objective domination + KKT is
        the honest cross-check, not pointwise x-agreement."""
        s = r = 14
        n = 120
        rng = np.random.default_rng(7)
        Ur, _ = np.linalg.qr(rng.standard_normal((n, r)))
        rows = rng.choice(n, s, replace=False)
        # column scaling -> cond(Theta) ~ 1e3, cond(H) ~ 1e6
        Theta = Ur[rows] * np.logspace(0, 3, r)[None, :]
        y = 5.0 * rng.standard_normal(s)
        w = np.logspace(-2, 2, s)
        rng.shuffle(w)
        H = (Theta * w[:, None] ** 2).T @ Theta
        c = Theta.T @ (w ** 2 * y)
        g_unc = np.linalg.lstsq(Theta * w[:, None], w * y, rcond=None)[0]
        z = Ur @ g_unc
        lo = np.quantile(z, 0.25) * np.ones(n)      # ~half the rows active
        hi = np.quantile(z, 0.75) * np.ones(n)
        g, info = _boxls.box_constrained_lstsq(
            Theta, y, w, A=jnp.asarray(Ur), lo=jnp.asarray(lo),
            hi=jnp.asarray(hi), max_iter=60000, tol=1e-13)
        g = np.asarray(g)
        self._assert_kkt(H, c, Ur, lo, hi, g)
        g_ref = self._trust_constr(H, c, Ur, lo, hi, np.zeros(r))
        f = lambda x: 0.5 * x @ H @ x - c @ x
        # objective domination over the independent solver family
        assert f(g) <= f(g_ref) + 1e-6 * abs(f(g_ref)), (f(g), f(g_ref))

    def test_ill_scaled_map_vs_trust_constr(self):
        """Constrained-GPR MAP QP (gpr.py:569-580) with posterior variances
        spanning 8 decades and an ill-scaled Ur·diag(Σ_r) operator — the
        whitened ADMM (identity Hessian) vs trust-constr on the raw QP:
        KKT certificate + objective domination (see the COLS test above
        for why pointwise agreement is not the right bar)."""
        r, n = 14, 100
        rng = np.random.default_rng(11)
        var = np.logspace(-6, 2, r)
        rng.shuffle(var)
        cov = np.diag(var)
        mean = rng.standard_normal(r)
        U0, _ = np.linalg.qr(rng.standard_normal((n, r)))
        A = U0 * np.logspace(0, 4, r)[None, :]      # Ur diag(Sigma_r) pattern
        z = A @ mean
        lo = np.quantile(z, 0.3) * np.ones(n)
        hi = np.quantile(z, 0.7) * np.ones(n)
        v, _ = _boxls.box_constrained_map(
            jnp.asarray(mean), jnp.asarray(cov), jnp.asarray(A),
            jnp.asarray(lo), jnp.asarray(hi), max_iter=60000, tol=1e-13)
        v = np.asarray(v)
        H = np.diag(1.0 / var)
        self._assert_kkt(H, H @ mean, A, lo, hi, v)
        g_ref = self._trust_constr(H, H @ mean, A, lo, hi, mean)
        f = lambda x: 0.5 * x @ H @ x - (H @ mean) @ x
        assert f(v) <= f(g_ref) + 1e-6 * abs(f(g_ref)), (f(v), f(g_ref))

    def test_concat_constraints_batched(self):
        A1 = RNG.standard_normal((6, 3))
        A2 = RNG.standard_normal((2, 3))
        vals = RNG.standard_normal((4, 2))    # batch of 4 equality values
        cs = _boxls.concat_constraints([
            _boxls.LinearConstraints(A1, -np.ones(6), np.ones(6)),
            _boxls.LinearConstraints(A2, vals, vals),
        ])
        assert cs.A.shape == (8, 3)
        assert cs.lo.shape == (4, 8) and cs.hi.shape == (4, 8)
        np.testing.assert_allclose(np.asarray(cs.lo[:, :6]), -1.0)
        np.testing.assert_allclose(np.asarray(cs.lo[:, 6:]), vals)
        np.testing.assert_allclose(np.asarray(cs.hi[:, 6:]), vals)
        with pytest.raises(ValueError, match="batch sizes"):
            _boxls.concat_constraints([
                _boxls.LinearConstraints(A1, np.zeros((3, 6)),
                                         np.ones((3, 6))),
                _boxls.LinearConstraints(A2, vals, vals)])

    def test_concat_constraints_unbatched_scalar_bounds_broadcast(self):
        A1 = RNG.standard_normal((5, 3))
        A2 = RNG.standard_normal((3, 3))
        cs = _boxls.concat_constraints([
            _boxls.LinearConstraints(A1, -1.0, 1.0),     # scalar bounds
            _boxls.LinearConstraints(A2, -np.ones(3), np.ones(3)),
        ])
        assert cs.lo.shape == (8,) and cs.hi.shape == (8,)
        np.testing.assert_allclose(np.asarray(cs.lo[:5]), -1.0)

    def test_build_constraint_set_raw_triple(self):
        """The documented raw (A, lo, hi) tuple form — including the
        ambiguous q == 3 case that previously unpacked A's ROWS as
        constructor args and built garbage constraints silently."""
        for q in (3, 5):
            A = RNG.standard_normal((q, 4))
            lo, hi = -np.ones(q), np.ones(q)
            cs, box_only = _boxls.build_constraint_set((A, lo, hi), None)
            assert cs.A.shape == (q, 4), cs.A.shape
            np.testing.assert_allclose(np.asarray(cs.A), A)
            assert not box_only
        # list-of-sets form still works (3 sets — the other ambiguity arm)
        sets = [_boxls.LinearConstraints(RNG.standard_normal((2, 4)),
                                         -np.ones(2), np.ones(2))
                for _ in range(3)]
        cs, _ = _boxls.build_constraint_set(sets, None)
        assert cs.A.shape == (6, 4)

    def test_build_constraint_set_empty_list_is_box_only(self):
        A = RNG.standard_normal((4, 2))
        cs, box_only = _boxls.build_constraint_set(
            [], (A, -np.ones(4), np.ones(4)))
        assert box_only is True and cs.A.shape == (4, 2)

    def test_admm_singular_hessian_and_thin_constraints_finite(self):
        """H rank-deficient AND AtA rank-deficient (fewer sensors than
        modes with a thin pin set): the eps-ridge keeps the factor finite
        instead of silently returning all-NaN coefficients."""
        r = 5
        Theta = RNG.standard_normal((3, r))     # 3 sensors < 5 modes
        y = RNG.standard_normal(3)
        w = np.ones(3)
        A = RNG.standard_normal((2, r))         # 2 pin rows < 5
        v = A @ RNG.standard_normal(r) * 0.1
        g, info = _boxls.box_constrained_lstsq(
            Theta, y, w, A, v, v, max_iter=500)
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(A @ g), np.asarray(v),
                                   atol=1e-4)

    def test_admm_fp32_relative_tolerance_converges(self):
        """An O(1) fp32 problem with an active box must converge in far
        fewer than max_iter iterations (the absolute 1e-9 tol alone is
        below fp32 resolution and previously burned the full budget);
        tol=0 must still run the exact fixed budget (serving contract)."""
        r = 6
        Theta = RNG.standard_normal((8, r)).astype(np.float32)
        y = (Theta @ RNG.standard_normal(r) + 2.0).astype(np.float32)
        w = np.ones(8, np.float32)
        A = np.eye(r, dtype=np.float32)
        lo, hi = -0.5 * np.ones(r, np.float32), 0.5 * np.ones(r, np.float32)
        g, info = _boxls.box_constrained_lstsq(
            Theta, y, w, A, lo, hi, max_iter=4000, tol=1e-9)
        assert np.all(np.abs(np.asarray(g)) <= 0.5 + 1e-5)
        assert int(info.iterations) < 2000, int(info.iterations)
        _, info0 = _boxls.box_constrained_lstsq(
            Theta, y, w, A, lo, hi, max_iter=300, tol=0.0)
        assert int(info0.iterations) == 300


class TestPodFit:
    def test_pod_fit_matches_rom_fit(self):
        from openmeasure_tpu.pipelines import pod_fit
        from openmeasure_tpu import ROM
        X = RNG.standard_normal((120, 9)) + 2.0
        Ur, Ar, Sigma_r, cnt, scl = pod_fit(jnp.asarray(X), 3, 4)
        rom = ROM(X, 3, np.zeros((40, 3)))
        rom.fit(select_modes="number", n_modes=4)
        np.testing.assert_allclose(np.asarray(Sigma_r),
                                   np.asarray(rom.Sigma_r), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(cnt), np.asarray(rom.X_cnt),
                                   rtol=1e-12)
        # reconstruction through either basis matches (sign-invariant)
        x1 = np.asarray(Ur @ np.asarray(Ar)[0]) * np.asarray(scl)[:, 0] \
            + np.asarray(cnt)[:, 0]
        x2 = np.asarray(rom.reconstruct(np.asarray(rom.Ar)[0]))[:, 0]
        np.testing.assert_allclose(x1, x2, rtol=1e-8, atol=1e-10)


class TestSVDRankTruncation:
    def test_rank_matches_full_path(self):
        """rank=r narrows only the final n-row products: the top-r factors
        must equal the untruncated path's to fp round-off, and S (from the
        final Gram's eigenvalues) must match the column-norm S."""
        X0 = RNG.standard_normal((300, 12))
        for refine in (0, 1, 2):
            Uf, Sf, Vtf = _svd.svd_tall(jnp.asarray(X0), refine=refine,
                                        canonicalize=False)
            Ur, Sr, Vtr = _svd.svd_tall(jnp.asarray(X0), refine=refine,
                                        canonicalize=False, rank=5)
            assert Ur.shape == (300, 5) and Sr.shape == (12,)
            np.testing.assert_allclose(np.asarray(Ur), np.asarray(Uf)[:, :5],
                                       rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(np.asarray(Sr), np.asarray(Sf),
                                       rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(np.asarray(Vtr), np.asarray(Vtf),
                                       rtol=1e-10, atol=1e-12)

    def test_rank_with_canonicalize_raises(self):
        with pytest.raises(ValueError, match="canonicalize"):
            _svd.svd_tall(jnp.zeros((10, 4)), rank=2)


class TestSVDDeflated:
    def _ill_conditioned(self, n=20000, m=20, cond=1e-5, seed=0):
        rng = np.random.default_rng(seed)
        Uq, _ = np.linalg.qr(rng.standard_normal((n, m)))
        Vq, _ = np.linalg.qr(rng.standard_normal((m, m)))
        s = np.geomspace(1.0, cond, m)
        return (Uq * s) @ Vq.T, Uq, s, Vq

    def test_deflated_recovers_deep_tail_fp32(self):
        """Modes with sigma/sigma1 near sqrt(eps_fp32): the deflated route
        must deliver per-mode-accurate tail factors in fp32 (the TPU
        failure mode this exists for; on CPU fp32 it tightens the same
        quantities)."""
        X, Ut, s, Vt_true = self._ill_conditioned()
        X32 = jnp.asarray(X, jnp.float32)
        r, k = 10, 5
        U, S, Vt = _svd.svd_tall_deflated(X32, rank=r, deflate=k)
        assert U.shape == (20000, r)
        np.testing.assert_allclose(np.asarray(S[:r], np.float64), s[:r],
                                   rtol=1e-3)
        # per-mode subspace accuracy: |<u_i, u_true_i>| ~ 1 for every mode
        dots = np.abs(np.einsum("ni,ni->i", np.asarray(U, np.float64),
                                Ut[:, :r]))
        assert dots.min() > 0.99, dots
        # orthonormal across the block seam
        G = np.asarray(U, np.float64).T @ np.asarray(U, np.float64)
        np.testing.assert_allclose(G, np.eye(r), atol=5e-3)
        # right factors match too (up to sign)
        vdots = np.abs(np.diagonal(
            np.asarray(Vt, np.float64)[:r] @ Vt_true[:, :r]))
        assert vdots.min() > 0.99, vdots

    def test_deflate_zero_is_plain_path(self):
        X = RNG.standard_normal((300, 12))
        U0, S0, Vt0 = _svd.svd_tall(jnp.asarray(X), canonicalize=False,
                                    rank=5)
        U1, S1, Vt1 = _svd.svd_tall_deflated(jnp.asarray(X), rank=5,
                                             deflate=0)
        np.testing.assert_array_equal(np.asarray(U0), np.asarray(U1))
        np.testing.assert_array_equal(np.asarray(S0), np.asarray(S1))
        np.testing.assert_array_equal(np.asarray(Vt0), np.asarray(Vt1))

    def test_reconstruction_matches_lapack(self):
        """U S Vt over the deflated blocks reproduces the represented
        rank-r matrix to fp32 round-off."""
        X, _, s, _ = self._ill_conditioned(n=5000, m=16, cond=1e-4)
        r, k = 12, 6
        U, S, Vt = _svd.svd_tall_deflated(jnp.asarray(X, jnp.float32),
                                          rank=r, deflate=k)
        Xr = (np.asarray(U, np.float64) * np.asarray(S, np.float64)[:r]) \
            @ np.asarray(Vt, np.float64)[:r]
        U64, S64, Vt64 = np.linalg.svd(X, full_matrices=False)
        X_true = (U64[:, :r] * S64[:r]) @ Vt64[:r]
        np.testing.assert_allclose(Xr, X_true, atol=5e-6 * s[0])


class TestSVDWidthRefine:
    def test_width_refine_accuracy(self):
        """Width-limited refine (rank <= width < m): top-r factors must stay
        within the full-width refine's accuracy envelope vs f64 LAPACK
        (measured: width=2r matches full width; width=r degrades 2x — the
        guard columns absorb the first Gram's mode-mixing leakage)."""
        rng = np.random.default_rng(1)
        n, m, r = 4000, 24, 8
        U0, _ = np.linalg.qr(rng.standard_normal((n, m)))
        V0, _ = np.linalg.qr(rng.standard_normal((m, m)))
        s = np.logspace(1, -3, m)
        X = (U0 * s[None, :]) @ V0.T
        Uref = np.linalg.svd(X, full_matrices=False)[0][:, :r]
        X32 = jnp.asarray(X, jnp.float32)

        def err(U):
            U = np.asarray(U, np.float64)
            sgn = np.sign((U * Uref).sum(0))
            return np.linalg.norm(U * sgn[None, :] - Uref)

        e_full = err(_svd.svd_tall(X32, refine=2, canonicalize=False,
                                   rank=r)[0])
        e_w = err(_svd.svd_tall(X32, refine=2, canonicalize=False,
                                rank=r, width=2 * r)[0])
        assert e_w <= 2.0 * e_full + 1e-6, (e_w, e_full)

    def test_width_validation(self):
        X = jnp.asarray(np.random.default_rng(0).standard_normal((50, 10)),
                        jnp.float32)
        with pytest.raises(ValueError):
            _svd.svd_tall(X, canonicalize=False, width=8)   # width w/o rank
        with pytest.raises(ValueError):
            _svd.svd_tall(X, canonicalize=False, rank=6, width=4)  # w < r
        # width == m is the full path
        U, S, Vt = _svd.svd_tall(X, canonicalize=False, rank=4, width=10)
        assert U.shape == (50, 4)

    def test_width_singular_values_tail(self):
        """S beyond the refine width keeps the first Gram's estimates; the
        leading values are refined + column-norm-exact — explained-variance
        truncation must still see a full-length, descending S."""
        rng = np.random.default_rng(3)
        X = rng.standard_normal((500, 12))
        S = np.asarray(_svd.svd_tall(jnp.asarray(X), refine=1,
                                     canonicalize=False, rank=4,
                                     width=8)[1])
        Sn = np.linalg.svd(X, compute_uv=False)
        assert S.shape == (12,)
        np.testing.assert_allclose(S, Sn, rtol=1e-5)
        assert np.all(np.diff(S) <= 1e-10)


class TestCholInvLogdet:
    """CPU surface of linalg/chol_pallas: the jnp fallback must equal the
    scipy formulation, and the custom_vmap wrapper must route a vmapped
    batch through the batched implementation unchanged (on CPU the Pallas
    kernel never dispatches — backend-gated)."""

    def _spd(self, B, p, seed=0):
        rng = np.random.default_rng(seed)
        Q = rng.standard_normal((B, p, p))
        return np.einsum("bij,bkj->bik", Q, Q) / p + 0.5 * np.eye(p)[None]

    def test_jnp_matches_scipy(self):
        from openmeasure_tpu.linalg import chol_pallas as CP
        Kn = self._spd(6, 13)
        kinv, ld = CP.chol_inv_logdet_jnp(jnp.asarray(Kn))
        for b in range(6):
            np.testing.assert_allclose(np.asarray(kinv[b]),
                                       np.linalg.inv(Kn[b]), rtol=1e-9,
                                       atol=1e-11)
            np.testing.assert_allclose(float(ld[b]),
                                       np.linalg.slogdet(Kn[b])[1],
                                       rtol=1e-12)

    def test_custom_vmap_routes_batch(self):
        import jax
        from openmeasure_tpu.linalg import chol_pallas as CP
        Kn = jnp.asarray(self._spd(5, 9, seed=1))
        kinv_v, ld_v = jax.vmap(CP.chol_inv_logdet)(Kn)
        kinv_b, ld_b = CP.chol_inv_logdet_auto(Kn)
        np.testing.assert_array_equal(np.asarray(kinv_v),
                                      np.asarray(kinv_b))
        np.testing.assert_array_equal(np.asarray(ld_v), np.asarray(ld_b))
        # unbatched call agrees with the batched slice
        kinv_1, ld_1 = CP.chol_inv_logdet(Kn[2])
        np.testing.assert_allclose(np.asarray(kinv_1),
                                   np.asarray(kinv_b[2]), rtol=1e-12)


class TestFixedRhoFastPath:
    """adapt_rho=False (round 5): the fixed-rho fast path for fixed-budget
    serving — hoisted factorization, normless loop body at tol=0.  Must
    reach the same optimum as the adaptive schedule on well-scaled
    problems (the serving workload shape)."""

    def test_fixed_rho_matches_adaptive_optimum(self):
        s, r, n = 15, 4, 30
        Theta = RNG.standard_normal((s, r))
        y = 3 * RNG.standard_normal(s)
        A, _ = np.linalg.qr(RNG.standard_normal((n, r)))
        lo = -0.3 * np.ones(n)
        hi = 0.3 * np.ones(n)
        w = np.ones(s)
        g_ref, _ = _boxls.box_constrained_lstsq(
            Theta, y, w, A, lo, hi, max_iter=20000, tol=1e-12)
        g_fix, info = _boxls.box_constrained_lstsq(
            Theta, y, w, A, lo, hi, max_iter=20000, tol=1e-12,
            adapt_rho=False)
        np.testing.assert_allclose(np.asarray(g_fix), np.asarray(g_ref),
                                   atol=2e-5)
        # tol>0 still early-stops on the fixed-rho path
        assert int(info.iterations) < 20000

    def test_fixed_budget_normless_body(self):
        """tol=0 + adapt_rho=False: full budget runs, diagnostics come
        from the one post-loop residual pass (dual residual is NaN by
        contract — no z_{k-1} is retained)."""
        s, r, n = 10, 3, 20
        Theta = RNG.standard_normal((s, r))
        y = RNG.standard_normal(s)
        A, _ = np.linalg.qr(RNG.standard_normal((n, r)))
        lo, hi = -0.5 * np.ones(n), 0.5 * np.ones(n)
        g, info = _boxls.box_constrained_lstsq(
            Theta, y, np.ones(s), A, lo, hi, max_iter=400, tol=0.0,
            adapt_rho=False)
        assert int(info.iterations) == 400
        assert np.isfinite(float(info.primal_residual))
        assert np.isnan(float(info.dual_residual))
        g_ref, _ = _boxls.box_constrained_lstsq(
            Theta, y, np.ones(s), A, lo, hi, max_iter=20000, tol=1e-12)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=5e-4)

    def test_serving_knob_plumbing(self):
        """SoftSensor(admm_rho='fixed') serves the same model to the
        solver-reproducibility level of the adaptive sensor (both are
        converged fixed-budget solves of the same QP)."""
        from openmeasure_tpu import SPR
        from openmeasure_tpu.datasets.synthetic import make_flame_dataset
        from openmeasure_tpu.serving import SoftSensor
        import pytest as _pytest
        data = make_flame_dataset(n_cells=40)
        spr = SPR(data["X_train"].astype(np.float32), data["n_features"],
                  data["xyz"])
        spr.fit(select_modes="number", n_modes=5)
        C = np.asarray(spr.optimal_placement())
        npts = data["xyz"].shape[0]
        Xb = data["X_train"].reshape(data["n_features"], npts, -1)
        lo = Xb.min(axis=(1, 2)) - 0.1
        hi = Xb.max(axis=(1, 2)) + 0.1
        spr.train(C, method="COLS", limits=[lo, hi])
        s_ad = SoftSensor.from_spr(spr)
        s_fx = SoftSensor.from_spr(spr, admm_rho="fixed")
        rows = np.argmax(C, axis=1)
        Y = np.asarray(data["X_test"], np.float32)[rows].T
        f1, a1, _ = s_ad.predict_batch(Y)
        f2, a2, _ = s_fx.predict_batch(Y)
        sc = float(np.abs(np.asarray(f1)).max())
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                                   atol=2e-3 * sc)
        with _pytest.raises(ValueError, match="admm_rho"):
            SoftSensor.from_spr(spr, admm_rho="bogus")
