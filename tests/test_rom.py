"""ROM conformance tests — mirrors the reference tier-1 suite
(tests/test_rom.py in the reference) with exact numpy cross-checks."""

import numpy as np
import pytest

from openmeasure_tpu import ROM


class TestROM:
    def setup_method(self, method):
        rng = np.random.default_rng(7)
        self.n_points = 10
        self.n_features = 2
        self.m = 5
        self.X = rng.random((self.n_points * self.n_features, self.m))
        self.xyz = rng.random((self.n_points, 3))
        self.rom = ROM(self.X, self.n_features, self.xyz)

    def test_validation(self):
        with pytest.raises(TypeError):
            ROM([[1.0]], self.n_features, self.xyz)
        with pytest.raises(TypeError):
            ROM(self.X, 2.0, self.xyz)
        with pytest.raises(Exception):
            ROM(self.X[:-1], 3, self.xyz)

    def test_centering_axis_one(self):
        self.rom.scale_data()
        np.testing.assert_allclose(
            self.rom.X_cnt, np.mean(self.X, axis=1)[:, None], rtol=1e-12)

    def test_centering_axis_none(self):
        self.rom.scale_data(axis_cnt=None)
        X_cnt = np.zeros((self.X.shape[0], 1))
        for i in range(self.n_features):
            X_cnt[i * self.n_points:(i + 1) * self.n_points] = np.mean(
                self.X[i * self.n_points:(i + 1) * self.n_points])
        np.testing.assert_allclose(self.rom.X_cnt, X_cnt, rtol=1e-12)

    def test_scaling(self):
        self.rom.scale_data()
        X_scl = np.zeros((self.X.shape[0], 1))
        for i in range(self.n_features):
            X_scl[i * self.n_points:(i + 1) * self.n_points] = np.std(
                self.X[i * self.n_points:(i + 1) * self.n_points])
        np.testing.assert_allclose(self.rom.X_scl, X_scl, rtol=1e-12)

    def test_decomposition_svd(self):
        X0 = np.asarray(self.rom.scale_data())
        U, Sigma, Vt = np.linalg.svd(X0, full_matrices=False)
        A = np.dot(np.diag(Sigma), Vt).T
        Ur, Ar, ev = self.rom.decomposition(X0, n_modes=100)
        # per-mode sign-invariant comparison; skip degenerate (≈0) modes —
        # row-centering makes rank ≤ m-1, so the last singular vector is an
        # arbitrary null-space direction in any SVD implementation.
        n_sig = int(np.sum(Sigma > 1e-10 * Sigma[0]))
        for k in range(n_sig):
            sgn = np.sign(np.dot(np.asarray(Ur[:, k]), U[:, k]))
            np.testing.assert_allclose(np.asarray(Ur[:, k]) * sgn, U[:, k],
                                       atol=1e-9)
            np.testing.assert_allclose(np.asarray(Ar[:, k]) * sgn, A[:, k],
                                       atol=1e-9)
        L = Sigma ** 2
        np.testing.assert_allclose(ev, 100 * np.cumsum(L) / L.sum(),
                                   rtol=1e-9)

    def test_reduction_number(self):
        X0 = self.rom.scale_data()
        self.rom.decomposition(X0, select_modes="number", n_modes=self.m - 1)
        assert self.rom.r == self.m - 1

    def test_reduction_variance(self):
        X0 = self.rom.scale_data()
        self.rom.decomposition(X0, select_modes="variance", n_modes=100)
        assert self.rom.r == self.m

    def test_fit(self):
        X0 = np.asarray(self.rom.scale_data())
        _, Sigma, Vt = np.linalg.svd(X0, full_matrices=False)
        V = Vt.T
        self.rom.fit(n_modes=100)
        n_sig = int(np.sum(Sigma > 1e-10 * Sigma[0]))
        np.testing.assert_allclose(self.rom.Sigma_r[:n_sig], Sigma[:n_sig],
                                   rtol=1e-9)
        for k in range(n_sig):
            sgn = np.sign(np.dot(np.asarray(self.rom.Vr[:, k]), V[:, k]))
            np.testing.assert_allclose(np.asarray(self.rom.Vr[:, k]) * sgn,
                                       V[:, k], atol=1e-9)

    def test_unscaling(self):
        X0 = self.rom.scale_data()
        self.rom.fit(n_modes=100)
        np.testing.assert_allclose(
            self.rom.unscale_data(np.asarray(X0)[:, 0]), self.X[:, 0],
            rtol=1e-9)

    def test_reconstruction(self):
        self.rom.fit(n_modes=100)
        x_rec = self.rom.reconstruct(np.asarray(self.rom.Ar)[0, :])
        np.testing.assert_allclose(x_rec, self.X[:, [0]], rtol=1e-8,
                                   atol=1e-10)

    def test_reconstruction_with_sampling(self):
        self.rom.fit(n_modes=100)
        s = 6
        C = np.zeros((s, self.X.shape[0]))
        C[np.arange(s), np.arange(0, 3 * s, 3)] = 1.0
        x_rec = self.rom.reconstruct(np.asarray(self.rom.Ar)[0, :],
                                     sampling=C)
        np.testing.assert_allclose(x_rec, C @ self.X[:, [0]], rtol=1e-8,
                                   atol=1e-10)

    def test_fit_with_basis_passthrough(self):
        self.rom.fit(n_modes=100)
        Ur, Ar = self.rom.Ur, self.rom.Ar
        rom2 = ROM(self.X, self.n_features, self.xyz)
        rom2.fit(basis=(Ur, Ar))
        np.testing.assert_allclose(rom2.Ur, Ur)
        np.testing.assert_allclose(rom2.Sigma_r, self.rom.Sigma_r)

    def test_cpod_inactive_limits_is_identity(self):
        self.rom.fit(select_modes="number", n_modes=3)
        Ar_before = np.asarray(self.rom.Ar).copy()
        limits = [np.array([-1e8, -1e8]), np.array([1e8, 1e8])]
        self.rom.CPOD(limits=limits)
        # With inactive box constraints, CPOD minimizes ||Ur g - x0|| whose
        # solution is the POD projection g = Ur^T x0 = Ar row.
        np.testing.assert_allclose(np.asarray(self.rom.Ar), Ar_before,
                                   atol=1e-6)

    def test_single_snapshot_fit_is_finite(self):
        """m=1: per-row centering makes X0 exactly zero; the fit must stay
        finite like the reference's LAPACK SVD does (svd_tall's tiny
        absolute normalization floor)."""
        rng = np.random.default_rng(3)
        X1 = rng.standard_normal((self.rom.X.shape[0], 1))
        rom = ROM(X1, self.rom.n_features, self.rom.xyz)
        rom.fit(scale_type="std", select_modes="number", n_modes=1)
        assert np.isfinite(np.asarray(rom.Ur)).all()
        assert np.isfinite(np.asarray(rom.Ar)).all()

    def test_scale_limits_scalar_broadcast_and_validation(self):
        """Scalar min/max broadcast to every feature (documented convenience
        beyond the reference); a wrong-sized vector raises a clear error."""
        self.rom.fit(select_modes="number", n_modes=3)
        lo_s, hi_s = self.rom.scale_limits([0.2, 0.8])
        lo_v, hi_v = self.rom.scale_limits(
            [np.array([0.2, 0.2]), np.array([0.8, 0.8])])
        np.testing.assert_allclose(np.asarray(lo_s), np.asarray(lo_v))
        np.testing.assert_allclose(np.asarray(hi_s), np.asarray(hi_v))
        with pytest.raises(ValueError, match="n_features"):
            self.rom.scale_limits([np.zeros(3), np.ones(3)])

    def test_cpod_respects_limits(self):
        self.rom.fit(select_modes="number", n_modes=3)
        limits = [np.array([0.2, 0.2]), np.array([0.8, 0.8])]
        self.rom.CPOD(limits=limits)
        lo, hi = self.rom.scale_limits(limits)
        recon0 = np.asarray(self.rom.Ur @ np.asarray(self.rom.Ar)[0])
        assert np.all(recon0 >= np.asarray(lo) - 1e-5)
        assert np.all(recon0 <= np.asarray(hi) + 1e-5)

    def test_cpod_mixed_equality_box_constraints(self):
        """General constraint set on device (reference's caller-built CVXPY
        problems, sparse_sensing.py:434-461): box on every row PLUS a
        per-snapshot equality pin, all m snapshots in one vmapped program."""
        from scipy.optimize import minimize
        from openmeasure_tpu.linalg import boxls as _boxls
        self.rom.fit(select_modes="number", n_modes=3)
        Ur = np.asarray(self.rom.Ur)
        X0 = np.asarray(self.rom.X0)
        n, m = X0.shape
        pin_row = 4
        pins = X0[pin_row, :] * 0.5          # per-snapshot equality values
        # box wide enough that the mixed problem is feasible for every
        # snapshot (a tight box + equality pin can be jointly infeasible
        # in a 3-dim coefficient space)
        box = 2.0
        cs = [
            _boxls.LinearConstraints(Ur, -box * np.ones(n),
                                     box * np.ones(n)),
            _boxls.LinearConstraints(Ur[pin_row][None, :],
                                     pins[:, None], pins[:, None]),
        ]
        self.rom.CPOD(constraints=cs, max_iter=20000, tol=1e-12)
        G = np.asarray(self.rom.Ar)          # (m, r)
        for i in range(m):
            # equality pin holds
            np.testing.assert_allclose(Ur[pin_row] @ G[i], pins[i],
                                       atol=1e-6)
            # matches an SLSQP solve of the same problem
            fun = lambda g: 0.5 * np.sum((Ur @ g - X0[:, i]) ** 2)
            jac = lambda g: Ur.T @ (Ur @ g - X0[:, i])
            cons = [{"type": "ineq", "fun": lambda g: Ur @ g + box},
                    {"type": "ineq", "fun": lambda g: box - Ur @ g},
                    {"type": "eq",
                     "fun": lambda g, i=i: Ur[pin_row] @ g - pins[i]}]
            res = minimize(fun, G[i], jac=jac, constraints=cons,
                           method="SLSQP",
                           options={"maxiter": 500, "ftol": 1e-14})
            assert fun(G[i]) <= res.fun + 1e-8 * max(1.0, abs(res.fun))

    def test_cpod_limits_and_constraints_compose(self):
        """`limits` is NOT dropped when `constraints` is also given: both
        stack into one set (same semantics as GPR.predict)."""
        from openmeasure_tpu.linalg import boxls as _boxls
        self.rom.fit(select_modes="number", n_modes=3)
        Ur = np.asarray(self.rom.Ur)
        pin_row = 4
        limits = [np.array([0.2, 0.2]), np.array([0.8, 0.8])]
        lo, hi = map(np.asarray, self.rom.scale_limits(limits))
        # pin each snapshot to its box-only CPOD value at pin_row: the
        # stacked problem is then guaranteed feasible (a tight box plus an
        # arbitrary pin can be jointly infeasible in a 3-dim space)
        self.rom.CPOD(limits=limits, max_iter=20000, tol=1e-12)
        pins = Ur[pin_row] @ np.asarray(self.rom.Ar).T
        cs = _boxls.LinearConstraints(Ur[pin_row][None, :],
                                      pins[:, None], pins[:, None])
        self.rom.CPOD(limits=limits, constraints=cs,
                      max_iter=20000, tol=1e-12)
        G = np.asarray(self.rom.Ar)
        for i in range(G.shape[0]):
            np.testing.assert_allclose(Ur[pin_row] @ G[i], pins[i],
                                       atol=1e-5)
            recon = Ur @ G[i]
            # the box from `limits` still holds (it would not, were limits
            # silently dropped when constraints is also given)
            assert np.all(recon >= lo - 1e-4)
            assert np.all(recon <= hi + 1e-4)

    def test_adaptive_sampling_shapes(self):
        rng = np.random.default_rng(3)
        P = rng.random((self.m, 2))
        s = self.rom.adaptive_sampling(P, seed=0)
        assert s.shape == (2,)
        assert np.all(s >= P.min(axis=0)) and np.all(s <= P.max(axis=0))

    def test_reconstruction_with_sparse_and_bcoo_sampling(self):
        import scipy.sparse as sp
        from jax.experimental import sparse as jsparse
        self.rom.fit(n_modes=100)
        s = 5
        C = np.zeros((s, self.X.shape[0]))
        C[np.arange(s), np.arange(0, 2 * s, 2)] = 1.0
        expect = C @ self.X[:, [0]]
        a0 = np.asarray(self.rom.Ar)[0, :]

        x_sp = np.asarray(self.rom.reconstruct(a0, sampling=sp.csr_matrix(C)))
        np.testing.assert_allclose(x_sp, expect, rtol=1e-8, atol=1e-10)

        import jax.numpy as jnp
        C_bcoo = jsparse.BCOO.fromdense(jnp.asarray(C))
        x_bc = np.asarray(self.rom.reconstruct(a0, sampling=C_bcoo))
        np.testing.assert_allclose(x_bc, expect, rtol=1e-8, atol=1e-10)
