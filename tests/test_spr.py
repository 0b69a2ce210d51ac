"""SPR conformance tests — mirrors the reference tier-1 suite
(tests/test_spr.py) plus COLS/GEM coverage the reference only exercises in
its notebook/plot tier."""

import numpy as np
import jax.numpy as jnp
import pytest

from openmeasure_tpu import SPR


class TestSPR:
    def setup_method(self, method):
        rng = np.random.default_rng(11)
        self.n_points = 10
        self.n_features = 2
        self.m = 5
        self.X = rng.random((self.n_points * self.n_features, self.m))
        self.xyz = rng.random((self.n_points, 3))
        self.C = np.eye(self.X.shape[0])
        self.spr = SPR(self.X, self.n_features, self.xyz)

    def _identity_y(self, col=0):
        y = np.zeros((self.C.shape[0], 3))
        y[:, 0] = self.C @ self.X[:, col]
        for i in range(self.n_features):
            y[i * self.n_points:(i + 1) * self.n_points, 2] = i
        return y

    def test_optimal_placement_qr(self):
        self.spr.fit(n_modes=100)
        C_qr = np.asarray(self.spr.optimal_placement())
        assert C_qr.shape == (self.m, self.X.shape[0])
        # each row is one-hot
        np.testing.assert_array_equal(C_qr.sum(axis=1), np.ones(self.m))

    def test_qr_placement_matches_scipy(self):
        import scipy.linalg as la
        self.spr.fit(n_modes=100)
        C_qr = np.asarray(self.spr.optimal_placement())
        _, _, P = la.qr(np.asarray(self.spr.Ur).T, pivoting=True,
                        mode="economic")
        np.testing.assert_array_equal(np.argmax(C_qr, axis=1),
                                      P[:self.spr.r])

    def test_scale_vector(self):
        X_cnt = np.mean(self.X, axis=1)[:, None]
        X_scl = np.zeros((self.X.shape[0], 1))
        for i in range(self.n_features):
            X_scl[i * self.n_points:(i + 1) * self.n_points] = np.std(
                self.X[i * self.n_points:(i + 1) * self.n_points])

        self.spr.fit(n_modes=100)
        self.spr.train(self.C)
        y = self._identity_y()
        y0 = self.spr.scale_vector(y)

        y0_check = np.zeros((self.C.shape[0], 2))
        y0_check[:, 0] = (y[:, 0] - X_cnt[:, 0]) / X_scl[:, 0]
        np.testing.assert_allclose(y0, y0_check, rtol=1e-10, atol=1e-12)

    def test_predict_identity_reconstructs_training_column(self):
        self.spr.fit(n_modes=100)
        self.spr.train(self.C)
        a, sig = self.spr.predict(self._identity_y())
        x_pred = self.spr.reconstruct(a)
        np.testing.assert_allclose(x_pred, self.X[:, [0]], rtol=1e-7,
                                   atol=1e-9)
        np.testing.assert_array_equal(np.asarray(sig), 0.0)

    def test_predict_list_batches(self):
        self.spr.fit(n_modes=100)
        self.spr.train(self.C)
        ys = [self._identity_y(0), self._identity_y(1)]
        a, _ = self.spr.predict(ys)
        assert a.shape == (2, self.spr.r)
        x_pred = self.spr.reconstruct(a)
        np.testing.assert_allclose(x_pred, self.X[:, [0, 1]], rtol=1e-7,
                                   atol=1e-9)

    def test_predict_weighted_sigma(self):
        self.spr.fit(n_modes=100)
        self.spr.train(self.C)
        y = self._identity_y()
        y[:, 1] = 0.5
        a, sig = self.spr.predict(y)
        # reference: y0 sigma = 0.5/scl; W = diag(1/sigma0);
        # ar_sigma = |pinv(W Theta) @ sigma0|
        y0 = self.spr.scale_vector(y)
        W = np.diag(1.0 / y0[:, 1])
        Theta = np.asarray(self.spr.Theta)
        pinv = np.linalg.pinv(W @ Theta)
        np.testing.assert_allclose(np.asarray(a[0]),
                                   pinv @ (W @ y0[:, 0]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(sig[0]),
                                   np.abs(pinv @ y0[:, 1]), atol=1e-8)

    def test_cols_matches_ols_when_inactive(self):
        self.spr.fit(n_modes=100)
        limits = [np.array([-1e7, -1e7]), np.array([1e7, 1e7])]
        self.spr.train(self.C, method="COLS", limits=limits)
        a_cols, _ = self.spr.predict(self._identity_y())
        self.spr.train(self.C, method="OLS")
        a_ols, _ = self.spr.predict(self._identity_y())
        np.testing.assert_allclose(np.asarray(a_cols), np.asarray(a_ols),
                                   atol=1e-5)

    def test_cols_enforces_limits(self):
        self.spr.fit(n_modes=100)
        limits = [np.array([0.25, 0.25]), np.array([0.75, 0.75])]
        self.spr.train(self.C, method="COLS", limits=limits)
        y = self._identity_y()
        a, _ = self.spr.predict(y)
        x = np.asarray(self.spr.reconstruct(a))[:, 0]
        lo = np.concatenate([np.full(self.n_points, 0.25),
                             np.full(self.n_points, 0.25)])
        hi = np.concatenate([np.full(self.n_points, 0.75),
                             np.full(self.n_points, 0.75)])
        assert np.all(x >= lo - 1e-4)
        assert np.all(x <= hi + 1e-4)

    def test_gem_placement(self):
        self.spr.fit(n_modes=100)
        C = np.asarray(self.spr.optimal_placement(calc_type="gem",
                                                  n_sensors=4))
        assert C.shape == (4, self.X.shape[0])
        np.testing.assert_array_equal(C.sum(axis=1), np.ones(4))
        # sensors are distinct
        assert len(set(np.argmax(C, axis=1))) == 4

    def test_gem_d_min_respected(self):
        self.spr.fit(n_modes=100)
        d_min = 0.3
        C = np.asarray(self.spr.optimal_placement(calc_type="gem",
                                                  n_sensors=3, d_min=d_min))
        idx = np.argmax(C, axis=1)
        xyz_t = np.tile(self.xyz, (self.n_features, 1))
        pos = xyz_t[idx]
        for i in range(len(idx)):
            for j in range(i + 1, len(idx)):
                assert np.linalg.norm(pos[i] - pos[j]) >= d_min

    def test_gem_mask(self):
        self.spr.fit(n_modes=100)
        mask = np.zeros(self.X.shape[0], dtype=bool)
        mask[:7] = True
        C = np.asarray(self.spr.optimal_placement(calc_type="gem",
                                                  n_sensors=3, mask=mask))
        assert np.all(np.argmax(C, axis=1) < 7)

    def test_train_validation_and_cond(self):
        self.spr.fit(n_modes=100)
        with pytest.raises(ValueError):
            self.spr.train(np.eye(3))
        self.spr.train(self.C, cond=True)
        assert self.spr.k >= 1.0

    def test_sparse_C(self):
        import scipy.sparse as sp
        self.spr.fit(n_modes=100)
        C_sp = sp.csr_matrix(self.C)
        self.spr.train(C_sp)
        a, _ = self.spr.predict(self._identity_y())
        x_pred = self.spr.reconstruct(a)
        np.testing.assert_allclose(x_pred, self.X[:, [0]], rtol=1e-7,
                                   atol=1e-9)

    def test_fit_predict_convenience(self):
        spr = SPR(self.X, self.n_features, self.xyz)
        a, sig = spr.fit_predict(self.C, self._identity_y(),
                                 select_modes="number", n_modes=5)
        x_pred = spr.reconstruct(a)
        np.testing.assert_allclose(x_pred, self.X[:, [0]], rtol=1e-7,
                                   atol=1e-9)

    def test_dg_placement_matches_qrcp_up_to_rank(self):
        self.spr.fit(n_modes=100)
        C_dg = np.asarray(self.spr.optimal_placement(calc_type="dg",
                                                     n_sensors=self.spr.r))
        C_qr = np.asarray(self.spr.optimal_placement())
        np.testing.assert_array_equal(np.argmax(C_dg, axis=1),
                                      np.argmax(C_qr, axis=1))

    def test_dg_oversampling_beyond_rank(self):
        self.spr.fit(select_modes="number", n_modes=3)
        s = 8  # more sensors than modes — QRCP cannot do this
        C = np.asarray(self.spr.optimal_placement(calc_type="dg",
                                                  n_sensors=s))
        idx = np.argmax(C, axis=1)
        assert len(set(idx.tolist())) == s
        # D-optimality improves monotonically: det(Theta^T Theta) grows
        Ur = np.asarray(self.spr.Ur)
        dets = [np.linalg.det(Ur[idx[:k]].T @ Ur[idx[:k]])
                for k in range(3, s + 1)]
        assert all(d2 >= d1 - 1e-12 for d1, d2 in zip(dets, dets[1:]))
        # and the greedy choice beats random augmentation on average
        rng = np.random.default_rng(0)
        rand_dets = []
        for _ in range(20):
            rest = rng.choice(np.setdiff1d(np.arange(20), idx[:3]), s - 3,
                              replace=False)
            sel = np.concatenate([idx[:3], rest])
            rand_dets.append(np.linalg.det(Ur[sel].T @ Ur[sel]))
        assert dets[-1] >= np.mean(rand_dets)

    def test_dg_mask(self):
        self.spr.fit(select_modes="number", n_modes=3)
        mask = np.zeros(self.X.shape[0], dtype=bool)
        mask[:8] = True
        C = np.asarray(self.spr.optimal_placement(calc_type="dg",
                                                  n_sensors=5, mask=mask))
        assert np.all(np.argmax(C, axis=1) < 8)

    def test_dg_oversampled_reconstruction_beats_exact(self):
        # with noisy measurements, 2x sensors (dg) should not be worse
        rng = np.random.default_rng(3)
        self.spr.fit(select_modes="number", n_modes=3)
        for n_s in (3, 6):
            C = np.asarray(self.spr.optimal_placement(calc_type="dg",
                                                      n_sensors=n_s))
            self.spr.train(C)
            rows = np.argmax(C, axis=1)
            y = np.zeros((n_s, 3))
            y[:, 0] = self.X[rows, 0]
            y[:, 2] = rows // self.n_points
            a, _ = self.spr.predict(y)
            x = np.asarray(self.spr.reconstruct(a))[:, 0]
            assert np.all(np.isfinite(x))

    def test_bcoo_sparse_C(self):
        from jax.experimental import sparse as jsparse
        self.spr.fit(n_modes=100)
        C_bcoo = jsparse.BCOO.fromdense(jnp.asarray(self.C))
        self.spr.train(C_bcoo)
        a, _ = self.spr.predict(self._identity_y())
        x_pred = self.spr.reconstruct(a)
        np.testing.assert_allclose(x_pred, self.X[:, [0]], rtol=1e-7,
                                   atol=1e-9)

    def test_dg_exhaustion_raises(self):
        self.spr.fit(select_modes="number", n_modes=3)
        mask = np.zeros(self.X.shape[0], dtype=bool)
        mask[:5] = True
        with pytest.raises(ValueError, match="ran out of candidates"):
            self.spr.optimal_placement(calc_type="dg", n_sensors=8,
                                       mask=mask)

    def test_cols_general_constraints_with_per_vector_pins(self):
        """COLS with a stacked constraint set: wide box + per-measurement-
        vector equality pins (batched bounds), solved on device."""
        from openmeasure_tpu.linalg import boxls as _boxls
        self.spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(self.spr.optimal_placement())
        Ur = np.asarray(self.spr.Ur)
        n = Ur.shape[0]
        rows = np.argmax(C, axis=1)
        ys = []
        for col in (0, 2):
            y = np.zeros((len(rows), 3))
            y[:, 0] = self.X[rows, col]
            y[:, 2] = rows // self.n_points
            ys.append(y)
        # pin the scaled reconstruction at state row 6 to per-vector values
        X0 = np.asarray(self.spr.X0)
        pin_vals = np.array([X0[6, 0], X0[6, 2]]) * 0.5   # (n_vec,)
        cs = [
            _boxls.LinearConstraints(Ur, -5.0 * np.ones(n), 5.0 * np.ones(n)),
            _boxls.LinearConstraints(Ur[6][None, :], pin_vals[:, None],
                                     pin_vals[:, None]),
        ]
        self.spr.train(C, method="COLS", constraints=cs,
                       admm_max_iter=20000, admm_tol=1e-12)
        a, _ = self.spr.predict(ys)
        a = np.asarray(a)
        for v in range(2):
            np.testing.assert_allclose(Ur[6] @ a[v], pin_vals[v], atol=1e-6)

    def test_masked_placement_then_cols_solves_masked_problem(self):
        """Regression for the AtA=I assumption: after a masked placement
        zeroes Ur rows destructively, COLS must solve the QP with the
        actual (non-identity) Ur Gram.

        Limits are chosen so the scaled box contains 0 for every row (the
        zeroed rows force Ur@g = 0 there — tighter limits would make the
        problem infeasible, in the reference's CVXPY formulation too), and
        the measurements are amplified so the box is ACTIVE on live rows.
        """
        from scipy.optimize import minimize
        self.spr.fit(select_modes="number", n_modes=3)
        mask = np.ones(self.X.shape[0], dtype=bool)
        mask[12:] = False
        C = np.asarray(self.spr.optimal_placement(mask=mask))
        limits = [np.array([-0.5, -0.5]), np.array([1.2, 1.2])]
        self.spr.train(C, method="COLS", limits=limits)

        rows = np.argmax(C, axis=1)
        y = np.zeros((len(rows), 3))
        y[:, 0] = 3.0 * self.X[rows, 0]   # overshoot -> active constraints
        y[:, 2] = rows // self.n_points
        a, _ = self.spr.predict(y)

        Ur = np.asarray(self.spr.Ur)           # masked (zeroed) basis
        Theta = np.asarray(self.spr.Theta)
        y0 = self.spr.scale_vector(y)[:, 0]
        lo, hi = map(np.asarray, self.spr.scale_limits(limits))
        H = Theta.T @ Theta
        c = Theta.T @ y0
        obj = lambda g: 0.5 * g @ H @ g - c @ g
        a0 = np.asarray(a)[0]
        # feasibility of our solution under the masked basis
        assert np.all(Ur @ a0 >= lo - 1e-5) and np.all(Ur @ a0 <= hi + 1e-5)
        # constraints genuinely active (not an OLS-equivalent test)
        assert np.any(np.isclose(Ur @ a0, hi, atol=1e-4)) or \
            np.any(np.isclose(Ur @ a0, lo, atol=1e-4))
        # optimality: SLSQP warm-started AT our solution cannot improve it
        cons = [{"type": "ineq", "fun": lambda g: Ur @ g - lo},
                {"type": "ineq", "fun": lambda g: hi - Ur @ g}]
        res = minimize(obj, a0, jac=lambda g: H @ g - c, constraints=cons,
                       method="SLSQP", options={"maxiter": 500,
                                                "ftol": 1e-14})
        assert obj(a0) <= res.fun + 1e-7 * max(1.0, abs(res.fun))



class TestVectorPlacement:
    """Vector-measurement greedy selection (beyond-reference;
    sensing/vector.py, Saito et al. arXiv:1906.00778)."""

    def setup_method(self, method):
        rng = np.random.default_rng(17)
        self.n_points = 12
        self.n_features = 2
        self.m = 5
        self.X = rng.random((self.n_points * self.n_features, self.m))
        self.xyz = rng.random((self.n_points, 3))
        self.spr = SPR(self.X, self.n_features, self.xyz)

    def test_scalar_case_reduces_to_dg(self):
        """With p=1 a vector sensor IS a scalar sensor: the regularized
        greedy must reproduce the det-greedy (== QRCP pivot) selection."""
        from openmeasure_tpu.sensing.vector import vector_dg_select
        from openmeasure_tpu.sensing.dg import dg_select
        rng = np.random.default_rng(4)
        Ur = np.linalg.qr(rng.standard_normal((30, 6)))[0]
        sel_v = vector_dg_select(Ur, 1, 6)
        sel_dg = dg_select(Ur, 6)
        np.testing.assert_array_equal(sel_v, sel_dg)

    def test_greedy_is_stepwise_optimal(self):
        """Every greedy pick maximizes the regularized D-optimality
        increment logdet(I_p + U_j W U_jᵀ) over the alive candidates —
        verified against a brute-force numpy recomputation."""
        from openmeasure_tpu.sensing.vector import vector_dg_select
        rng = np.random.default_rng(5)
        p, n_pts, r = 3, 15, 7
        Ur = rng.standard_normal((p * n_pts, r))
        sel = vector_dg_select(Ur, p, 6)

        blocks = Ur.reshape(p, n_pts, r).transpose(1, 0, 2)
        energy = np.mean(np.sum(blocks ** 2, axis=(1, 2))) / p
        delta = 1e-6 * energy
        G = delta * np.eye(r)
        alive = np.ones(n_pts, bool)
        for s_idx in sel:
            W = np.linalg.inv(G)
            scores = np.array([
                np.linalg.slogdet(np.eye(p) + blocks[j] @ W @ blocks[j].T)[1]
                if alive[j] else -np.inf for j in range(n_pts)])
            assert scores[s_idx] >= scores.max() - 1e-9 * abs(scores.max())
            G = G + blocks[s_idx].T @ blocks[s_idx]
            alive[s_idx] = False

    def test_vdg_fp32_long_run_stays_finite_and_matches_f64(self):
        """Regression (TPU decoder-example failure): the Woodbury-downdated
        W carry went indefinite in float32 within 3 steps at flame scale
        (NaN Cholesky scores -> spurious exhaustion error).  The Gram-
        accumulation formulation must survive a LONG fp32 run — scores
        finite, points distinct — and agree with the float64 selection."""
        from openmeasure_tpu.sensing.vector import vector_dg_select
        rng = np.random.default_rng(11)
        p, n_pts, r = 9, 2000, 14
        # flame-like: smooth orthonormalized basis with p feature blocks
        t = np.linspace(0, 1, n_pts)
        cols = [np.sin((k + 1) * np.pi * t + 0.3 * f)
                for f in range(p) for k in range(2)][:r]
        base = np.stack(cols, axis=1)
        Ur = np.linalg.qr(np.tile(base, (p, 1))
                          + 0.01 * rng.standard_normal((p * n_pts, r)))[0]
        sel32 = vector_dg_select(Ur.astype(np.float32), p, 12)
        sel64 = vector_dg_select(Ur.astype(np.float64), p, 12)
        assert len(set(sel32.tolist())) == 12
        # near-ties may flip picks between dtypes; what must hold is the
        # D-optimality QUALITY: the fp32 selection, scored in f64, reaches
        # the f64 selection's objective
        blocks = Ur.reshape(p, n_pts, r).transpose(1, 0, 2)

        def objective(sel):
            G = 1e-12 * np.eye(r)
            for j in sel:
                G += blocks[j].T @ blocks[j]
            return np.linalg.slogdet(G)[1]

        o32, o64 = objective(sel32), objective(sel64)
        assert o32 >= o64 - 0.05 * abs(o64)

    def test_spr_vdg_end_to_end(self):
        """vdg placement -> train -> OLS predict reconstructs a training
        snapshot exactly once s·p >= r (full-rank X, r = m)."""
        from openmeasure_tpu.sensing.vector import vector_feature_ids
        self.spr.fit(n_modes=100)            # r = m = 5
        n_s = 3                              # 3 probes x 2 features = 6 >= 5
        C = np.asarray(self.spr.optimal_placement(calc_type="vdg",
                                                  n_sensors=n_s))
        assert C.shape == (n_s * self.n_features, self.X.shape[0])
        np.testing.assert_array_equal(C.sum(axis=1), np.ones(C.shape[0]))
        rows = np.argmax(C, axis=1)
        # sensor-major row order: row s*p+f is feature f at sensor point s
        pts = np.asarray(self.spr.sensor_points)
        expect_rows = (np.repeat(pts, self.n_features)
                       + np.tile(np.arange(self.n_features),
                                 n_s) * self.n_points)
        np.testing.assert_array_equal(rows, expect_rows)
        self.spr.train(C)
        y = np.zeros((len(rows), 3))
        y[:, 0] = self.X[rows, 0]
        y[:, 2] = vector_feature_ids(n_s, self.n_features)
        a, _ = self.spr.predict(y)
        x_pred = self.spr.reconstruct(a)
        np.testing.assert_allclose(x_pred, self.X[:, [0]], rtol=1e-6,
                                   atol=1e-8)

    def test_vdg_mask_point_and_row_forms(self):
        self.spr.fit(select_modes="number", n_modes=3)
        mask_pts = np.zeros(self.n_points, dtype=bool)
        mask_pts[:6] = True
        C = np.asarray(self.spr.optimal_placement(calc_type="vdg",
                                                  n_sensors=4,
                                                  mask=mask_pts))
        assert np.all(np.asarray(self.spr.sensor_points) < 6)
        # row-length mask: a point is selectable only if all its rows are
        mask_rows = np.ones(self.X.shape[0], dtype=bool)
        mask_rows[self.n_points + 3] = False     # kill feature-1 row of pt 3
        self.spr.optimal_placement(calc_type="vdg", n_sensors=4,
                                   mask=mask_rows)
        assert 3 not in np.asarray(self.spr.sensor_points).tolist()
        # the basis is NOT zeroed by vdg masking (documented deviation)
        assert not np.any(np.asarray(self.spr.Ur) == 0.0)

    def test_vdg_d_min_enforced(self):
        """Probes must honor a minimum inter-probe distance (the GEM
        contract) and raise when d_min exhausts the candidates."""
        self.spr.fit(select_modes="number", n_modes=3)
        self.spr.optimal_placement(calc_type="vdg", n_sensors=3,
                                   d_min=0.25)
        pts = np.asarray(self.spr.sensor_points)
        xyz = np.asarray(self.xyz)
        for a in range(3):
            for b in range(a + 1, 3):
                assert np.linalg.norm(xyz[pts[a]] - xyz[pts[b]]) >= 0.25
        # a d_min that empties the pool raises the exhaustion error
        with pytest.raises(ValueError, match="ran out of candidates"):
            self.spr.optimal_placement(calc_type="vdg", n_sensors=6,
                                       d_min=10.0)

    def test_vdg_mid_run_exhaustion_without_duplicate_raises(self):
        """Regression: exhaustion on the FIRST dead step picks argmax-of-
        -inf = index 0, which is not a duplicate — the -inf step score must
        still raise (and never return points violating d_min/mask)."""
        from openmeasure_tpu.sensing.vector import vector_dg_select
        rng = np.random.default_rng(7)
        Ur = rng.standard_normal((8, 3))          # p=2, 4 points
        xyz = 0.05 * rng.random((4, 3))           # all within 0.1
        with pytest.raises(ValueError, match="ran out of candidates"):
            vector_dg_select(Ur, 2, 2, xyz=xyz, d_min=5.0)
        mask = np.array([False, True, True, True])
        with pytest.raises(ValueError, match="ran out of candidates"):
            vector_dg_select(Ur, 2, 2, mask=mask, xyz=xyz, d_min=5.0)

    def test_vdg_exhaustion_raises(self):
        self.spr.fit(select_modes="number", n_modes=3)
        mask = np.zeros(self.n_points, dtype=bool)
        mask[:2] = True
        with pytest.raises(ValueError, match="ran out of candidates"):
            self.spr.optimal_placement(calc_type="vdg", n_sensors=5,
                                       mask=mask)

    def test_vdg_beats_random_location_sets(self):
        """D-optimality sanity: greedy det(ΘᵀΘ) is at least the mean of
        random same-size location sets."""
        from openmeasure_tpu.sensing.vector import vector_dg_select
        rng = np.random.default_rng(6)
        p, n_pts, r = 2, 20, 6
        Ur = rng.standard_normal((p * n_pts, r))
        blocks = Ur.reshape(p, n_pts, r).transpose(1, 0, 2)
        n_s = 4

        def logdet_of(points):
            Th = np.concatenate([blocks[j] for j in points])
            return np.linalg.slogdet(Th.T @ Th)[1]

        sel = vector_dg_select(Ur, p, n_s)
        ld_greedy = logdet_of(sel)
        ld_rand = [logdet_of(rng.choice(n_pts, n_s, replace=False))
                   for _ in range(50)]
        assert ld_greedy >= np.mean(ld_rand)


class TestADMMDiagnostics:
    def test_predict_exposes_solver_info(self):
        import numpy as np
        from openmeasure_tpu import SPR
        rng = np.random.default_rng(30)
        X = rng.random((30, 6))
        spr = SPR(X, 2, rng.random((15, 3)))
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement())
        spr.train(C, method="COLS",
                  limits=[np.array([-2.0, -2.0]), np.array([3.0, 3.0])])
        rows = np.argmax(C, axis=1)
        y = np.zeros((3, 3))
        y[:, 0] = X[rows, 0]
        y[:, 2] = rows // 15
        spr.predict(y)
        info = spr.admm_info
        assert info.primal_residual.shape == (1,)
        assert float(info.primal_residual[0]) < 1e-6   # feasible: converges

    def test_infeasible_limits_flagged_by_residual(self):
        """Physical limits that exclude the data leave a large primal
        residual after the full budget — the documented infeasibility
        signal."""
        import numpy as np
        from openmeasure_tpu import SPR
        rng = np.random.default_rng(31)
        X = 5.0 + rng.random((30, 6))           # data lives near +5
        spr = SPR(X, 2, rng.random((15, 3)))
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement())
        # upper limit excludes the data in scaled space for both features
        spr.train(C, method="COLS",
                  limits=[np.array([-100.0, -100.0]),
                          np.array([-50.0, -50.0])],
                  admm_max_iter=500)
        rows = np.argmax(C, axis=1)
        y = np.zeros((3, 3))
        y[:, 0] = X[rows, 0]
        y[:, 2] = rows // 15
        spr.predict(y)
        assert float(spr.admm_info.primal_residual[0]) > 1e-3


class TestRefitCacheInvalidation:
    def test_refit_invalidates_measurement_centering_cache(self):
        """A refit with a different scale type changes X_cnt/X_scl; the
        cached C @ X_cnt from the earlier train() must not survive it."""
        import numpy as np
        from openmeasure_tpu import SPR
        rng = np.random.default_rng(17)
        X = rng.random((30, 6)) + 1.0
        spr = SPR(X, 2, rng.random((15, 3)))
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)
        rows = np.argmax(C, axis=1)
        y = np.zeros((3, 3))
        y[:, 0] = X[rows, 1]
        y[:, 2] = rows // 15

        spr.fit(scale_type="pareto", select_modes="number", n_modes=3)
        spr.train(C)
        y0 = spr.scale_vector(y)
        cnt_expected = C @ np.asarray(spr.X_cnt)[:, 0]
        scl_expected = np.asarray(spr.X_scl)[rows, 0]
        np.testing.assert_allclose(
            np.asarray(y0)[:, 0], (y[:, 0] - cnt_expected) / scl_expected,
            rtol=1e-12)
