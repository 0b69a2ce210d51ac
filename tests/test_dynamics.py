"""Dynamics tier: DMD spectral analysis + reduced-order Kalman filtering.

Beyond-reference capability (the reference has no temporal model,
``sparse_sensing.py:806-895`` solves each frame independently), so the
oracles here are external/analytic: hand-built linear systems with known
spectra, an independent textbook numpy DMD / Kalman filter written inline,
and scipy's discrete Riccati/Lyapunov solvers.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openmeasure_tpu.dynamics import (DMD, fit_reduced_operator,
                                      estimate_process_noise,
                                      stationary_covariance, kalman_filter,
                                      kalman_smoother)
from openmeasure_tpu.utils.metrics import nrmse


def _oscillatory_series(n_points=40, n_features=2, m=40, thetas=(3, 5),
                        seed=0):
    """Real snapshot series driven by pure rotations at FULL periods over
    the m samples (theta_j = 2*pi*k_j/m), so the row time-mean is exactly
    zero and the house centering does not perturb the linear recurrence."""
    rng = np.random.default_rng(seed)
    n = n_points * n_features
    r_true = 2 * len(thetas)
    L, _ = np.linalg.qr(rng.standard_normal((n, r_true)))
    L *= rng.uniform(1.0, 3.0, size=(1, r_true))  # unequal mode energies
    blocks, lams = [], []
    for k in thetas:
        th = 2.0 * np.pi * k / m
        blocks.append(np.array([[np.cos(th), -np.sin(th)],
                                [np.sin(th), np.cos(th)]]))
        lams.extend([np.exp(1j * th), np.exp(-1j * th)])
    A_z = np.zeros((r_true, r_true))
    for j, B in enumerate(blocks):
        A_z[2 * j:2 * j + 2, 2 * j:2 * j + 2] = B
    z0 = rng.standard_normal(r_true)
    Z = np.empty((m, r_true))
    Z[0] = z0
    for k in range(1, m):
        Z[k] = A_z @ Z[k - 1]
    X = L @ Z.T                                       # (n, m)
    return X, np.array(sorted(lams, key=lambda c: (c.real, c.imag))), L, A_z, Z


def _sorted_eigs(lam):
    return np.array(sorted(lam, key=lambda c: (round(c.real, 9),
                                               round(c.imag, 9))))


class TestDMDAnalytic:
    """Known-spectrum recovery on exactly-linear, exactly-zero-mean data."""

    def setup_method(self):
        self.X, self.lams, self.L, self.A_z, self.Z = _oscillatory_series()
        xyz = np.zeros((40, 3))
        self.dmd = DMD(self.X, 2, xyz)
        self.dmd.fit(dt=0.5, scale_type="none", select_modes="number",
                     n_modes=4)

    def test_eigenvalues_exact(self):
        got = _sorted_eigs(self.dmd.eigs)
        np.testing.assert_allclose(got, _sorted_eigs(self.lams),
                                   atol=1e-8)

    def test_continuous_spectrum(self):
        # omega = log(lam)/dt: pure oscillations -> zero growth rate,
        # frequencies theta/(2*pi*dt)
        np.testing.assert_allclose(self.dmd.growth_rates, 0.0, atol=1e-8)
        freqs = np.sort(np.abs(self.dmd.frequencies))
        th = np.array([2 * np.pi * 3 / 40, 2 * np.pi * 3 / 40,
                       2 * np.pi * 5 / 40, 2 * np.pi * 5 / 40])
        np.testing.assert_allclose(freqs,
                                   np.sort(th / (2 * np.pi * 0.5)),
                                   atol=1e-9)

    def test_reconstruction_exact(self):
        X_hat = np.asarray(self.dmd.reconstruct_dmd())
        assert float(nrmse(jnp.asarray(X_hat), jnp.asarray(self.X))) < 1e-8

    def test_forecast_matches_analytic_continuation(self):
        q = 7
        Zf = np.empty((q, self.Z.shape[1]))
        z = self.Z[-1]
        for k in range(q):
            z = self.A_z @ z
            Zf[k] = z
        X_true = self.L @ Zf.T
        X_hat = np.asarray(self.dmd.forecast_horizon(q))
        np.testing.assert_allclose(X_hat, X_true, atol=1e-7)

    def test_exact_modes_are_lambda_scaled_projected(self):
        # for data exactly in the rank-r span, Phi_exact = Phi_proj @ Lam
        Pe = self.dmd.modes(exact=True)
        Pp = self.dmd.modes(exact=False) * self.dmd.eigs[None, :]
        np.testing.assert_allclose(Pe, Pp, atol=1e-8)

    def test_forecast_validation(self):
        with pytest.raises(ValueError):
            self.dmd.forecast(np.zeros((2, 2)))
        fresh = DMD(self.X, 2, np.zeros((40, 3)))
        with pytest.raises(AttributeError):
            fresh.forecast([0])

    def test_update_basis_disabled(self):
        with pytest.raises(NotImplementedError):
            self.dmd.update_basis(self.X[:, :2])


class TestDMDGuards:
    def _series(self, rank=2, n=60, m=20, seed=0):
        rng = np.random.default_rng(seed)
        U = np.linalg.qr(rng.standard_normal((n, rank)))[0]
        lam = np.array([0.9, 0.7])[:rank]
        a = rng.standard_normal(rank)
        A = np.stack([a * lam ** k for k in range(m)], axis=1)
        return U @ A + 5.0

    def test_rank_overrun_clamped_with_warning(self):
        """Requesting modes beyond the series' numerical rank must clamp
        (inverting noise-floor singular values previously fabricated a
        garbage spectrum with spurious GROWING modes, silently)."""
        from openmeasure_tpu.dynamics.dmd import DMD
        X = self._series()
        dmd = DMD(X, 1, None)
        with pytest.warns(UserWarning, match="rank clamped"):
            dmd.fit(select_modes="number", n_modes=5, scale_type="none",
                    axis_cnt=None)
        assert dmd.r <= 3
        # the true decaying spectrum survives (plus the legitimate
        # lambda~1 constant mode the centering residual contributes);
        # nothing spurious GROWS
        mags = np.sort(np.abs(dmd.eigs))[::-1]
        assert mags[0] < 1.0 + 1e-6
        for lam_true in (0.9, 0.7):
            assert np.min(np.abs(mags - lam_true)) < 1e-6, (mags, lam_true)

    def test_dt_and_fractional_index_validation(self):
        from openmeasure_tpu.dynamics.dmd import DMD
        X = self._series()
        dmd = DMD(X, 1, None)
        with pytest.raises(ValueError, match="dt must be"):
            dmd.fit(dt=0.0)
        dmd.fit(select_modes="number", n_modes=2, scale_type="none",
                axis_cnt=None)
        with pytest.raises(ValueError, match="integers"):
            dmd.forecast([0.5])
        # house post-fit contract
        assert dmd.Vr.shape == (19, dmd.r)

    def test_checkpoint_roundtrip(self, tmp_path):
        """DMD persistence: the spectral state survives the round trip and
        the restored model forecasts identically (previously save
        succeeded but load raised 'unknown checkpointed class')."""
        from openmeasure_tpu.dynamics.dmd import DMD
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        X = self._series()
        dmd = DMD(X, 1, None)
        dmd.fit(select_modes="number", n_modes=2, dt=0.5)
        p = str(tmp_path / "dmd.npz")
        save_model(dmd, p)
        loaded = load_model(p)
        np.testing.assert_allclose(loaded.eigs, dmd.eigs, atol=1e-12)
        np.testing.assert_allclose(np.asarray(loaded.forecast_horizon(3)),
                                   np.asarray(dmd.forecast_horizon(3)),
                                   atol=1e-8)
        np.testing.assert_allclose(loaded.frequencies, dmd.frequencies,
                                   atol=1e-12)


class TestDMDOracle:
    """Differential vs an independent textbook numpy DMD on the SAME scaled
    snapshots (covers centered/scaled paths where the analytic construction
    above would not stay strictly linear)."""

    def _numpy_dmd(self, X0, r):
        X1, X2 = X0[:, :-1], X0[:, 1:]
        U, S, Vt = np.linalg.svd(X1, full_matrices=False)
        Ur, Sr, Vrt = U[:, :r], S[:r], Vt[:r]
        A_t = Ur.T @ X2 @ Vrt.T @ np.diag(1.0 / Sr)
        lam, W = np.linalg.eig(A_t)
        b = np.linalg.lstsq(W, (Ur.T @ X0[:, 0]).astype(complex),
                            rcond=None)[0]
        m = X0.shape[1]
        T = b[:, None] * lam[:, None] ** np.arange(m)[None, :]
        X0_hat = np.real(Ur @ (W @ T))
        return _sorted_eigs(lam), X0_hat

    def test_random_data_matches_numpy(self):
        rng = np.random.default_rng(3)
        X = rng.standard_normal((60, 21)) @ np.diag(
            np.linspace(2.0, 0.1, 21))
        dmd = DMD(X, 3, np.zeros((20, 3)))
        dmd.fit(scale_type="std", select_modes="number", n_modes=8)
        assert dmd.r == 8
        eigs_o, X0_hat_o = self._numpy_dmd(np.asarray(dmd.X0, np.float64), 8)
        np.testing.assert_allclose(_sorted_eigs(dmd.eigs), eigs_o,
                                   atol=1e-8)
        # unscale the oracle's reconstruction through the house stats
        X_hat_o = X0_hat_o * np.asarray(dmd.X_scl) + np.asarray(dmd.X_cnt)
        X_hat = np.asarray(dmd.reconstruct_dmd(exact=False))
        np.testing.assert_allclose(X_hat, X_hat_o, atol=1e-7)

    def test_variance_rank_selection(self):
        rng = np.random.default_rng(4)
        X = rng.standard_normal((60, 21))
        dmd = DMD(X, 3, np.zeros((20, 3)))
        dmd.fit(select_modes="variance", n_modes=99)
        assert 1 <= dmd.r <= 20
        assert dmd.Ar.shape == (21, dmd.r)

    def test_needs_two_snapshots(self):
        dmd = DMD(np.ones((6, 1)), 2, np.zeros((3, 3)))
        with pytest.raises(ValueError):
            dmd.fit()


class TestReducedOperator:
    def test_exact_recovery_on_linear_coefficients(self):
        rng = np.random.default_rng(5)
        r = 5
        A_true = 0.9 * np.linalg.qr(rng.standard_normal((r, r)))[0]
        Ar = np.empty((30, r))
        Ar[0] = rng.standard_normal(r)
        for k in range(1, 30):
            Ar[k] = A_true @ Ar[k - 1]
        A = fit_reduced_operator(Ar)
        np.testing.assert_allclose(A, A_true, atol=1e-9)

    def test_ridge_shrinks_toward_stability(self):
        rng = np.random.default_rng(6)
        Ar = rng.standard_normal((12, 3))
        A0 = fit_reduced_operator(Ar)
        A1 = fit_reduced_operator(Ar, ridge=1e-2)
        assert not np.allclose(A0, A1)
        # ridge normal equations: (G + lam*tr(G)/r I) A^T = Y1^T Y2
        Y1, Y2 = Ar[:-1], Ar[1:]
        G = Y1.T @ Y1
        G_reg = G + 1e-2 * np.trace(G) / 3 * np.eye(3)
        np.testing.assert_allclose(A1, np.linalg.solve(G_reg,
                                                       Y1.T @ Y2).T,
                                   atol=1e-12)

    def test_validation(self):
        with pytest.raises(ValueError):
            fit_reduced_operator(np.ones((1, 3)))

    def test_process_noise_matches_residual_covariance(self):
        rng = np.random.default_rng(7)
        Ar = rng.standard_normal((40, 4))
        A = fit_reduced_operator(Ar)
        Q = estimate_process_noise(A, Ar, floor_rel=0.0)
        E = Ar[1:] - Ar[:-1] @ A.T
        np.testing.assert_allclose(Q, E.T @ E / (E.shape[0] - 1),
                                   atol=1e-12)
        Qf = estimate_process_noise(A, Ar, floor_rel=1e-3)
        assert np.all(np.diag(Qf) > np.diag(Q))


class TestStationaryCovariance:
    def test_solves_discrete_lyapunov(self):
        rng = np.random.default_rng(8)
        A = 0.8 * np.linalg.qr(rng.standard_normal((4, 4)))[0]
        Q = np.eye(4) * 0.1 + 0.01
        P = stationary_covariance(A, Q)
        np.testing.assert_allclose(P, A @ P @ A.T + Q, atol=1e-10)

    def test_unstable_fallback(self):
        A = np.diag([1.1, 0.5])
        Q = np.eye(2)
        np.testing.assert_allclose(stationary_covariance(A, Q), 10 * Q)


def _numpy_kf(A, Q, H, a0, P0, Y0, R_diag):
    """Independent textbook filter (covariance form, NOT Joseph)."""
    a, P = a0.copy(), P0.copy()
    means, variances = [], []
    for y, rd in zip(Y0, R_diag):
        a = A @ a
        P = A @ P @ A.T + Q
        S = H @ P @ H.T + np.diag(rd)
        K = P @ H.T @ np.linalg.inv(S)
        a = a + K @ (y - H @ a)
        P = P - K @ S @ K.T
        means.append(a.copy())
        variances.append(np.diag(P).copy())
    return np.array(means), np.array(variances), (a, P)


class TestKalmanFilter:
    def setup_method(self):
        rng = np.random.default_rng(9)
        self.r, self.s, self.K = 4, 6, 25
        self.A = 0.9 * np.linalg.qr(rng.standard_normal((self.r,) * 2))[0]
        M = rng.standard_normal((self.r, self.r))
        self.Q = 0.05 * (M @ M.T) + 0.01 * np.eye(self.r)
        self.H = rng.standard_normal((self.s, self.r))
        self.a0 = rng.standard_normal(self.r)
        self.P0 = np.eye(self.r)
        self.Y0 = rng.standard_normal((self.K, self.s))
        self.R = np.full((self.K, self.s), 0.04)

    def test_matches_numpy_reference(self):
        means_o, var_o, (aK_o, PK_o) = _numpy_kf(
            self.A, self.Q, self.H, self.a0, self.P0, self.Y0, self.R)
        means, var, (aK, PK) = kalman_filter(
            *[jnp.asarray(v) for v in
              (self.A, self.Q, self.H, self.a0, self.P0, self.Y0, self.R)])
        np.testing.assert_allclose(np.asarray(means), means_o, atol=1e-9)
        np.testing.assert_allclose(np.asarray(var), var_o, atol=1e-9)
        np.testing.assert_allclose(np.asarray(aK), aK_o, atol=1e-9)
        np.testing.assert_allclose(np.asarray(PK), PK_o, atol=1e-9)

    def test_steady_state_matches_riccati(self):
        from scipy.linalg import solve_discrete_are
        K = 400
        Y0 = np.zeros((K, self.s))
        R = np.full((K, self.s), 0.04)
        _, _, (aK, PK) = kalman_filter(
            *[jnp.asarray(v) for v in
              (self.A, self.Q, self.H, self.a0, self.P0, Y0, R)])
        # DARE gives the stationary PREDICTED covariance
        P_pred = self.A @ np.asarray(PK) @ self.A.T + self.Q
        P_dare = solve_discrete_are(self.A.T, self.H.T, self.Q,
                                    np.diag(np.full(self.s, 0.04)))
        np.testing.assert_allclose(P_pred, P_dare, atol=1e-8)

    def test_covariance_stays_spd(self):
        _, var, (_, PK) = kalman_filter(
            *[jnp.asarray(v) for v in
              (self.A, self.Q, self.H, self.a0, self.P0, self.Y0, self.R)])
        assert np.all(np.asarray(var) > 0)
        w = np.linalg.eigvalsh(np.asarray(PK))
        assert np.all(w > 0)


def _numpy_rts(A, Q, H, a0, P0, Y0, R_diag):
    """Independent textbook RTS smoother (covariance form, explicit
    inverses — nothing shared with the jax implementation)."""
    a, P = a0.copy(), P0.copy()
    m_f, P_f, m_p, P_p = [], [], [], []
    for y, rd in zip(Y0, R_diag):
        a_p = A @ a
        Pp = A @ P @ A.T + Q
        S = H @ Pp @ H.T + np.diag(rd)
        K = Pp @ H.T @ np.linalg.inv(S)
        a = a_p + K @ (y - H @ a_p)
        P = Pp - K @ S @ K.T
        m_f.append(a.copy()); P_f.append(P.copy())
        m_p.append(a_p.copy()); P_p.append(Pp.copy())
    n_steps = len(Y0)
    a_s = [None] * n_steps
    P_s = [None] * n_steps
    a_s[-1], P_s[-1] = m_f[-1], P_f[-1]
    for k in range(n_steps - 2, -1, -1):
        G = P_f[k] @ A.T @ np.linalg.inv(P_p[k + 1])
        a_s[k] = m_f[k] + G @ (a_s[k + 1] - m_p[k + 1])
        P_s[k] = P_f[k] + G @ (P_s[k + 1] - P_p[k + 1]) @ G.T
    return np.array(a_s), np.array([np.diag(P) for P in P_s])


class TestKalmanSmoother:
    def setup_method(self):
        rng = np.random.default_rng(17)
        self.r, self.s, self.K = 4, 6, 30
        self.A = 0.9 * np.linalg.qr(rng.standard_normal((self.r,) * 2))[0]
        M = rng.standard_normal((self.r, self.r))
        self.Q = 0.05 * (M @ M.T) + 0.01 * np.eye(self.r)
        self.H = rng.standard_normal((self.s, self.r))
        self.a0 = rng.standard_normal(self.r)
        self.P0 = np.eye(self.r)
        self.Y0 = rng.standard_normal((self.K, self.s))
        self.R = np.full((self.K, self.s), 0.04)

    def _args(self, Y0=None, R=None):
        return [jnp.asarray(v) for v in
                (self.A, self.Q, self.H, self.a0, self.P0,
                 self.Y0 if Y0 is None else Y0,
                 self.R if R is None else R)]

    def test_matches_numpy_rts(self):
        sm_o, var_o = _numpy_rts(self.A, self.Q, self.H, self.a0, self.P0,
                                 self.Y0, self.R)
        sm, var, _ = kalman_smoother(*self._args())
        np.testing.assert_allclose(np.asarray(sm), sm_o, atol=1e-9)
        np.testing.assert_allclose(np.asarray(var), var_o, atol=1e-9)

    def test_carry_is_forward_filter_state(self):
        _, _, (aK_f, PK_f) = kalman_filter(*self._args())
        sm, _, (aK_s, PK_s) = kalman_smoother(*self._args())
        np.testing.assert_allclose(np.asarray(aK_s), np.asarray(aK_f),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(PK_s), np.asarray(PK_f),
                                   atol=1e-12)
        # ... and the LAST smoothed mean is the last filtered mean
        np.testing.assert_allclose(np.asarray(sm[-1]), np.asarray(aK_f),
                                   atol=1e-12)

    def test_single_frame_series_degenerates_to_filter(self):
        f, vf, _ = kalman_filter(*self._args(self.Y0[:1], self.R[:1]))
        sm, vs, _ = kalman_smoother(*self._args(self.Y0[:1], self.R[:1]))
        np.testing.assert_allclose(np.asarray(sm), np.asarray(f),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vf),
                                   atol=1e-12)

    def test_smoother_beats_filter_on_state_estimation(self):
        # simulate the EXACT linear-Gaussian model the filter assumes;
        # conditioning on the whole series must reduce the mean estimation
        # error (and never inflate the reported variance)
        rng = np.random.default_rng(3)
        Lq = np.linalg.cholesky(self.Q)
        a = self.a0.copy()
        truth, Y = [], []
        for _ in range(self.K):
            a = self.A @ a + Lq @ rng.standard_normal(self.r)
            truth.append(a.copy())
            Y.append(self.H @ a + 0.2 * rng.standard_normal(self.s))
        truth = np.array(truth)
        Y = np.array(Y)
        R = np.full((self.K, self.s), 0.04)
        f, vf, _ = kalman_filter(*self._args(Y, R))
        sm, vs, _ = kalman_smoother(*self._args(Y, R))
        err_f = np.mean(np.square(np.asarray(f) - truth))
        err_s = np.mean(np.square(np.asarray(sm) - truth))
        assert err_s < err_f, (err_s, err_f)
        assert np.all(np.asarray(vs) <= np.asarray(vf) + 1e-12)


class TestInnovationGating:
    """gate=g rejects entries whose innovation exceeds g predicted std
    devs (zero gain, like a missing reading); gate=None is bit-identical
    to the ungated filter."""

    def setup_method(self):
        rng = np.random.default_rng(23)
        self.r, self.s, self.K = 4, 6, 30
        self.A = 0.9 * np.linalg.qr(rng.standard_normal((self.r,) * 2))[0]
        M = rng.standard_normal((self.r, self.r))
        self.Q = 0.05 * (M @ M.T) + 0.01 * np.eye(self.r)
        self.H = rng.standard_normal((self.s, self.r))
        self.a0 = rng.standard_normal(self.r)
        self.P0 = np.eye(self.r)
        # exact linear-Gaussian simulation
        Lq = np.linalg.cholesky(self.Q)
        a = self.a0.copy()
        truth, Y = [], []
        for _ in range(self.K):
            a = self.A @ a + Lq @ rng.standard_normal(self.r)
            truth.append(a.copy())
            Y.append(self.H @ a + 0.2 * rng.standard_normal(self.s))
        self.truth = np.array(truth)
        self.Y = np.array(Y)
        self.R = np.full((self.K, self.s), 0.04)

    def _run(self, Y, gate, smoother=False):
        fn = kalman_smoother if smoother else kalman_filter
        return fn(*[jnp.asarray(v) for v in
                    (self.A, self.Q, self.H, self.a0, self.P0, Y, self.R)],
                  gate=gate, return_rejected=True)

    def test_disabled_gate_is_bit_identical(self):
        means0, var0, (aK0, _) = kalman_filter(
            *[jnp.asarray(v) for v in
              (self.A, self.Q, self.H, self.a0, self.P0, self.Y, self.R)])
        means1, var1, (aK1, _), rej = self._run(self.Y, None)
        assert not bool(jnp.any(rej))
        np.testing.assert_array_equal(np.asarray(means1),
                                      np.asarray(means0))
        np.testing.assert_array_equal(np.asarray(var1), np.asarray(var0))
        np.testing.assert_array_equal(np.asarray(aK1), np.asarray(aK0))

    def test_gate_rejects_gross_outlier(self):
        Y_bad = self.Y.copy()
        Y_bad[12, 2] += 50.0                       # stuck-sensor spike
        m_clean, _, _, _ = self._run(self.Y, 4.0)
        m_gated, _, _, rej = self._run(Y_bad, 4.0)
        m_open, _, _, _ = self._run(Y_bad, None)
        rej = np.asarray(rej)
        assert rej[12, 2]                          # the spike is caught
        assert rej.sum() <= 3                      # ~no false rejections
        e_gated = np.mean(np.square(np.asarray(m_gated) - self.truth))
        e_clean = np.mean(np.square(np.asarray(m_clean) - self.truth))
        e_open = np.mean(np.square(np.asarray(m_open) - self.truth))
        assert e_gated < 1.1 * e_clean, (e_gated, e_clean)
        assert e_open > 2.0 * e_gated, (e_open, e_gated)

    def test_gate_applies_to_smoother_forward_pass(self):
        Y_bad = self.Y.copy()
        Y_bad[12, 2] += 50.0
        s_gated, _, _, rej = self._run(Y_bad, 4.0, smoother=True)
        s_open, _, _, _ = self._run(Y_bad, None, smoother=True)
        assert np.asarray(rej)[12, 2]
        e_gated = np.mean(np.square(np.asarray(s_gated) - self.truth))
        e_open = np.mean(np.square(np.asarray(s_open) - self.truth))
        assert e_open > 2.0 * e_gated, (e_open, e_gated)


def _timeseries_dataset(seed=11, n_points=75, n_features=2, m=60, K=40,
                        noise=0.0):
    """Flame-like time series: oscillatory + slowly decaying reduced
    dynamics lifted to n dimensions, with optional process noise.  Returns
    (X_train (n, m), X_test (n, K)) where the test series continues the
    training trajectory."""
    rng = np.random.default_rng(seed)
    n = n_points * n_features
    r_true = 6
    L, _ = np.linalg.qr(rng.standard_normal((n, r_true)))
    L *= np.array([[3.0, 3.0, 1.5, 1.5, 0.8, 0.8]])
    th1, th2, th3 = 0.35, 0.12, 0.58
    def rot(th, rho):
        return rho * np.array([[np.cos(th), -np.sin(th)],
                               [np.sin(th), np.cos(th)]])
    A_z = np.zeros((r_true, r_true))
    A_z[0:2, 0:2] = rot(th1, 0.995)
    A_z[2:4, 2:4] = rot(th2, 0.99)
    A_z[4:6, 4:6] = rot(th3, 0.98)
    z = rng.standard_normal(r_true)
    Z = []
    for _ in range(m + K):
        Z.append(z)
        z = A_z @ z + noise * rng.standard_normal(r_true)
    Z = np.array(Z)
    X = (L @ Z.T) + 5.0  # nonzero mean exercises centering
    return X[:, :m], X[:, m:]


class TestDynamicSensor:
    @classmethod
    def setup_class(cls):
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor, DynamicSensor
        cls.X_train, cls.X_test = _timeseries_dataset(noise=0.02)
        n_points = 75
        xyz = np.random.default_rng(0).standard_normal((n_points, 3))
        spr = SPR(cls.X_train, 2, xyz)
        spr.fit(select_modes="number", n_modes=6)
        C = spr.optimal_placement(calc_type="qr")
        spr.train(C)
        cls.spr = spr
        cls.static = SoftSensor.from_spr(spr)
        cls.dyn = DynamicSensor.from_spr(spr)
        # noisy measurement series of the continuation
        rng = np.random.default_rng(21)
        Cd = np.asarray(C.todense()) if hasattr(C, "todense") \
            else np.asarray(C)
        Y_clean = (Cd @ cls.X_test).T
        cls.sigma = 0.5 * np.std(Y_clean, axis=0)
        cls.Y = Y_clean + rng.standard_normal(Y_clean.shape) \
            * cls.sigma[None, :]
        cls.Y_sigma = np.broadcast_to(cls.sigma, Y_clean.shape).copy()

    def test_filter_beats_memoryless_solve_under_noise(self):
        X_kf, _, _ = self.dyn.filter_batch(self.Y, self.Y_sigma)
        X_st, _, _ = self.static.predict_batch(self.Y, self.Y_sigma)
        err_kf = float(nrmse(X_kf.T, jnp.asarray(self.X_test)))
        err_st = float(nrmse(X_st.T, jnp.asarray(self.X_test)))
        assert err_kf < 0.75 * err_st, (err_kf, err_st)

    def test_step_equals_batch_persist(self):
        self.dyn.reset()
        X_b, A_b, V_b = self.dyn.filter_batch(self.Y[:5], self.Y_sigma[:5])
        self.dyn.reset()
        for k in range(5):
            x, a, v = self.dyn.step(self.Y[k], self.Y_sigma[k])
        np.testing.assert_allclose(np.asarray(x), np.asarray(X_b[-1]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(A_b[-1]),
                                   atol=1e-4)
        # and persist=True continues exactly where the steps left off
        X_c, _, _ = self.dyn.filter_batch(self.Y[5:8], self.Y_sigma[5:8],
                                          persist=True)
        self.dyn.reset()
        X_full, _, _ = self.dyn.filter_batch(self.Y[:8], self.Y_sigma[:8])
        np.testing.assert_allclose(np.asarray(X_c[-1]),
                                   np.asarray(X_full[-1]), atol=1e-4)

    def test_variances_contract_with_measurements(self):
        self.dyn.reset()
        _, _, V = self.dyn.filter_batch(self.Y[:10], self.Y_sigma[:10])
        prior_var = np.diag(np.asarray(self.dyn._P0, np.float64))
        assert np.all(np.asarray(V[-1], np.float64) < prior_var + 1e-12)

    def test_compile_sharing_across_same_shape_models(self):
        from openmeasure_tpu.serving import DynamicSensor
        self.dyn.filter_batch(self.Y[:3], self.Y_sigma[:3])
        size = self.dyn._kf_kernel._cache_size()
        other = DynamicSensor.from_spr(self.spr, ridge=1e-3)
        other.filter_batch(self.Y[:3], self.Y_sigma[:3])
        assert other._kf_kernel._cache_size() == size

    def test_checkpoint_roundtrip(self, tmp_path):
        from openmeasure_tpu.serving import DynamicSensor
        from openmeasure_tpu.utils.checkpoint import save_model
        p = str(tmp_path / "spr_dyn.npz")
        save_model(self.spr, p)
        loaded = DynamicSensor.load(p)
        X1, A1, V1 = loaded.filter_batch(self.Y[:4], self.Y_sigma[:4])
        self.dyn.reset()
        X0, A0, V0 = self.dyn.filter_batch(self.Y[:4], self.Y_sigma[:4])
        np.testing.assert_allclose(np.asarray(X1), np.asarray(X0),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(A1), np.asarray(A0),
                                   atol=1e-5)

    def test_sigma_none_defaults_to_floored_exact(self):
        self.dyn.reset()
        X, A, V = self.dyn.filter_batch(self.Y[:3])
        assert np.all(np.isfinite(np.asarray(X)))

    def test_validation(self):
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import DynamicSensor
        with pytest.raises(ValueError):
            self.dyn.filter_batch(self.Y[:, :3])
        with pytest.raises(ValueError):
            self.dyn.step(self.Y[0, :3])
        spr2 = SPR(self.X_train, 2,
                   np.zeros((75, 3)))
        spr2.fit(select_modes="number", n_modes=4)
        with pytest.raises(ValueError):
            DynamicSensor.from_spr(spr2)     # fitted but not trained

    def test_shard_parity(self):
        from jax.sharding import Mesh
        devs = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devs, ("state",))
        sharded = self.dyn.shard(mesh)
        sharded.reset()
        self.dyn.reset()
        Xs, As, Vs = sharded.filter_batch(self.Y[:6], self.Y_sigma[:6])
        X0, A0, V0 = self.dyn.filter_batch(self.Y[:6], self.Y_sigma[:6])
        assert Xs.shape == X0.shape  # padded rows sliced back (n=150)
        np.testing.assert_allclose(np.asarray(Xs), np.asarray(X0),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(As), np.asarray(A0),
                                   atol=1e-5)
        # the smoothing kernel shards the same way
        sharded.reset()
        self.dyn.reset()
        Xs, As, _ = sharded.smooth_batch(self.Y[:6], self.Y_sigma[:6])
        X0, A0, _ = self.dyn.smooth_batch(self.Y[:6], self.Y_sigma[:6])
        assert Xs.shape == X0.shape
        np.testing.assert_allclose(np.asarray(Xs), np.asarray(X0),
                                   atol=1e-5)

    def test_missing_frame_is_pure_prediction(self):
        self.dyn.reset()
        Y = np.asarray(self.Y[:3]).copy()
        Y[1, :] = np.nan            # whole frame dropped
        X, A_f, V = self.dyn.filter_batch(Y, self.Y_sigma[:3])
        assert np.all(np.isfinite(np.asarray(X)))
        A_op = np.asarray(self.dyn._state["A"], np.float64)
        np.testing.assert_allclose(
            np.asarray(A_f[1], np.float64),
            A_op @ np.asarray(A_f[0], np.float64), atol=1e-5)
        # partial dropout: one dead sensor on one frame stays finite and
        # close to the fully-measured filter
        Y2 = np.asarray(self.Y[:6]).copy()
        Y2[3, 0] = np.nan
        X2, _, _ = self.dyn.filter_batch(Y2, self.Y_sigma[:6])
        self.dyn.reset()
        X_full, _, _ = self.dyn.filter_batch(self.Y[:6], self.Y_sigma[:6])
        assert np.all(np.isfinite(np.asarray(X2)))
        err = float(nrmse(X2, X_full))
        assert err < 0.1, err

    def test_forecast_matches_operator_rollout(self):
        self.dyn.reset()
        Xf, Af, Vf = self.dyn.forecast(4)
        A_op = np.asarray(self.dyn._state["A"], np.float64)
        a = np.asarray(self.dyn._a0, np.float64)
        for k in range(4):
            a = A_op @ a
            np.testing.assert_allclose(np.asarray(Af[k], np.float64), a,
                                       atol=1e-5)
        assert np.all(np.isfinite(np.asarray(Xf)))
        # forecasting can never be more certain than filtering actual
        # measurements
        self.dyn.reset()
        _, _, V_meas = self.dyn.filter_batch(self.Y[:4], self.Y_sigma[:4])
        assert float(jnp.mean(Vf[-1])) > float(jnp.mean(V_meas[-1]))
        with pytest.raises(ValueError):
            self.dyn.forecast(0)

    def test_forecast_from_carry_is_nonmutating_lookahead(self):
        self.dyn.reset()
        self.dyn.filter_batch(self.Y[:5], self.Y_sigma[:5], persist=True)
        a_before = np.asarray(self.dyn._a).copy()
        P_before = np.asarray(self.dyn._P).copy()
        rej_before = self.dyn.last_rejected
        Xc, Ac, Vc = self.dyn.forecast(3, from_carry=True)
        # the synthetic all-missing series must not clobber the
        # sensor-health mask of the last REAL filter call
        assert self.dyn.last_rejected is rej_before
        # lookahead starts from the LIVE carry...
        A_op = np.asarray(self.dyn._state["A"], np.float64)
        np.testing.assert_allclose(np.asarray(Ac[0], np.float64),
                                   A_op @ np.asarray(a_before, np.float64),
                                   atol=1e-5)
        # ...and leaves it untouched
        np.testing.assert_array_equal(np.asarray(self.dyn._a), a_before)
        np.testing.assert_array_equal(np.asarray(self.dyn._P), P_before)
        # persist=True produces the same outputs but advances the carry
        Xp, Ap, Vp = self.dyn.forecast(3, persist=True)
        np.testing.assert_allclose(np.asarray(Ap), np.asarray(Ac),
                                   atol=1e-6)
        assert not np.allclose(np.asarray(self.dyn._a), a_before)
        # default (persist=False) forecasts from the packaged prior
        self.dyn.reset()
        X0, A0, _ = self.dyn.forecast(3)
        a = np.asarray(self.dyn._a0, np.float64)
        np.testing.assert_allclose(np.asarray(A0[0], np.float64),
                                   A_op @ a, atol=1e-5)

    def test_nan_sigma_is_treated_as_missing(self):
        self.dyn.reset()
        sig = np.asarray(self.Y_sigma[:4]).copy()
        sig[2, 1] = np.nan          # unknown noise level, finite value
        X1, A1, V1 = self.dyn.filter_batch(self.Y[:4], sig)
        assert np.all(np.isfinite(np.asarray(X1)))
        # inf sigma (the natural 'ignore me') must behave identically —
        # an unmasked inf would NaN-poison the SPD solve for the series
        self.dyn.reset()
        sig_inf = np.asarray(self.Y_sigma[:4]).copy()
        sig_inf[2, 1] = np.inf
        Xi, Ai, Vi = self.dyn.filter_batch(self.Y[:4], sig_inf)
        np.testing.assert_allclose(np.asarray(Xi), np.asarray(X1),
                                   atol=1e-6)
        self.dyn.reset()
        # identical to dropping the measurement itself
        self.dyn.reset()
        Y = np.asarray(self.Y[:4]).copy()
        Y[2, 1] = np.nan
        X2, A2, V2 = self.dyn.filter_batch(Y, self.Y_sigma[:4])
        np.testing.assert_allclose(np.asarray(X1), np.asarray(X2),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(V1), np.asarray(V2),
                                   atol=1e-6)

    def test_warmup_compiles_both_kernels(self):
        from openmeasure_tpu.serving import (_kf_serve_series,
                                             _kf_smooth_series)
        self.dyn.warmup(batch=2)
        # both module-level kernels have a compiled entry for this shape
        assert _kf_serve_series._cache_size() > 0
        assert _kf_smooth_series._cache_size() > 0

    def test_more_sensors_than_modes_with_zero_sigma_stays_finite(self):
        """s > r makes H P H^T rank-deficient; near-zero measurement
        variances then need the RELATIVE innovation floor or the fp32 SPD
        solve NaN-poisons the series (review-verified failure)."""
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import DynamicSensor
        from openmeasure_tpu.sensing import dg as _dg
        spr = SPR(self.X_train, 2, np.zeros((75, 3)))
        spr.fit(select_modes="number", n_modes=4)
        sel = np.asarray(_dg.dg_select(spr.Ur, 12))     # s=12 > r=4
        C = np.zeros((12, 150))
        C[np.arange(12), sel] = 1.0
        spr.train(C)
        dyn = DynamicSensor.from_spr(spr)
        Y = (C @ self.X_test).T[:6]
        X, A_f, V = dyn.filter_batch(Y, None)           # sigma=None
        assert np.all(np.isfinite(np.asarray(X)))
        assert np.all(np.isfinite(np.asarray(V)))

    def test_gated_large_finite_spike_equals_missing(self):
        """A finite garbage reading (e.g. a 1e36 DAQ fill value, which
        passes the isfinite mask) that trips the gate must perturb the
        state EXACTLY like a missing reading — the old ~1e-12 gain leak
        times 1e36 dragged the state by orders of magnitude."""
        from openmeasure_tpu.serving import DynamicSensor
        dyn = DynamicSensor.from_spr(self.spr, gate=4.0)
        Y_spike = np.asarray(self.Y[:6]).copy()
        Y_spike[3, 2] = 9.97e36                        # netCDF fill value
        Xs, As, _ = dyn.filter_batch(Y_spike, self.Y_sigma[:6])
        assert float(jnp.mean(dyn.last_rejected.astype(jnp.float32))) > 0
        dyn.reset()
        Y_miss = np.asarray(self.Y[:6]).copy()
        Y_miss[3, 2] = np.nan
        Xm, Am, _ = dyn.filter_batch(Y_miss, self.Y_sigma[:6])
        np.testing.assert_allclose(np.asarray(As), np.asarray(Am),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Xs), np.asarray(Xm),
                                   atol=1e-3)

    def test_smoother_rejects_empty_series(self):
        from openmeasure_tpu.dynamics.kalman import kalman_smoother
        r, s = 3, 4
        A = 0.9 * np.eye(r); Q = 0.01 * np.eye(r)
        H = np.random.default_rng(0).standard_normal((s, r))
        with pytest.raises(ValueError, match="at least one frame"):
            kalman_smoother(A, Q, H, np.zeros(r), np.eye(r),
                            np.zeros((0, s)), np.zeros((0, s)))

    def test_gating_shields_against_stuck_sensor(self):
        from openmeasure_tpu.serving import DynamicSensor
        gated = DynamicSensor.from_spr(self.spr, gate=4.0)
        # gate is a state leaf: same-shape models share the compiled kernel
        self.dyn.filter_batch(self.Y[:10], self.Y_sigma[:10])
        size = self.dyn._kf_kernel._cache_size()
        Y_bad = np.asarray(self.Y[:10]).copy()
        Y_bad[4, 1] += 100.0 * self.sigma[1]        # stuck-sensor spike
        Xg, _, _ = gated.filter_batch(Y_bad, self.Y_sigma[:10])
        assert gated._kf_kernel._cache_size() == size
        rej = np.asarray(gated.last_rejected)
        assert rej[4, 1] and rej.sum() <= 3
        assert gated.rejected_fraction() > 0.0
        self.dyn.reset()
        X_open, _, _ = self.dyn.filter_batch(Y_bad, self.Y_sigma[:10])
        assert self.dyn.rejected_fraction() == 0.0  # ungated never rejects
        truth = jnp.asarray(self.X_test[:, :10])
        err_g = float(nrmse(Xg.T, truth))
        err_o = float(nrmse(X_open.T, truth))
        assert err_g < err_o, (err_g, err_o)
        with pytest.raises(ValueError):
            DynamicSensor.from_spr(self.spr, gate=-1.0)

    def test_smooth_beats_filter_and_shares_carry(self):
        self.dyn.reset()
        X_s, A_s, V_s = self.dyn.smooth_batch(self.Y, self.Y_sigma,
                                              persist=True)
        a_s, P_s = np.asarray(self.dyn._a), np.asarray(self.dyn._P)
        self.dyn.reset()
        X_f, A_f, V_f = self.dyn.filter_batch(self.Y, self.Y_sigma,
                                              persist=True)
        a_f, P_f = np.asarray(self.dyn._a), np.asarray(self.dyn._P)
        self.dyn.reset()
        # persist carry == forward filter's carry (streaming continuation)
        np.testing.assert_allclose(a_s, a_f, atol=1e-6)
        np.testing.assert_allclose(P_s, P_f, atol=1e-6)
        # last frame: smoothed == filtered
        np.testing.assert_allclose(np.asarray(X_s[-1]),
                                   np.asarray(X_f[-1]), atol=1e-4)
        # conditioning on the whole series improves the reconstruction
        err_s = float(nrmse(X_s.T, jnp.asarray(self.X_test)))
        err_f = float(nrmse(X_f.T, jnp.asarray(self.X_test)))
        assert err_s < err_f, (err_s, err_f)


class TestStreamingDMD:
    """Out-of-core DMD parity vs the in-core class on the same series.

    The streaming fit identifies everything from the f64 full-series Gram
    (basis block, cross block, coefficients) + one fp32 panel pass; the
    in-core fit goes through svd_tall_safe.  Eigenvalues are f64-vs-f64
    (tight); panels/forecasts carry fp32 storage round-off."""

    @classmethod
    def setup_class(cls):
        cls.X, *_ = _oscillatory_series(n_points=60, n_features=3, m=30,
                                        thetas=(4, 7), seed=13)
        cls.X = cls.X + 2.5  # nonzero mean exercises the streamed centering

    def _fit_pair(self, tmp_path, **kw):
        from openmeasure_tpu import StreamingDMD
        p = str(tmp_path / "series.npy")
        np.save(p, self.X.astype(np.float32))
        sdmd = StreamingDMD(p, 3, chunk_rows=37)
        sdmd.fit(dt=0.5, **kw)
        dmd = DMD(self.X.astype(np.float32), 3, np.zeros((60, 3)))
        dmd.fit(dt=0.5, **kw)
        return sdmd, dmd

    def test_spectrum_and_forecast_match_incore(self, tmp_path):
        sdmd, dmd = self._fit_pair(tmp_path, select_modes="number",
                                   n_modes=4)
        np.testing.assert_allclose(_sorted_eigs(sdmd.eigs),
                                   _sorted_eigs(dmd.eigs), atol=1e-5)
        scale = float(np.abs(self.X).max())
        for exact in (True, False):
            Xf_s = np.asarray(sdmd.forecast_horizon(5, exact=exact))
            Xf_c = np.asarray(dmd.forecast_horizon(5, exact=exact))
            np.testing.assert_allclose(Xf_s, Xf_c, atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(sdmd.reconstruct_dmd()),
                                   np.asarray(dmd.reconstruct_dmd()),
                                   atol=2e-4 * scale)

    def test_coefficients_match_incore(self, tmp_path):
        sdmd, dmd = self._fit_pair(tmp_path, select_modes="number",
                                   n_modes=4)
        # Ar is sign-ambiguous per mode (Gram eigh vs svd): compare |.|
        np.testing.assert_allclose(np.abs(np.asarray(sdmd.Ar)),
                                   np.abs(np.asarray(dmd.Ar)),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(sdmd.Sigma_r),
                                   np.asarray(dmd.Sigma_r), rtol=1e-5)

    def test_variance_selection_and_validation(self, tmp_path):
        from openmeasure_tpu import StreamingDMD
        sdmd, dmd = self._fit_pair(tmp_path, select_modes="variance",
                                   n_modes=99.9999)
        assert sdmd.r == dmd.r
        p1 = str(tmp_path / "one.npy")
        np.save(p1, self.X[:, :1].astype(np.float32))
        short = StreamingDMD(p1, 3)
        with pytest.raises(ValueError):
            short.fit()
        with pytest.raises(NotImplementedError):
            sdmd.update_basis(self.X[:, :2])
