"""Shallow-decoder reconstruction tests (beyond-reference;
sensing/decoder.py, Williams/Zahn/Kutz arXiv:2202.05330).

Manufactured-problem style mirrors the reference's tier-1 GP test
(tests/test_gpr.py:13-34): known generative structure, numeric bars."""

import numpy as np
import pytest

from openmeasure_tpu import SPR
from openmeasure_tpu.sensing.decoder import ShallowDecoder


def _translating_bump(n_points, ts, width=0.08):
    """Snapshots on a nonlinear 1-D manifold: a Gaussian bump translating
    across the domain — the classic slow-POD-decay problem (a linear basis
    needs many modes; a nonlinear decoder needs one latent parameter)."""
    x = np.linspace(0, 1, n_points)
    cols = [np.exp(-((x - 0.2 - 0.6 * t) ** 2) / (2 * width ** 2))
            for t in ts]
    return np.stack(cols, axis=1)                     # (n_points, m)


class TestShallowDecoder:
    def setup_method(self, method):
        self.n_points = 60
        self.n_features = 1
        rng = np.random.default_rng(8)
        self.xyz = np.column_stack([np.linspace(0, 1, self.n_points),
                                    np.zeros(self.n_points),
                                    np.zeros(self.n_points)])
        self.ts_train = np.linspace(0, 1, 24)
        self.ts_test = rng.random(5)
        self.X_train = _translating_bump(self.n_points, self.ts_train)
        self.X_test = _translating_bump(self.n_points, self.ts_test)

    def _placed_C(self, n_modes=6):
        spr = SPR(self.X_train, self.n_features, self.xyz)
        spr.fit(select_modes="number", n_modes=n_modes)
        return np.asarray(spr.optimal_placement()), spr

    def _y_list(self, C, X):
        rows = np.argmax(C, axis=1)
        ys = []
        for col in range(X.shape[1]):
            y = np.zeros((len(rows), 3))
            y[:, 0] = X[rows, col]
            y[:, 2] = rows // self.n_points
            ys.append(y)
        return ys

    @pytest.mark.slow
    def test_heldout_reconstruction_and_training_fit(self):
        C, _ = self._placed_C()
        dec = ShallowDecoder(self.X_train, self.n_features, self.xyz,
                             hidden=(40, 45))
        dec.fit(C, epochs=4000, lr=3e-3, seed=0)
        # loss decreased by orders of magnitude and is finite
        losses = np.asarray(dec.loss_history)
        assert np.isfinite(losses).all()
        assert losses[-1] < 1e-3 * losses[0]
        # training snapshots reproduced through the y (s,3) convention
        X_fit = np.asarray(dec.predict(self._y_list(C, self.X_train)))
        nrmse_fit = np.sqrt(np.mean((X_fit - self.X_train) ** 2)) \
            / np.ptp(self.X_train)
        assert nrmse_fit < 0.02, nrmse_fit
        # held-out snapshots (interpolation along the manifold)
        X_pred = np.asarray(dec.predict(self._y_list(C, self.X_test)))
        assert X_pred.shape == (self.n_points, 5)
        nrmse = np.sqrt(np.mean((X_pred - self.X_test) ** 2)) \
            / np.ptp(self.X_test)
        assert nrmse < 0.15, nrmse

    def test_beats_gappy_pod_on_nonlinear_manifold(self):
        """On the translating bump with r=6 modes the linear gappy-POD
        reconstruction truncates hard; the decoder must do strictly
        better on held-out snapshots."""
        C, spr = self._placed_C(n_modes=6)
        spr.train(C)
        a, _ = spr.predict(self._y_list(C, self.X_test))
        X_pod = np.asarray(spr.reconstruct(np.asarray(a)))
        nrmse_pod = np.sqrt(np.mean((X_pod - self.X_test) ** 2)) \
            / np.ptp(self.X_test)

        dec = ShallowDecoder(self.X_train, self.n_features, self.xyz,
                             hidden=(40, 45))
        dec.fit(C, epochs=4000, lr=3e-3, seed=0)
        X_dec = np.asarray(dec.predict(self._y_list(C, self.X_test)))
        nrmse_dec = np.sqrt(np.mean((X_dec - self.X_test) ** 2)) \
            / np.ptp(self.X_test)
        assert nrmse_dec < nrmse_pod, (nrmse_dec, nrmse_pod)

    def test_validation_surface(self):
        C, _ = self._placed_C()
        dec = ShallowDecoder(self.X_train, self.n_features, self.xyz)
        with pytest.raises(AttributeError, match="fit has to be called"):
            dec.predict(self._y_list(C, self.X_test))
        dec.fit(C, epochs=10)
        with pytest.raises(ValueError, match="wrong number of columns"):
            dec.predict(np.zeros((C.shape[0], 2)))

    def test_sparse_C_and_vector_placement_compose(self):
        """Decoder trains against a scipy-sparse C from the vdg placement
        family (multi-feature data)."""
        import scipy.sparse as sp
        rng = np.random.default_rng(9)
        n_points, nf, m = 30, 2, 20
        t = np.linspace(0, 1, m)
        x = np.linspace(0, 1, n_points)
        X = np.concatenate([
            np.sin(2 * np.pi * (x[:, None] - 0.5 * t[None, :])),
            np.cos(2 * np.pi * (x[:, None] + 0.3 * t[None, :])) * 2.0,
        ]) + 0.01 * rng.standard_normal((n_points * nf, m))
        xyz = np.column_stack([x, np.zeros(n_points), np.zeros(n_points)])
        spr = SPR(X, nf, xyz)
        spr.fit(select_modes="number", n_modes=4)
        C = np.asarray(spr.optimal_placement(calc_type="vdg", n_sensors=3))
        dec = ShallowDecoder(X, nf, xyz, hidden=(24,))
        dec.fit(sp.csr_matrix(C), epochs=3000, lr=3e-3)
        rows = np.argmax(C, axis=1)
        y = np.zeros((len(rows), 3))
        y[:, 0] = X[rows, 0]
        y[:, 2] = rows // n_points
        X_pred = np.asarray(dec.predict(y))
        nrmse = np.sqrt(np.mean((X_pred[:, 0] - X[:, 0]) ** 2)) / np.ptp(X)
        assert nrmse < 0.05, nrmse
