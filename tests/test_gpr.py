"""GPR conformance tests — the reference's manufactured rank-1 problem
(tests/test_gpr.py of the reference) plus MultiTask / update / constrained
prediction / PIGPR coverage."""

import numpy as np
import pytest

import jax.numpy as jnp

from openmeasure_tpu import GPR, PIGPR
from openmeasure_tpu.gp import kernels as K


def make_rank1():
    """Manufactured problem with known solution (reference test_gpr.py:13-34):
    X = U (100·Vᵀ) + 20 with U a normalized ramp and V = sin(2πP)."""
    n_points, n_features, m = 20, 1, 10
    P = np.linspace(0, 1, 2 * m)[:, None]
    V = 10 * np.sin(2 * np.pi * P)
    V = V / np.linalg.norm(V)
    U = np.arange(1, n_points + 1, dtype=float)[:, None]
    U = U / np.linalg.norm(U)
    X0 = U @ (100 * V.T)
    X = X0 + 20.0
    xyz = np.zeros((n_points, 3))
    return {
        "P_train": P[::2], "P_test": P[1::2],
        "V_train": V[::2], "V_test": V[1::2],
        "X_train": X[:, ::2], "X_test": X[:, 1::2],
        "U": U, "xyz": xyz, "n_features": n_features,
    }


class TestGPRSingleTask:
    def setup_method(self, method):
        d = make_rank1()
        self.d = d
        self.gpr = GPR(d["X_train"], d["n_features"], d["xyz"], d["P_train"])

    def test_validation(self):
        with pytest.raises(Exception):
            GPR(self.d["X_train"], 1, self.d["xyz"],
                np.zeros((3, 1)))  # wrong row count

    def test_parameter_scaling(self):
        P0 = self.gpr.scale_GPR_data(self.d["P_train"], "std")
        P_cnt = np.tile(np.mean(self.d["P_train"], axis=0),
                        (len(self.d["P_train"]), 1))
        P_scl = np.tile(np.std(self.d["P_train"], axis=0),
                        (len(self.d["P_train"]), 1))
        np.testing.assert_allclose(self.gpr.P_cnt, P_cnt, rtol=1e-12)
        np.testing.assert_allclose(self.gpr.P_scl, P_scl, rtol=1e-12)
        np.testing.assert_allclose(P0, (self.d["P_train"] - P_cnt) / P_scl,
                                   rtol=1e-12)

    def test_fit_recovers_basis(self):
        self.gpr.fit(scaleX_type="none")
        np.testing.assert_allclose(np.abs(self.d["U"]),
                                   np.abs(np.asarray(self.gpr.Ur)),
                                   atol=1e-5)

    def test_fit_deflate_knob_agrees_with_plain(self):
        """The TPU accuracy knob (deflated Gram-route basis) must agree
        with the plain fit to round-off where both are exact (CPU x64) —
        same rank, same factors up to sign, and the GP still trains."""
        g1 = GPR(self.d["X_train"], self.d["n_features"], self.d["xyz"],
                 self.d["P_train"])
        g1.fit(select_modes="number", n_modes=2)
        g2 = GPR(self.d["X_train"], self.d["n_features"], self.d["xyz"],
                 self.d["P_train"])
        g2.fit(select_modes="number", n_modes=2, deflate=True)
        assert g2.r == g1.r
        # rank-1 data: mode 2's sigma is machine noise (~1e-15) — compare
        # with an eps*sigma1 absolute floor
        s1 = float(np.asarray(g1.Sigma_r)[0])
        np.testing.assert_allclose(np.asarray(g2.Sigma_r),
                                   np.asarray(g1.Sigma_r), rtol=1e-8,
                                   atol=1e-12 * s1)
        np.testing.assert_allclose(np.abs(np.asarray(g2.Ur[:, :1])),
                                   np.abs(np.asarray(g1.Ur[:, :1])),
                                   atol=1e-8)
        g2.train(max_iter=30)
        A_pred, _ = g2.predict(self.d["P_test"])
        assert np.all(np.isfinite(np.asarray(A_pred)))

    def test_predict_reconstructs_heldout(self):
        self.gpr.fit(scaleX_type="none")
        self.gpr.train()
        A_pred, A_sigma = self.gpr.predict(self.d["P_test"])
        X_pred = self.gpr.reconstruct(A_pred)
        np.testing.assert_allclose(self.d["X_test"], np.asarray(X_pred),
                                   rtol=1e-10, atol=5e-1)
        assert np.all(np.asarray(A_sigma) >= 0)

    def test_predict_1d_promotion(self):
        self.gpr.fit(scaleX_type="none")
        self.gpr.train()
        A_pred, _ = self.gpr.predict(self.d["P_test"][0])
        assert np.asarray(A_pred).shape == (1, self.gpr.r)

    def test_predict_before_train_raises(self):
        self.gpr.fit(scaleX_type="none")
        with pytest.raises(AttributeError):
            self.gpr.predict(self.d["P_test"])

    def test_update_without_retrain(self):
        self.gpr.fit(scaleX_type="none")
        self.gpr.train()
        A_new, _ = self.gpr.predict(self.d["P_test"][:2])
        self.gpr.update(self.d["P_test"][:2], np.asarray(A_new))
        # training set grew; prediction at the new points should interpolate
        A_back, _ = self.gpr.predict(self.d["P_test"][:2])
        np.testing.assert_allclose(np.asarray(A_back), np.asarray(A_new),
                                   atol=0.3)

    def test_update_retrain_requires_sigma(self):
        self.gpr.fit(scaleX_type="none")
        self.gpr.train()
        A_new, _ = self.gpr.predict(self.d["P_test"][:2])
        with pytest.raises(ValueError):
            self.gpr.update(self.d["P_test"][:2], np.asarray(A_new),
                            retrain=True)

    def test_update_after_fixed_noise_retrain_predicts(self):
        """Assimilating more data onto a fixed-noise-retrained model must
        keep the installed fixed-noise vector length-consistent with the
        training set (previously a shape-broadcast crash at predict)."""
        self.gpr.fit()
        self.gpr.train(max_iter=30)
        P1 = np.array([[0.21], [0.43]])
        A1 = np.asarray(self.gpr.predict(P1)[0])
        S1 = 0.05 * np.abs(A1) + 1e-3
        self.gpr.update(P1, A1, S1, retrain=True)   # installs fixed noise
        P2 = np.array([[0.61]])
        A2 = np.asarray(self.gpr.predict(P2)[0])
        self.gpr.update(P2, A2)                     # NO retrain
        A_pred, A_sig = self.gpr.predict(self.d["P_test"])
        assert np.all(np.isfinite(np.asarray(A_pred)))
        # ... and the API-compat views track the swapped likelihood
        from openmeasure_tpu.gp import kernels as K
        assert isinstance(self.gpr.likelihoods[0],
                          K.FixedNoiseGaussianLikelihood)

    def test_update_basis_rejects_orphaned_update_pairs(self):
        """update_basis cannot rotate targets for update()-assimilated
        pairs (no raw snapshots) — it must refuse, not silently drop
        them."""
        self.gpr.fit(select_modes="number", n_modes=2)
        self.gpr.train(max_iter=20)
        P1 = np.array([[0.33]])
        A1 = np.asarray(self.gpr.predict(P1)[0])
        self.gpr.update(P1, A1)
        X_new = np.asarray(self.d["X_train"])[:, :1] * 1.01
        with pytest.raises(ValueError, match="assimilated via update"):
            self.gpr.update_basis(X_new, np.array([[0.77]]))

    def test_update_basis_retrain_requires_trained_model(self):
        self.gpr.fit(select_modes="number", n_modes=2)
        X_new = np.asarray(self.d["X_train"])[:, :1] * 1.01
        with pytest.raises(ValueError, match="needs a trained model"):
            self.gpr.update_basis(X_new, np.array([[0.77]]), retrain=True)

    def test_train_rejects_mismatched_likelihood(self):
        from openmeasure_tpu.gp import kernels as K
        self.gpr.fit()
        with pytest.raises(TypeError, match="GaussianLikelihood"):
            self.gpr.train(likelihood=K.FixedNoiseGaussianLikelihood())

    def test_fit_deflate_validation(self):
        from openmeasure_tpu import GPR
        g = GPR(self.d["X_train"], self.d["n_features"], self.d["xyz"],
                self.d["P_train"])
        with pytest.raises(ValueError, match="deflate"):
            g.fit(select_modes="number", n_modes=1, deflate=True)  # r=1
        with pytest.raises(ValueError, match="deflate"):
            g.fit(select_modes="number", n_modes=2, deflate=5)     # k>=r
        with pytest.raises(ValueError, match="basis"):
            g.fit(basis=(np.zeros((150, 2)), np.zeros((10, 2))),
                  deflate=True)

    def test_update_retrain_fixed_noise(self):
        # Reference semantics (gpr.py:671-674): retrain swaps in
        # FixedNoiseGaussianLikelihood(Vr_sigma²) where Vr_sigma on the
        # original points is the PRIOR stddev (≈1) — so the retrained GP
        # treats old data as very noisy.  We assert the mechanism works
        # (finite, shape-correct, likelihood swapped) rather than accuracy,
        # which the reference never asserts either.
        self.gpr.fit(scaleX_type="none")
        self.gpr.train(max_iter=100)
        A_new, A_sig = self.gpr.predict(self.d["P_test"][:2])
        self.gpr.update(self.d["P_test"][:2], np.asarray(A_new),
                        A_sigma_new=np.asarray(A_sig) + 1e-3, retrain=True)
        assert isinstance(self.gpr.likelihood,
                          K.FixedNoiseGaussianLikelihood)
        A_pred, A_psig = self.gpr.predict(self.d["P_test"])
        assert np.all(np.isfinite(np.asarray(A_pred)))
        assert np.asarray(A_pred).shape == (len(self.d["P_test"]),
                                            self.gpr.r)
        assert np.all(np.asarray(A_psig) >= 0)

    def test_custom_kernel_and_mean(self):
        self.gpr.fit(scaleX_type="none")
        self.gpr.train(mean=K.ZeroMean(), kernel=K.RBFKernel(),
                       max_iter=300)
        A_pred, _ = self.gpr.predict(self.d["P_test"])
        X_pred = self.gpr.reconstruct(A_pred)
        np.testing.assert_allclose(self.d["X_test"], np.asarray(X_pred),
                                   rtol=1e-10, atol=5e-1)


class TestGPRMultiTask:
    def setup_method(self, method):
        d = make_rank1()
        self.d = d
        self.gpr = GPR(d["X_train"], d["n_features"], d["xyz"], d["P_train"],
                       gpr_type="MultiTask")

    def test_predict_reconstructs_heldout(self):
        self.gpr.fit(scaleX_type="none")
        self.gpr.train()
        A_pred, _ = self.gpr.predict(self.d["P_test"])
        X_pred = self.gpr.reconstruct(A_pred)
        np.testing.assert_allclose(self.d["X_test"], np.asarray(X_pred),
                                   rtol=1e-10, atol=5e-1)

    def test_constrained_prediction_respects_limits(self):
        self.gpr.fit(scaleX_type="none")
        self.gpr.train()
        # physical limits on the single feature
        limits = [np.array([15.0]), np.array([25.0])]
        A_pred, _ = self.gpr.predict(self.d["P_test"], limits=limits)
        X_pred = np.asarray(self.gpr.reconstruct(A_pred))
        assert X_pred.min() >= 15.0 - 1e-3
        assert X_pred.max() <= 25.0 + 1e-3

    def test_bc_pinned_prediction_per_point(self):
        """Reference bc0_limits recipe (gpr.py:575-578,
        tests/test_gpr_data.py:88-115): per-test-point equality pins on
        chosen state rows, enforced through the constrained MAP."""
        self.gpr.fit(scaleX_type="none")
        self.gpr.train()
        n_p = self.d["P_test"].shape[0]
        rows = np.array([0, 5])
        # pin those rows to the TRUE held-out field values, per point
        values = np.asarray(self.d["X_test"])[rows, :]      # (2, n_p)
        A_pred, _ = self.gpr.predict(self.d["P_test"], bc=(rows, values))
        X_pred = np.asarray(self.gpr.reconstruct(A_pred))
        np.testing.assert_allclose(X_pred[rows, :], values, atol=2e-4)
        # the rest of the field should still reconstruct well
        np.testing.assert_allclose(self.d["X_test"], X_pred, atol=0.5)

    def test_bc_pins_match_closed_form_map(self):
        """With only equality pins, the constrained MAP has a closed form:
        v* = mu + C Aᵀ (A C Aᵀ)⁻¹ (b − A mu) with C the posterior cov."""
        self.gpr.fit(scaleX_type="none")
        self.gpr.train(max_iter=200)
        rows = np.array([3])
        n_p = self.d["P_test"].shape[0]
        values = np.asarray(self.d["X_test"])[rows, :] + 0.3
        A_pred, A_sigma = self.gpr.predict(self.d["P_test"],
                                           bc=(rows, values),
                                           max_iter=20000, tol=1e-12)
        # unconstrained posterior for the closed form
        A_un, A_sig = self.gpr.predict(self.d["P_test"])
        S = np.asarray(self.gpr.Ur) * np.asarray(self.gpr.Sigma_r)[None, :]
        cnt = np.asarray(self.gpr.X_cnt)[rows, 0]
        scl = np.asarray(self.gpr.X_scl)[rows, 0]
        b0 = (values - cnt[:, None]) / scl[:, None]          # scaled pins
        A_row = S[rows, :]                                    # (1, r)
        Sig = np.asarray(self.gpr.Sigma_r)
        for i in range(n_p):
            mu = np.asarray(A_un)[i] / Sig                   # v-space mean
            C = np.diag((np.asarray(A_sig)[i] / Sig) ** 2)
            lam = np.linalg.solve(A_row @ C @ A_row.T,
                                  b0[:, i] - A_row @ mu)
            v_star = mu + C @ A_row.T @ lam
            np.testing.assert_allclose(np.asarray(A_pred)[i], v_star * Sig,
                                       atol=5e-4)

    def test_constrained_prediction_single_task_raises(self):
        d = self.d
        g = GPR(d["X_train"], d["n_features"], d["xyz"], d["P_train"])
        g.fit(scaleX_type="none")
        g.train(max_iter=50)
        with pytest.raises(NotImplementedError):
            g.predict(d["P_test"], limits=[np.array([0.0]),
                                           np.array([1.0])])

    def test_update_multitask(self):
        self.gpr.fit(scaleX_type="none")
        self.gpr.train(max_iter=100)
        A_new, _ = self.gpr.predict(self.d["P_test"][:2])
        self.gpr.update(self.d["P_test"][:2], np.asarray(A_new),
                        retrain=True)
        A_pred, _ = self.gpr.predict(self.d["P_test"])
        X_pred = self.gpr.reconstruct(A_pred)
        np.testing.assert_allclose(self.d["X_test"], np.asarray(X_pred),
                                   rtol=1e-10, atol=1.0)


class TestPIGPR:
    def test_added_loss_drives_training(self):
        d = make_rank1()
        calls = {"n": 0}

        def added_loss(ctx):
            # penalize posterior mean exceeding the physical range at the
            # constraint points (differentiable through ctx['output'])
            out = ctx["output"]
            excess = jnp.maximum(jnp.abs(out.mean) - 1.0, 0.0)
            return -10.0 * jnp.sum(excess ** 2)

        P_cstr = np.linspace(0, 1, 7)[:, None]
        pig = PIGPR(d["X_train"], d["n_features"], d["xyz"], d["P_train"],
                    P_cstr, added_loss)
        pig.fit(scaleX_type="none")
        loss_mll, Vr_pred = pig.compute_mll()
        assert np.isfinite(loss_mll)
        assert Vr_pred.shape == (len(d["P_train"]) + 7, pig.r)

        pig.train(max_iter=200)
        A_pred, _ = pig.predict(d["P_test"])
        X_pred = pig.reconstruct(A_pred)
        np.testing.assert_allclose(d["X_test"], np.asarray(X_pred),
                                   rtol=1e-10, atol=1.0)


class TestPIGPRRetrainGuards:
    def _pigpr(self):
        d = make_rank1()
        pig = PIGPR(d["X_train"], d["n_features"], d["xyz"], d["P_train"],
                    np.linspace(0, 1, 5)[:, None],
                    lambda ctx: -jnp.sum(jnp.maximum(
                        jnp.abs(ctx["output"].mean) - 1.0, 0.0) ** 2))
        pig.fit(scaleX_type="none")
        pig.train(max_iter=20)
        return pig, d

    def test_update_retrain_rejected(self):
        """The standard retrain loop would silently drop the added-loss
        term — every retrain entry point must refuse."""
        pig, d = self._pigpr()
        A1, _ = pig.predict(d["P_test"][:1])
        with pytest.raises(ValueError, match="added-loss"):
            pig.update(d["P_test"][:1], np.asarray(A1), retrain=True)
        # non-retrain assimilation stays allowed
        pig.update(d["P_test"][:1], np.asarray(A1))

    def test_streaming_pigpr_update_basis_retrain_rejected(self):
        from openmeasure_tpu import StreamingPIGPR
        from openmeasure_tpu.streaming import ArrayStore
        d = make_rank1()
        spig = StreamingPIGPR(
            ArrayStore(np.asarray(d["X_train"], np.float64)),
            d["n_features"], d["xyz"], d["P_train"],
            np.linspace(0, 1, 5)[:, None],
            lambda ctx: -jnp.sum(ctx["output"].mean ** 2),
            dtype=np.float64)
        spig.fit(scaleX_type="none")
        spig.train(max_iter=10)
        X_new = np.asarray(d["X_train"])[:, :1] * 1.01
        with pytest.raises(ValueError, match="added-loss"):
            spig.update_basis(X_new, d["P_test"][:1], retrain=True)


class TestUpdateBookkeeping:
    def test_update_without_sigma_keeps_lengths_consistent(self):
        d = make_rank1()
        g = GPR(d["X_train"], d["n_features"], d["xyz"], d["P_train"])
        g.fit(scaleX_type="none")
        g.train(max_iter=50)
        p0 = len(d["P_train"])
        A1, _ = g.predict(d["P_test"][:2])
        g.update(d["P_test"][:2], np.asarray(A1))          # no sigma
        assert np.asarray(g.Vr_sigma).shape[0] == p0 + 2
        A2, S2 = g.predict(d["P_test"][2:4])
        # a later retrain WITH sigma must now be well-formed
        g.update(d["P_test"][2:4], np.asarray(A2),
                 A_sigma_new=np.asarray(S2) + 1e-3, retrain=True)
        assert np.asarray(g.Vr_sigma).shape[0] == p0 + 4
        A, _ = g.predict(d["P_test"])
        assert np.all(np.isfinite(np.asarray(A)))


class TestPIGPRLossDict:
    def test_loss_dict_reaches_callback(self):
        d = make_rank1()
        seen = {}

        def added_loss(ctx):
            # record statically-visible structure at trace time
            seen["keys"] = sorted(ctx.keys())
            seen["loss_dict"] = ctx["loss_dict"]
            seen["has_mean"] = hasattr(ctx["output"], "mean")
            return -ctx["loss_dict"]["coef"] * jnp.sum(ctx["output"].mean**2)

        P_cstr = np.linspace(0, 1, 5)[:, None]
        pig = PIGPR(d["X_train"], d["n_features"], d["xyz"], d["P_train"],
                    P_cstr, added_loss)
        pig.fit(scaleX_type="none")
        pig.train(max_iter=30, loss_dict={"coef": 0.5})
        assert seen["keys"] == ["loss_dict", "loss_ml", "output", "verbose"]
        assert seen["loss_dict"] == {"coef": 0.5}
        assert seen["has_mean"]


class TestPIGPRConsistency:
    def test_zero_added_loss_matches_multitask(self):
        """With a zero added loss, PIGPR must train to the same model as a
        plain MultiTask GPR (identical init, optimizer, and data)."""
        d = make_rank1()
        zero_loss = lambda ctx: 0.0 * jnp.sum(ctx["output"].mean)

        pig = PIGPR(d["X_train"], d["n_features"], d["xyz"], d["P_train"],
                    d["P_train"][:3], zero_loss)
        pig.fit(scaleX_type="none")
        pig.train(max_iter=80)

        mt = GPR(d["X_train"], d["n_features"], d["xyz"], d["P_train"],
                 gpr_type="MultiTask")
        mt.fit(scaleX_type="none")
        mt.train(max_iter=80)

        A1, S1 = pig.predict(d["P_test"])
        A2, S2 = mt.predict(d["P_test"])
        np.testing.assert_allclose(np.asarray(A1), np.asarray(A2),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(S1), np.asarray(S2),
                                   rtol=1e-6, atol=1e-8)
