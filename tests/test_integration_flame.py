"""Tier-2 integration tests at flame scale — numeric versions of the
reference's plot-based dataset tests (tests/test_spr_data.py /
test_gpr_data.py, which assert nothing and are judged by eye; SURVEY §4
requires converting them to NRMSE bars).

Runs on the CPU x64 conftest platform with a reduced-but-representative
synthetic flame dataset (full 165258-row scale is exercised by bench.py on
TPU)."""

import numpy as np
import pytest

from openmeasure_tpu import SPR, GPR
from openmeasure_tpu.datasets.synthetic import make_flame_dataset
from openmeasure_tpu.utils.metrics import nrmse, nrmse_per_feature


@pytest.fixture(scope="module")
def flame():
    return make_flame_dataset(n_cells=3000, n_features=9, m_train=41,
                              m_test=4, seed=0)


class TestSPRFlame:
    def test_qr_ols_flow(self, flame):
        """README flow: 14 sensors, OLS — reference test_spr_data.py:136-156."""
        spr = SPR(flame["X_train"], flame["n_features"], flame["xyz"])
        spr.fit(select_modes="number", n_modes=14)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)

        n_cells = flame["xyz"].shape[0]
        y = np.zeros((14, 3))
        y[:, 0] = C @ flame["X_test"][:, 3]
        y[:, 2] = np.argmax(C, axis=1) // n_cells
        a, _ = spr.predict(y)
        xp = np.asarray(spr.reconstruct(a))[:, 0]
        assert float(nrmse(xp, flame["X_test"][:, 3])) < 5e-3
        per_feat = nrmse_per_feature(xp, flame["X_test"][:, 3], 9)
        assert np.all(per_feat < 0.05)

    def test_qr_cols_flow_with_physical_limits(self, flame):
        """COLS with T∈[200,3000], Y∈[0,1]-style physical limits —
        reference test_spr_data.py:159-182."""
        lo = np.array([200.0] + [-10.0] * 8)
        hi = np.array([3000.0] + [10.0] * 8)
        spr = SPR(flame["X_train"], flame["n_features"], flame["xyz"])
        spr.fit(select_modes="number", n_modes=14)
        C = np.asarray(spr.optimal_placement())
        spr.train(C, method="COLS", limits=[lo, hi])

        n_cells = flame["xyz"].shape[0]
        ys = []
        for j in range(4):
            y = np.zeros((14, 3))
            y[:, 0] = C @ flame["X_test"][:, j]
            y[:, 2] = np.argmax(C, axis=1) // n_cells
            ys.append(y)
        a, _ = spr.predict(ys)
        xp = np.asarray(spr.reconstruct(a))
        assert float(nrmse(xp, flame["X_test"])) < 5e-3
        # reconstructed temperature within the physical band
        T = xp[:n_cells]
        assert T.min() >= 200.0 - 1e-3 and T.max() <= 3000.0 + 1e-3

    def test_variance_mode_selection(self, flame):
        spr = SPR(flame["X_train"], flame["n_features"], flame["xyz"])
        spr.fit(select_modes="variance", n_modes=99.99)
        assert 1 <= spr.r <= 41


class TestGPRFlame:
    @pytest.mark.slow
    def test_multitask_train_predict(self, flame):
        """MultiTask GPR flow — reference test_gpr_data.py:52-63."""
        gpr = GPR(flame["X_train"], flame["n_features"], flame["xyz"],
                  flame["P_train"], gpr_type="MultiTask")
        gpr.fit(select_modes="number", n_modes=8)
        gpr.train(max_iter=400)
        A, S = gpr.predict(flame["P_test"])
        Xp = np.asarray(gpr.reconstruct(A))
        # GP interpolation quality on random parameter draws: coarse bar
        assert float(nrmse(Xp, flame["X_test"])) < 0.15
        assert np.all(np.asarray(S) >= 0)

    @pytest.mark.slow
    def test_update_with_retrain(self, flame):
        """GPR.update + retrain — reference test_gpr_data.py:65-81."""
        gpr = GPR(flame["X_train"], flame["n_features"], flame["xyz"],
                  flame["P_train"], gpr_type="MultiTask")
        gpr.fit(select_modes="number", n_modes=6)
        gpr.train(max_iter=200)
        A_new, _ = gpr.predict(flame["P_test"][:2])
        gpr.update(flame["P_test"][:2], np.asarray(A_new), retrain=True)
        A, _ = gpr.predict(flame["P_test"])
        assert np.all(np.isfinite(np.asarray(A)))

    def test_constrained_gpr_prediction(self, flame):
        """Constrained MAP prediction — reference test_gpr_data.py:84-115."""
        gpr = GPR(flame["X_train"], flame["n_features"], flame["xyz"],
                  flame["P_train"], gpr_type="MultiTask")
        gpr.fit(select_modes="number", n_modes=6)
        gpr.train(max_iter=200)
        lo = np.array([200.0] + [-10.0] * 8)
        hi = np.array([3000.0] + [10.0] * 8)
        A, _ = gpr.predict(flame["P_test"], limits=[lo, hi])
        Xp = np.asarray(gpr.reconstruct(A))
        n_cells = flame["xyz"].shape[0]
        T = Xp[:n_cells]
        assert T.min() >= 200.0 - 1e-2 and T.max() <= 3000.0 + 1e-2


class TestPipelineEagerParity:
    """The benchmarked fast paths (`pipelines.*_end_to_end`, one XLA program
    each) must agree with the conformance-tested eager class API on the same
    data — reconstruction-level comparison (sign-invariant: the pipeline
    skips per-mode SVD sign canonicalization, which flips Vr and A
    consistently but leaves every reconstruction identical)."""

    def test_spr_pipeline_matches_eager(self, flame):
        import jax.numpy as jnp
        from openmeasure_tpu.pipelines import spr_end_to_end

        spr = SPR(flame["X_train"], flame["n_features"], flame["xyz"])
        spr.fit(select_modes="number", n_modes=14)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)
        n_cells = flame["xyz"].shape[0]
        ys = []
        for j in range(4):
            y = np.zeros((14, 3))
            y[:, 0] = C @ flame["X_test"][:, j]
            y[:, 2] = np.argmax(C, axis=1) // n_cells
            ys.append(y)
        a, _ = spr.predict(ys)
        X_eager = np.asarray(spr.reconstruct(a))

        res = spr_end_to_end(jnp.asarray(flame["X_train"]),
                             jnp.asarray(flame["X_test"]),
                             n_features=9, r=14)
        assert np.array_equal(np.sort(np.asarray(res.pivots)),
                              np.sort(np.argmax(C, axis=1)))
        scale = float(np.max(np.abs(X_eager)))
        assert np.allclose(np.asarray(res.X_rec), X_eager,
                           atol=1e-8 * scale)

    @pytest.mark.slow
    def test_gpr_pipeline_matches_eager(self, flame):
        import jax.numpy as jnp
        from openmeasure_tpu.pipelines import gpr_end_to_end

        gpr = GPR(flame["X_train"], flame["n_features"], flame["xyz"],
                  flame["P_train"])                     # SingleTask default
        gpr.fit(select_modes="number", n_modes=8)
        gpr.train(max_iter=300)
        A, _ = gpr.predict(flame["P_test"])
        X_eager = np.asarray(gpr.reconstruct(A))

        res = gpr_end_to_end(
            jnp.asarray(flame["X_train"]), jnp.asarray(flame["P_train"]),
            jnp.asarray(flame["P_test"]), jnp.asarray(flame["X_test"]),
            n_features=9, r=8, max_iter=300)
        scale = float(np.max(np.abs(X_eager)))
        assert np.allclose(np.asarray(res.X_rec), X_eager,
                           atol=1e-6 * scale)


class TestJittedGPRPipeline:
    def test_gpr_end_to_end_single_program(self, flame):
        import jax.numpy as jnp
        from openmeasure_tpu.pipelines import gpr_end_to_end
        res = gpr_end_to_end(
            jnp.asarray(flame["X_train"]), jnp.asarray(flame["P_train"]),
            jnp.asarray(flame["P_test"]), jnp.asarray(flame["X_test"]),
            n_features=9, r=8, max_iter=300)
        assert float(res.nrmse) < 0.15
        assert np.all(np.isfinite(np.asarray(res.gp_loss)))
        assert np.asarray(res.A_sigma).min() >= 0
