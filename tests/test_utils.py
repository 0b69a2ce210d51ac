"""Utils tier: metrics, checkpoint round-trips, configs, logging."""

import logging

import numpy as np
import pytest

from openmeasure_tpu import ROM, SPR, GPR
from openmeasure_tpu.utils import metrics
from openmeasure_tpu.utils.checkpoint import save_model, load_model
from openmeasure_tpu.utils.logging import timed, set_verbosity, logger
from openmeasure_tpu.core.config import (FitConfig, GPTrainConfig,
                                         SolverConfig)


class TestMetrics:
    def test_nrmse(self):
        x = np.array([0.0, 1.0, 2.0])
        np.testing.assert_allclose(metrics.nrmse(x, x), 0.0)
        np.testing.assert_allclose(
            metrics.rmse(x + 1.0, x), 1.0)
        np.testing.assert_allclose(
            metrics.nrmse(x + 1.0, x), 0.5)

    def test_r2_and_mae(self):
        rng = np.random.default_rng(0)
        x = rng.random(100)
        np.testing.assert_allclose(metrics.r2(x, x), 1.0)
        assert metrics.mae(x + 0.1, x) == pytest.approx(0.1)

    def test_nrmse_per_feature(self):
        x_true = np.concatenate([np.linspace(0, 1, 10),
                                 np.linspace(0, 100, 10)])
        x_pred = x_true.copy()
        x_pred[:10] += 0.1    # 10% of feature-0 range
        x_pred[10:] += 10.0   # 10% of feature-1 range
        out = metrics.nrmse_per_feature(x_pred, x_true, 2)
        np.testing.assert_allclose(out, [0.1, 0.1], rtol=1e-6)


class TestCheckpoint:
    def setup_method(self, method):
        rng = np.random.default_rng(1)
        self.X = rng.random((20, 6))
        self.xyz = rng.random((10, 3))

    def test_rom_roundtrip(self, tmp_path):
        rom = ROM(self.X, 2, self.xyz)
        rom.fit(select_modes="number", n_modes=3)
        x_rec = np.asarray(rom.reconstruct(np.asarray(rom.Ar)[0]))

        path = str(tmp_path / "rom.npz")
        save_model(rom, path)
        rom2 = load_model(path)
        x_rec2 = np.asarray(rom2.reconstruct(np.asarray(rom2.Ar)[0]))
        np.testing.assert_allclose(x_rec2, x_rec, rtol=1e-12)

    def test_spr_roundtrip(self, tmp_path):
        spr = SPR(self.X, 2, self.xyz)
        spr.fit(select_modes="number", n_modes=4)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)
        y = np.zeros((4, 3))
        y[:, 0] = C @ self.X[:, 1]
        y[:, 2] = (np.argmax(C, axis=1) // 10)
        a, _ = spr.predict(y)

        path = str(tmp_path / "spr.npz")
        save_model(spr, path)
        spr2 = load_model(path)
        a2, _ = spr2.predict(y)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a), rtol=1e-10)

    def test_spr_sparse_C_roundtrip(self, tmp_path):
        import scipy.sparse as sp
        spr = SPR(self.X, 2, self.xyz)
        spr.fit(select_modes="number", n_modes=3)
        C = sp.csr_matrix(np.asarray(spr.optimal_placement()))
        spr.train(C)
        path = str(tmp_path / "spr_sp.npz")
        save_model(spr, path)
        spr2 = load_model(path)
        assert sp.issparse(spr2.C)
        np.testing.assert_array_equal(spr2.C.toarray(), C.toarray())

    def test_spr_solver_knobs_roundtrip(self, tmp_path):
        """Tuned admm_max_iter/admm_tol must survive the round trip (the
        old back-compat guard clobbered them to defaults on every load)."""
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        rng = np.random.default_rng(0)
        X = rng.random((30, 6))
        spr = SPR(X, 2, rng.random((15, 3)))
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement())
        spr.train(C, method="COLS", limits=[[0.0, 0.0], [1.0, 1.0]],
                  admm_max_iter=123, admm_tol=1e-4)
        p = str(tmp_path / "knobs.npz")
        save_model(spr, p)
        loaded = load_model(p)
        assert loaded.admm_max_iter == 123
        assert loaded.admm_tol == 1e-4

    def test_streaming_spr_constraints_roundtrip(self, tmp_path):
        """StreamingSPR checkpoints map onto SPR at load — the SPR-only
        attribute fixups must apply to them too (previously
        AttributeError: 'limits' at the first predict)."""
        import numpy as np
        from openmeasure_tpu import StreamingSPR
        from openmeasure_tpu.streaming import ArrayStore
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        rng = np.random.default_rng(1)
        X = rng.random((30, 6)) + 0.5
        spr = StreamingSPR(ArrayStore(X), 2, rng.random((15, 3)),
                           dtype=np.float64)
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)
        p = str(tmp_path / "sspr.npz")
        save_model(spr, p)
        loaded = load_model(p)
        rows = np.argmax(C, axis=1)
        y = np.zeros((3, 3))
        y[:, 0] = X[rows, 1]
        a, _ = loaded.predict(y)        # needs limits/constraints defaults
        assert np.all(np.isfinite(np.asarray(a)))

    def test_zero_mean_gpr_roundtrip(self, tmp_path):
        """An empty params subtree (ZeroMean) must survive flatten/
        unflatten — dropping it loses the 'mean' key and predict crashes."""
        import numpy as np
        from openmeasure_tpu import GPR
        from openmeasure_tpu.gp import kernels as K
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        rng = np.random.default_rng(2)
        X = rng.random((20, 8))
        P = np.linspace(0, 1, 8)[:, None]
        g = GPR(X, 2, rng.random((10, 3)), P)
        g.fit(select_modes="number", n_modes=2)
        g.train(mean=K.ZeroMean(), max_iter=10)
        p = str(tmp_path / "zm.npz")
        save_model(g, p)
        loaded = load_model(p)
        A, _ = loaded.predict(np.array([[0.35]]))
        assert np.all(np.isfinite(np.asarray(A)))

    def test_suffixless_path_roundtrip(self, tmp_path):
        import numpy as np
        from openmeasure_tpu import ROM
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        rng = np.random.default_rng(3)
        rom = ROM(rng.random((20, 5)), 2, None)
        rom.fit(select_modes="number", n_modes=2)
        p = str(tmp_path / "model_no_ext")     # no .npz
        save_model(rom, p)
        loaded = load_model(p)                 # same string must work
        assert loaded.r == 2

    def test_unfitted_save_raises(self):
        import numpy as np
        import pytest as _pt
        from openmeasure_tpu import ROM
        from openmeasure_tpu.utils.checkpoint import save_model
        rom = ROM(np.random.default_rng(0).random((20, 5)), 2, None)
        with _pt.raises(ValueError, match="fit"):
            save_model(rom, "/tmp/never_written.npz")

    def test_unregistered_spec_raises_at_save(self, tmp_path):
        import dataclasses
        import numpy as np
        import pytest as _pt
        import jax.numpy as jnp
        from openmeasure_tpu import GPR
        from openmeasure_tpu.gp import kernels as K
        from openmeasure_tpu.utils.checkpoint import save_model

        @dataclasses.dataclass(frozen=True)
        class MyMean:
            def init_params(self, d):
                return {"constant": jnp.zeros(())}

            def __call__(self, params, X):
                return jnp.broadcast_to(params["constant"], (X.shape[0],))

        rng = np.random.default_rng(4)
        g = GPR(rng.random((20, 8)), 2, rng.random((10, 3)),
                np.linspace(0, 1, 8)[:, None])
        g.fit(select_modes="number", n_modes=2)
        g.train(mean=MyMean(), max_iter=5)
        with _pt.raises(ValueError, match="unregistered spec"):
            save_model(g, str(tmp_path / "custom.npz"))

    def test_gpr_roundtrip(self, tmp_path):
        P = np.linspace(0, 1, 6)[:, None]
        gpr = GPR(self.X, 2, self.xyz, P)
        gpr.fit(select_modes="number", n_modes=2)
        gpr.train(max_iter=50)
        P_star = np.array([[0.25], [0.85]])
        A, S = gpr.predict(P_star)

        path = str(tmp_path / "gpr.npz")
        save_model(gpr, path)
        gpr2 = load_model(path)
        A2, S2 = gpr2.predict(P_star)
        np.testing.assert_allclose(np.asarray(A2), np.asarray(A), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(S2), np.asarray(S), rtol=1e-8)

    def test_gpr_multitask_roundtrip(self, tmp_path):
        P = np.linspace(0, 1, 6)[:, None]
        gpr = GPR(self.X, 2, self.xyz, P, gpr_type="MultiTask")
        gpr.fit(select_modes="number", n_modes=2)
        gpr.train(max_iter=50)
        A, _ = gpr.predict(np.array([[0.4]]))
        path = str(tmp_path / "gpr_mt.npz")
        save_model(gpr, path)
        gpr2 = load_model(path)
        A2, _ = gpr2.predict(np.array([[0.4]]))
        np.testing.assert_allclose(np.asarray(A2), np.asarray(A), rtol=1e-8)


class TestConfigLogging:
    def setup_method(self):
        rng = np.random.default_rng(7)
        self.X = rng.random((20, 6))
        self.xyz = rng.random((10, 3))

    def test_config_defaults_match_reference(self):
        assert FitConfig().scale_type == "std"
        assert FitConfig().n_modes == 99
        assert GPTrainConfig().max_iter == 1000
        assert GPTrainConfig().rel_error == 1e-5
        assert GPTrainConfig().lr == 0.1
        assert SolverConfig().tol == 1e-9

    def test_fit_config_threads_through_rom(self):
        from openmeasure_tpu import ROM
        rom_cfg = ROM(self.X, 2, self.xyz)
        rom_cfg.fit(config=FitConfig(scale_type="pareto",
                                     select_modes="number", n_modes=3))
        rom_kw = ROM(self.X, 2, self.xyz)
        rom_kw.fit(scale_type="pareto", select_modes="number", n_modes=3)
        assert rom_cfg.r == 3 and rom_cfg.scale_type == "pareto"
        np.testing.assert_array_equal(np.asarray(rom_cfg.Ur),
                                      np.asarray(rom_kw.Ur))

    def test_train_config_threads_through_gpr(self):
        P = np.linspace(0, 1, 6)[:, None]
        gpr = GPR(self.X, 2, self.xyz, P)
        gpr.fit(config=FitConfig(select_modes="number", n_modes=2))
        gpr.train(config=GPTrainConfig(max_iter=7, lr=0.05))
        assert gpr.max_iter == 7 and gpr.lr == 0.05 and gpr.r == 2

    def test_placement_and_solver_config_thread_through_spr(self):
        from openmeasure_tpu import SPR
        from openmeasure_tpu.core.config import PlacementConfig
        spr = SPR(self.X, 2, self.xyz)
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement(
            config=PlacementConfig(calc_type="dg", n_sensors=5)))
        assert C.shape[0] == 5  # calc_type='qr' would give r=3 rows
        spr.train(C, solver_config=SolverConfig(max_iter=123, tol=1e-7,
                                                over_relax=1.2))
        assert spr.admm_max_iter == 123 and spr.admm_tol == 1e-7
        assert spr.admm_over_relax == 1.2

    def test_cokriging_config_threads_through(self):
        from openmeasure_tpu import CoKriging
        from openmeasure_tpu.core.config import CoKrigingConfig
        rng = np.random.default_rng(0)
        ck = CoKriging(rng.random((3, 1)), rng.random((4, 1)),
                       rng.random((8, 3)), rng.random((8, 4)),
                       rng.random((8, 3)), self.xyz, self.xyz, 2,
                       config=CoKrigingConfig(regr_type="constant",
                                              tol=1e-4))
        assert ck.regr_type == "constant" and ck.tol == 1e-4

    def test_timed_logs(self, caplog):
        set_verbosity(logging.INFO)
        with caplog.at_level(logging.INFO, logger="openmeasure_tpu"):
            with timed("unit-test-block"):
                pass
        assert any("unit-test-block" in r.message for r in caplog.records)
        set_verbosity(logging.WARNING)


class TestFlameLoader:
    def test_synthetic_fallback(self, tmp_path):
        from openmeasure_tpu.datasets.flame import load_flame_dataset
        out = load_flame_dataset(str(tmp_path))
        assert out["synthetic"] is True
        assert out["X_train"].shape[1] == 41

    def test_real_layout(self, tmp_path):
        import numpy as np
        from openmeasure_tpu.datasets.flame import load_flame_dataset
        n_cells, nf = 50, 2
        np.save(tmp_path / "X_2D_train.npy",
                np.random.rand(n_cells * nf, 5))
        np.save(tmp_path / "X_2D_test.npy", np.random.rand(n_cells * nf, 2))
        np.save(tmp_path / "xz.npy", np.random.rand(n_cells, 2))
        np.savetxt(tmp_path / "parameters_train.csv",
                   np.random.rand(6, 3), delimiter=",",
                   header="D,H2,phi")
        np.savetxt(tmp_path / "parameters_test.csv",
                   np.random.rand(3, 3), delimiter=",",
                   header="D,H2,phi")
        out = load_flame_dataset(str(tmp_path))
        assert out["synthetic"] is False
        assert out["n_features"] == nf
        assert out["xyz"].shape == (n_cells, 3)

    def test_strict_raises(self, tmp_path):
        import pytest as _pytest
        from openmeasure_tpu.datasets.flame import load_flame_dataset
        with _pytest.raises(FileNotFoundError):
            load_flame_dataset(str(tmp_path),
                               allow_synthetic_fallback=False)


class TestServing:
    def test_soft_sensor_matches_spr(self, tmp_path):
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        from openmeasure_tpu.utils.checkpoint import save_model
        rng = np.random.default_rng(2)
        X = rng.random((30, 6))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=4)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)
        rows = np.argmax(C, axis=1)
        y = np.zeros((4, 3))
        y[:, 0] = X[rows, 1]
        y[:, 2] = rows // 15
        a_ref, _ = spr.predict(y)
        x_ref = np.asarray(spr.reconstruct(a_ref))[:, 0]

        sensor = SoftSensor.from_spr(spr, dtype=np.float64).warmup()
        x = np.asarray(sensor(y[:, 0]))
        np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)

        # weighted path
        x2, a2, s2 = sensor.predict_full(y[:, 0],
                                         0.3 * np.ones(4))
        assert np.all(np.asarray(s2) > 0)

        # checkpoint round trip
        path = str(tmp_path / "s.npz")
        save_model(spr, path)
        sensor2 = SoftSensor.load(path, dtype=np.float64)
        np.testing.assert_allclose(np.asarray(sensor2(y[:, 0])), x_ref,
                                   rtol=1e-8, atol=1e-10)

    def _small_sensor(self, seed=2):
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        rng = np.random.default_rng(seed)
        X = rng.random((30, 6))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=4)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)
        rows = np.argmax(C, axis=1)
        return SoftSensor.from_spr(spr, dtype=np.float64), X, rows

    def test_predict_full_validates_shape(self):
        import numpy as np
        import pytest as _pt
        sensor, X, rows = self._small_sensor()
        with _pt.raises(ValueError, match="y_values must be"):
            sensor(3.7)                       # scalar must not broadcast
        with _pt.raises(ValueError, match="y_values must be"):
            sensor(np.array([3.7]))           # nor a length-1 vector
        # scalar sigma broadcast is fine (documented convenience)
        x, a, s = sensor.predict_full(X[rows, 1], 0.1)
        assert np.all(np.isfinite(np.asarray(x)))

    def test_nan_sigma_propagates_like_eager(self):
        """A NaN sigma must propagate (reference W=1/sig semantics), not
        silently take the maximum weight."""
        import numpy as np
        sensor, X, rows = self._small_sensor()
        sig = np.array([np.nan, 0.1, 0.1, 0.1])
        x, a, s = sensor.predict_full(X[rows, 1], sig)
        assert np.all(np.isnan(np.asarray(a)))

    def test_double_shard_keeps_original_n(self):
        """Re-sharding an already-sharded sensor must slice outputs to the
        ORIGINAL n, not the first shard's padded row count."""
        import numpy as np
        import jax
        from jax.sharding import Mesh
        sensor, X, rows = self._small_sensor()
        mesh_a = Mesh(np.array(jax.devices()[:4]).reshape(4), ("state",))
        mesh_b = Mesh(np.array(jax.devices()[:8]).reshape(8), ("state",))
        twice = sensor.shard(mesh_a).shard(mesh_b)   # n=30: pads both times
        x0 = np.asarray(sensor(X[rows, 1]))
        x2 = np.asarray(twice(X[rows, 1]))
        assert x2.shape == x0.shape == (30,)
        np.testing.assert_allclose(x2, x0, rtol=1e-6)

    def test_duplicate_coo_entries_not_treated_as_one_hot(self):
        """Raw COO duplicates that SUM to a non-unit row value must not
        pass the one-hot detection (silently wrong scaling); they require
        feature_ids like any general C."""
        import numpy as np
        import scipy.sparse as sp
        import pytest as _pt
        from openmeasure_tpu.serving import _measurement_scaling
        C = sp.coo_matrix((np.ones(2), ([0, 0], [3, 3])), shape=(1, 30))
        X_cnt = np.arange(30.0)
        X_scl = np.ones(30)
        with _pt.raises(ValueError, match="feature_ids"):
            _measurement_scaling(C, X_cnt, X_scl, 15)

    def test_soft_sensor_weighted_zero_sigma_matches_spr(self):
        """A σ=0 entry inside an otherwise-weighted vector must get the same
        (largest-finite) weight in serving as in SPR.predict — the served
        model reproduces the trained model's weighted solve exactly."""
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        rng = np.random.default_rng(21)
        X = rng.random((30, 6))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=4)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)
        rows = np.argmax(C, axis=1)
        y = np.zeros((4, 3))
        y[:, 0] = X[rows, 1] + 0.01 * rng.standard_normal(4)
        y[:, 1] = np.array([0.1, 0.0, 0.3, 0.2])   # one exact measurement
        y[:, 2] = rows // 15
        a_ref, s_ref = spr.predict(y)
        x_ref = np.asarray(spr.reconstruct(a_ref))[:, 0]

        sensor = SoftSensor.from_spr(spr, dtype=np.float64).warmup()
        x, a, s = sensor.predict_full(y[:, 0], y[:, 1])
        np.testing.assert_allclose(np.asarray(x), x_ref,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref)[0],
                                   rtol=1e-8, atol=1e-12)

    def test_soft_sensor_negative_sigma_matches_spr(self):
        """Malformed (negative-sigma) input takes the SAME path in serving
        as in SPR.predict: the weighted branch triggers on any NONZERO
        sigma (the eager `np.any(yi[:, 1])` test), not on `> 0`."""
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        rng = np.random.default_rng(33)
        X = rng.random((30, 6))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=4)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)
        rows = np.argmax(C, axis=1)
        y = np.zeros((4, 3))
        y[:, 0] = X[rows, 1] + 0.01 * rng.standard_normal(4)
        # a mixed vector where one sigma is NEGATIVE: eager treats it like
        # an exact measurement (largest finite weight); serving must agree
        y[:, 1] = np.array([0.1, -0.2, 0.3, 0.2])
        y[:, 2] = rows // 15
        a_ref, s_ref = spr.predict(y)
        x_ref = np.asarray(spr.reconstruct(a_ref))[:, 0]

        sensor = SoftSensor.from_spr(spr, dtype=np.float64).warmup()
        x, a, s = sensor.predict_full(y[:, 0], y[:, 1])
        np.testing.assert_allclose(np.asarray(x), x_ref,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref)[0],
                                   rtol=1e-8, atol=1e-12)

    def test_soft_sensor_cols_limits_roundtrip(self, tmp_path):
        """Serving the constrained model: COLS SoftSensor matches
        SPR.predict(COLS), survives a checkpoint round-trip, and respects
        the physical limits (VERDICT r1 item 5)."""
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        from openmeasure_tpu.utils.checkpoint import save_model
        rng = np.random.default_rng(9)
        X = rng.random((30, 6))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement())
        limits = [np.array([-0.4, -0.4]), np.array([1.3, 1.3])]
        spr.train(C, method="COLS", limits=limits,
                  admm_max_iter=3000, admm_tol=1e-11)
        rows = np.argmax(C, axis=1)
        y = np.zeros((3, 3))
        y[:, 0] = 3.0 * X[rows, 1]     # overshoot -> constraints active
        y[:, 2] = rows // 15
        a_ref, _ = spr.predict(y)
        x_ref = np.asarray(spr.reconstruct(a_ref))[:, 0]

        sensor = SoftSensor.from_spr(spr, dtype=np.float64,
                                     admm_iters=3000).warmup()
        assert sensor.method == "COLS"
        x = np.asarray(sensor(y[:, 0]))
        np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-7)
        # physical limits hold feature-blockwise
        assert x[:15].max() <= 1.3 + 1e-5 and x[:15].min() >= -0.4 - 1e-5

        path = str(tmp_path / "cols.npz")
        save_model(spr, path)
        sensor2 = SoftSensor.load(path, dtype=np.float64, admm_iters=3000)
        assert sensor2.method == "COLS"
        np.testing.assert_allclose(np.asarray(sensor2(y[:, 0])), x_ref,
                                   rtol=1e-6, atol=1e-7)

    def test_soft_sensor_cols_general_constraints(self, tmp_path):
        """A general constraint set (box + equality pin) carries through
        train -> checkpoint -> serving."""
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        from openmeasure_tpu.linalg import boxls as _boxls
        from openmeasure_tpu.utils.checkpoint import save_model
        rng = np.random.default_rng(10)
        X = rng.random((30, 6))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement())
        Ur = np.asarray(spr.Ur)
        pin = float(np.asarray(spr.X0)[7, 1]) * 0.5
        cs = [_boxls.LinearConstraints(Ur, -5.0 * np.ones(30),
                                       5.0 * np.ones(30)),
              _boxls.LinearConstraints(Ur[7][None, :], np.array([pin]),
                                       np.array([pin]))]
        spr.train(C, method="COLS", constraints=cs,
                  admm_max_iter=5000, admm_tol=1e-12)
        rows = np.argmax(C, axis=1)
        y = np.zeros((3, 3)); y[:, 0] = X[rows, 1]; y[:, 2] = rows // 15

        path = str(tmp_path / "cols_cs.npz")
        save_model(spr, path)
        sensor = SoftSensor.load(path, dtype=np.float64, admm_iters=5000)
        x, a, _ = sensor.predict_full(y[:, 0])
        np.testing.assert_allclose(float(Ur[7] @ np.asarray(a)), pin,
                                   atol=1e-6)

    def test_soft_sensor_sparse_C_and_feature_ids(self, tmp_path):
        import numpy as np
        import scipy.sparse as sp
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        from openmeasure_tpu.utils.checkpoint import save_model
        rng = np.random.default_rng(4)
        X = rng.random((30, 6))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=4)
        C = sp.csr_matrix(np.asarray(spr.optimal_placement()))
        spr.train(C)
        rows = np.asarray(C.argmax(axis=1)).ravel()
        y = np.zeros((4, 3)); y[:, 0] = X[rows, 2]; y[:, 2] = rows // 15
        a_ref, _ = spr.predict(y)
        x_ref = np.asarray(spr.reconstruct(a_ref))[:, 0]

        path = str(tmp_path / "sp.npz")
        save_model(spr, path)
        sensor = SoftSensor.load(path, dtype=np.float64)
        np.testing.assert_allclose(np.asarray(sensor(y[:, 0])), x_ref,
                                   rtol=1e-8, atol=1e-10)

        # general (non-one-hot) C requires explicit feature_ids
        C2 = sp.csr_matrix(rng.random((5, 30)))
        spr.train(C2)
        import pytest as _pytest
        with _pytest.raises(ValueError):
            SoftSensor.from_spr(spr)
        s2 = SoftSensor.from_spr(spr, feature_ids=np.zeros(5, int),
                                 dtype=np.float64)
        y2 = np.asarray(C2 @ X[:, 0])
        out = np.asarray(s2(y2))
        assert out.shape == (30,) and np.all(np.isfinite(out))

    def test_soft_sensor_bcoo_C_roundtrip(self):
        """SPR.train accepts JAX BCOO measurement operators, so a
        BCOO-trained model must package into a SoftSensor too (one-hot
        detection has a BCOO analog; VERDICT r2 item 6)."""
        import numpy as np
        from jax.experimental import sparse as jsparse
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        rng = np.random.default_rng(17)
        X = rng.random((30, 6))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=4)
        Cd = np.asarray(spr.optimal_placement())
        C = jsparse.BCOO.fromdense(Cd)
        spr.train(C)
        rows = np.argmax(Cd, axis=1)
        y = np.zeros((4, 3)); y[:, 0] = X[rows, 2]; y[:, 2] = rows // 15
        a_ref, _ = spr.predict(y)
        x_ref = np.asarray(spr.reconstruct(a_ref))[:, 0]

        sensor = SoftSensor.from_spr(spr, dtype=np.float64).warmup()
        np.testing.assert_allclose(np.asarray(sensor(y[:, 0])), x_ref,
                                   rtol=1e-8, atol=1e-10)

        # general (non-one-hot) BCOO requires explicit feature_ids
        import pytest as _pytest
        C2 = jsparse.BCOO.fromdense(rng.random((5, 30))
                                    * (rng.random((5, 30)) < 0.3))
        spr.train(C2)
        with _pytest.raises(ValueError, match="feature_ids"):
            SoftSensor.from_spr(spr)
        s2 = SoftSensor.from_spr(spr, feature_ids=np.zeros(5, int),
                                 dtype=np.float64)
        y2 = np.asarray(C2 @ jnp_array(X[:, 0]))
        out = np.asarray(s2(y2))
        assert out.shape == (30,) and np.all(np.isfinite(out))


def jnp_array(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


class TestOrbaxBackend:
    def test_orbax_roundtrip(self, tmp_path):
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        rng = np.random.default_rng(8)
        X = rng.random((20, 5))
        xyz = rng.random((10, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)
        rows = np.argmax(C, axis=1)
        y = np.zeros((3, 3)); y[:, 0] = X[rows, 1]; y[:, 2] = rows // 10
        a_ref, _ = spr.predict(y)

        path = str(tmp_path / "ckpt_orbax")
        save_model(spr, path, backend="orbax")
        spr2 = load_model(path)
        a2, _ = spr2.predict(y)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a_ref),
                                   rtol=1e-10)

    def test_unknown_backend_raises(self, tmp_path):
        import pytest as _pytest
        from openmeasure_tpu import ROM
        from openmeasure_tpu.utils.checkpoint import save_model
        import numpy as np
        # non-constant data: the round-5 degenerate-scale guard rejects a
        # constant block at fit() — this test targets the backend check
        rom = ROM(np.arange(8.0).reshape(4, 2), 1, np.zeros((4, 3)))
        rom.fit(select_modes="number", n_modes=1)
        with _pytest.raises(ValueError):
            save_model(rom, str(tmp_path / "x"), backend="bogus")


@pytest.mark.slow
class TestCoKrigingCheckpoint:
    def test_roundtrip(self, tmp_path):
        import numpy as np
        from openmeasure_tpu import CoKriging
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        rng = np.random.default_rng(0)
        n_cells, nf, nl, nu = 40, 2, 8, 10
        X_l, X_u = rng.random((nl, 2)), rng.random((nu, 2))
        xyz = np.zeros((n_cells, 3))
        xyz[:, 0] = np.linspace(0, 1, n_cells)

        def field(P, lofi):
            out = np.zeros((nf * n_cells, len(P)))
            for j in range(len(P)):
                v = np.concatenate([
                    np.sin(2 * np.pi * xyz[:, 0] * (1 + P[j, 0])),
                    np.cos(np.pi * xyz[:, 0] * (2 + P[j, 1]))])
                out[:, j] = 0.6 * v + 0.1 if lofi else v
            return out

        ck = CoKriging(X_l, X_u, field(X_l, True), field(X_u, True),
                       field(X_l, False), xyz, xyz, nf)
        ck.manifold_alignment(n_modes_hf=99.9, n_modes_lf=99.9)
        ck.fit()
        X_test = rng.random((4, 2))
        Y1, M1 = ck.predict(X_test)

        path = str(tmp_path / "cok.npz")
        save_model(ck, path)
        ck2 = load_model(path)
        Y2, M2 = ck2.predict(X_test)
        np.testing.assert_allclose(Y2, Y1, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(M2, M1, rtol=1e-8, atol=1e-10)

    def test_unfit_raises(self, tmp_path):
        import numpy as np
        import pytest as _pytest
        from openmeasure_tpu import CoKriging
        from openmeasure_tpu.utils.checkpoint import save_model
        ck = CoKriging(np.zeros((2, 1)), np.zeros((3, 1)),
                       np.zeros((4, 2)), np.zeros((4, 3)), np.zeros((4, 2)),
                       np.zeros((2, 3)), np.zeros((2, 3)), 2)
        with _pytest.raises(ValueError):
            save_model(ck, str(tmp_path / "x"))


class TestServingBatch:
    def test_predict_batch_matches_per_request(self):
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        rng = np.random.default_rng(5)
        X = rng.random((30, 6))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=4)
        C = np.asarray(spr.optimal_placement())
        spr.train(C)
        rows = np.argmax(C, axis=1)
        sensor = SoftSensor.from_spr(spr, dtype=np.float64).warmup()

        B = 7
        Yv = X[rows, :1].T + 0.02 * rng.standard_normal((B, 4))
        Ys = np.abs(0.1 * rng.standard_normal((B, 4)))
        Ys[2] = 0.0                              # one unweighted request
        xb, ab, sb = sensor.predict_batch(Yv, Ys)
        assert xb.shape == (B, 30) and ab.shape == (B, 4)
        for i in range(B):
            xi, ai, si = sensor.predict_full(Yv[i], Ys[i])
            np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xi),
                                       rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(np.asarray(sb[i]), np.asarray(si),
                                       rtol=1e-10, atol=1e-12)

    def test_predict_batch_cols(self):
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        rng = np.random.default_rng(6)
        X = rng.random((30, 6))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement())
        limits = [np.array([-0.4, -0.4]), np.array([1.3, 1.3])]
        spr.train(C, method="COLS", limits=limits, admm_max_iter=2000)
        rows = np.argmax(C, axis=1)
        sensor = SoftSensor.from_spr(spr, dtype=np.float64,
                                     admm_iters=2000)
        Yv = 3.0 * X[rows, :2].T
        xb, ab, _ = sensor.predict_batch(Yv)
        for i in range(2):
            xi = np.asarray(sensor(Yv[i]))
            np.testing.assert_allclose(np.asarray(xb[i]), xi,
                                       rtol=1e-8, atol=1e-9)
        assert np.asarray(xb)[:, :15].max() <= 1.3 + 1e-5

    def test_predict_batch_validates_shape(self):
        import numpy as np
        import pytest as _pytest
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        rng = np.random.default_rng(7)
        spr = SPR(rng.random((30, 6)), 2, rng.random((15, 3)))
        spr.fit(select_modes="number", n_modes=4)
        spr.train(np.asarray(spr.optimal_placement()))
        sensor = SoftSensor.from_spr(spr)
        with _pytest.raises(ValueError, match="batch"):
            sensor.predict_batch(np.zeros((5,)))


class TestServingRobustness:
    def test_weighted_request_on_rank_deficient_theta_is_finite(self):
        """A masked placement can leave Theta singular; the QR-based
        weighted solve must return finite (regularized) output, not NaN."""
        import numpy as np
        from openmeasure_tpu.serving import SoftSensor
        rng = np.random.default_rng(12)
        n, r, s = 30, 3, 4
        Ur, _ = np.linalg.qr(rng.standard_normal((n, r)))
        Theta = Ur[:s].copy()
        Theta[:, 2] = Theta[:, 1]        # exactly rank-deficient
        sensor = SoftSensor(Ur, Theta, np.zeros(s), np.ones(s),
                            np.zeros(n), np.ones(n), dtype=np.float64)
        x, a, sig = sensor.predict_full(rng.standard_normal(s),
                                        0.1 * np.ones(s))
        assert np.all(np.isfinite(np.asarray(x)))
        assert np.all(np.isfinite(np.asarray(sig)))

    def test_tiny_scale_theta_not_over_regularized(self):
        """The rank-deficiency floor scales with max|diag(R)| only: a
        legitimately tiny-scale weighted system (all entries ~1e-8 in fp32)
        must solve accurately instead of having every diagonal floored to
        an absolute eps-level constant."""
        import numpy as np
        from openmeasure_tpu.serving import SoftSensor
        rng = np.random.default_rng(14)
        n, r, s = 30, 3, 5
        Ur, _ = np.linalg.qr(rng.standard_normal((n, r)))
        Theta = 1e-8 * rng.standard_normal((s, r))     # well-conditioned, tiny
        sensor = SoftSensor(Ur, Theta, np.zeros(s), np.ones(s),
                            np.zeros(n), np.ones(n), dtype=np.float32)
        yv = 1e-8 * rng.standard_normal(s)
        sig = 0.5 * np.ones(s)                          # weighted path
        _, a, _ = sensor.predict_full(yv.astype(np.float32),
                                      sig.astype(np.float32))
        w = 1.0 / sig
        a64, *_ = np.linalg.lstsq(Theta * w[:, None], w * yv, rcond=None)
        scale = np.max(np.abs(a64))
        assert np.max(np.abs(np.asarray(a, np.float64) - a64)) / scale < 1e-4

    def test_over_relax_carries_into_serving(self):
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import SoftSensor
        rng = np.random.default_rng(13)
        spr = SPR(rng.random((30, 6)), 2, rng.random((15, 3)))
        spr.fit(select_modes="number", n_modes=3)
        C = np.asarray(spr.optimal_placement())
        spr.train(C, method="COLS",
                  limits=[np.array([-1.0, -1.0]), np.array([2.0, 2.0])],
                  admm_over_relax=1.3)
        sensor = SoftSensor.from_spr(spr)
        assert sensor.admm_over_relax == 1.3


class TestServingCompileSharing:
    def test_same_shape_models_share_compilation(self):
        """Model state is an argument of the shared jitted kernels, so a
        reloaded same-shape model (blue/green deploy, periodic retrain)
        reuses the existing compilation instead of re-jitting."""
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu import serving as S

        def make(seed):
            rng = np.random.default_rng(seed)
            spr = SPR(rng.random((30, 6)), 2, rng.random((15, 3)))
            spr.fit(select_modes="number", n_modes=4)
            spr.train(np.asarray(spr.optimal_placement()))
            return S.SoftSensor.from_spr(spr, dtype=np.float64)

        s1 = make(1).warmup()
        size_after_first = S._predict_one._cache_size()
        s2 = make(2).warmup()                     # different model, same shapes
        assert S._predict_one._cache_size() == size_after_first
        # and the two models still produce their own (different) answers
        y = np.linspace(0.1, 0.4, 4)
        x1 = np.asarray(s1(y))
        x2 = np.asarray(s2(y))
        assert not np.allclose(x1, x2)


class TestProfilerAndViz:
    def test_device_trace_noop_and_raises_guard(self, tmp_path):
        from openmeasure_tpu.utils.logging import device_trace
        with device_trace(None):        # no-op path
            pass
        # a real trace dir exercises the start/stop pair end to end
        with device_trace(str(tmp_path / "trace")):
            import jax.numpy as jnp
            _ = jnp.zeros((4,)) + 1.0

    def test_generate_camera_requires_pyvista(self):
        import numpy as np
        import pytest as _pytest
        from openmeasure_tpu.ctc import camera
        cam = camera(np.array([0, 0, 1.0, 1.0]), np.zeros(3), 0.05, 2.8,
                     0.06, np.array([4, 4]), 1e-3)
        try:
            import pyvista  # noqa: F401
            has_pv = True
        except ImportError:
            has_pv = False
        if has_pv:
            assert cam.generate_camera() is not None
        else:
            with _pytest.raises(ImportError, match="pyvista"):
                cam.generate_camera()


@pytest.mark.slow
class TestGPRSensor:
    def _trained_gpr(self, seed=3, gpr_type="SingleTask"):
        import numpy as np
        from openmeasure_tpu import GPR
        rng = np.random.default_rng(seed)
        X = rng.random((30, 8))
        P = np.linspace(0, 1, 8)[:, None] + 0.01 * rng.random((8, 1))
        gpr = GPR(X, 2, rng.random((15, 3)), P, gpr_type=gpr_type)
        gpr.fit(select_modes="number", n_modes=3)
        gpr.train(max_iter=60)
        return gpr

    @pytest.mark.parametrize("gpr_type", ["SingleTask", "MultiTask"])
    def test_matches_eager_predict_reconstruct(self, gpr_type):
        import numpy as np
        from openmeasure_tpu.serving import GPRSensor
        gpr = self._trained_gpr(gpr_type=gpr_type)
        P_star = np.array([[0.25], [0.8]])
        A_ref, S_ref = gpr.predict(P_star)
        X_ref = np.asarray(gpr.reconstruct(A_ref))       # (n, q)

        sensor = GPRSensor.from_gpr(gpr).warmup(batch=2)
        fields, A, A_sigma = sensor(P_star)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(A_sigma), np.asarray(S_ref),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(fields), X_ref.T,
                                   rtol=1e-8, atol=1e-10)

    def test_pigpr_serves_through_gprsensor(self):
        """The physics-informed family packages through the same sensor:
        a trained PIGPR IS a MultiTask GPR at serving time (the added loss
        only shapes training), so from_gpr must reproduce its eager
        predict+reconstruct."""
        import numpy as np
        import jax.numpy as jnp
        from openmeasure_tpu import PIGPR
        from openmeasure_tpu.serving import GPRSensor
        rng = np.random.default_rng(11)
        X = rng.random((30, 8))
        P = np.linspace(0, 1, 8)[:, None] + 0.01 * rng.random((8, 1))
        P_cstr = np.array([[0.5]])
        n_train = P.shape[0]

        def added_loss(ctx):
            V = ctx["output"].mean[n_train:]
            return -0.1 * jnp.mean(V ** 2)

        pig = PIGPR(X, 2, rng.random((15, 3)), P, P_cstr, added_loss)
        pig.fit(select_modes="number", n_modes=3)
        pig.train(max_iter=60)

        P_star = np.array([[0.25], [0.8]])
        A_ref, _ = pig.predict(P_star)
        X_ref = np.asarray(pig.reconstruct(A_ref))
        sensor = GPRSensor.from_gpr(pig)
        fields, A, _ = sensor(P_star)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(fields), X_ref.T,
                                   rtol=1e-8, atol=1e-10)

    def test_same_shape_models_share_compilation(self):
        import numpy as np
        from openmeasure_tpu import serving as S
        g1 = self._trained_gpr(seed=3)
        g2 = self._trained_gpr(seed=4)
        s1 = S.GPRSensor.from_gpr(g1).warmup()
        size = S._gpr_predict_kernel._cache_size()
        s2 = S.GPRSensor.from_gpr(g2).warmup()
        assert S._gpr_predict_kernel._cache_size() == size
        P = np.array([[0.5]])
        assert not np.allclose(np.asarray(s1(P)[0]), np.asarray(s2(P)[0]))

    def test_checkpoint_load(self, tmp_path):
        import numpy as np
        from openmeasure_tpu.serving import GPRSensor
        gpr = self._trained_gpr()
        path = str(tmp_path / "g.npz")
        save_model(gpr, path)
        sensor = GPRSensor.load(path)
        P_star = np.array([[0.4]])
        A_ref, _ = gpr.predict(P_star)
        _, A, _ = sensor(P_star)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                                   rtol=1e-8, atol=1e-10)

    def test_validates_shape_and_untrained(self):
        import numpy as np
        import pytest as _pytest
        from openmeasure_tpu import GPR
        from openmeasure_tpu.serving import GPRSensor
        rng = np.random.default_rng(9)
        gpr = GPR(rng.random((30, 8)), 2, rng.random((15, 3)),
                  np.linspace(0, 1, 8)[:, None])
        with _pytest.raises(AttributeError, match="fit"):
            GPRSensor.from_gpr(gpr)
        gpr.fit(select_modes="number", n_modes=2)
        # fitted but NOT trained: the message must point at train(), not fit
        with _pytest.raises(AttributeError, match="train"):
            GPRSensor.from_gpr(gpr)
        trained = self._trained_gpr()
        sensor = GPRSensor.from_gpr(trained)
        with _pytest.raises(ValueError, match="batch"):
            sensor(np.zeros((2, 5)))

    def test_constrained_sensor_matches_eager_predict(self):
        """The baked whitened-ADMM MAP (limits box + bc pin) reproduces the
        eager `GPR.predict(limits=..., bc=...)` path (VERDICT r2 item 6)."""
        import numpy as np
        from openmeasure_tpu.serving import GPRSensor
        gpr = self._trained_gpr(seed=5, gpr_type="MultiTask")
        X = np.asarray(gpr.X)
        limits = [np.array([X[:15].min(), X[15:].min()]) + 0.05,
                  np.array([X[:15].max(), X[15:].max()]) - 0.05]
        pin_row = 4
        pin_val = np.array([float(X[pin_row].mean())])
        P_star = np.array([[0.15], [0.55], [0.9]])
        A_ref, S_ref = gpr.predict(
            P_star, limits=limits, bc=([pin_row], pin_val[:, None]
                                       * np.ones((1, 3))),
            max_iter=4000, tol=0.0)

        sensor = GPRSensor.from_gpr(gpr, limits=limits,
                                    bc=([pin_row], pin_val),
                                    admm_iters=4000).warmup(batch=3)
        assert sensor.constrained
        fields, A, A_sigma = sensor(P_star)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                                   rtol=1e-6, atol=1e-8)
        # sigma is untouched by the MAP (same as eager)
        np.testing.assert_allclose(np.asarray(A_sigma), np.asarray(S_ref),
                                   rtol=1e-8, atol=1e-10)
        # the pin actually holds on the served field
        np.testing.assert_allclose(np.asarray(fields)[:, pin_row],
                                   pin_val[0] * np.ones(3), atol=1e-4)

    def test_constrained_sensor_validation(self):
        import numpy as np
        import pytest as _pytest
        from openmeasure_tpu.serving import GPRSensor
        from openmeasure_tpu.linalg import boxls as _boxls
        single = self._trained_gpr(seed=6, gpr_type="SingleTask")
        with _pytest.raises(NotImplementedError, match="MultiTask"):
            GPRSensor.from_gpr(single, limits=[np.array([-1.0, -1.0]),
                                               np.array([2.0, 2.0])])
        multi = self._trained_gpr(seed=6, gpr_type="MultiTask")
        # batched (per-request) bounds cannot be baked into a server
        A_c = np.asarray(multi.Ur) * np.asarray(multi.Sigma_r)[None, :]
        batched = _boxls.LinearConstraints(
            A_c, -np.ones((2, 30)), np.ones((2, 30)))
        with _pytest.raises(ValueError, match="batched"):
            GPRSensor.from_gpr(multi, constraints=batched)
        # per-request batched bc values are rejected too
        with _pytest.raises(ValueError, match="fixed"):
            GPRSensor.from_gpr(multi, bc=([1], np.ones((1, 2))))

    def test_pigpr_serves_through_gpr_sensor(self):
        """PIGPR is a MultiTask GPR subclass; its trained posterior serves
        through the same compiled kernel."""
        import numpy as np
        from openmeasure_tpu import PIGPR
        from openmeasure_tpu.serving import GPRSensor
        rng = np.random.default_rng(11)
        X = rng.random((30, 8))
        P = np.linspace(0, 1, 8)[:, None]
        P_cstr = np.linspace(0, 1, 5)[:, None]
        pigpr = PIGPR(X, 2, rng.random((15, 3)), P, P_cstr,
                      lambda ctx: 0.0)
        pigpr.fit(select_modes="number", n_modes=2)
        pigpr.train(max_iter=40)
        P_star = np.array([[0.3], [0.7]])
        A_ref, _ = pigpr.predict(P_star)
        sensor = GPRSensor.from_gpr(pigpr)
        _, A, _ = sensor(P_star)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.slow
class TestCoKrigingSensor:
    def _fitted_ck(self, seed=0):
        import numpy as np
        from openmeasure_tpu import CoKriging
        rng = np.random.default_rng(seed)
        nf, nc_hf, nc_lf = 2, 30, 20
        n_l, n_u = 6, 8
        xyz_hf = rng.random((nc_hf, 3))
        xyz_lf = rng.random((nc_lf, 3))
        X_l = rng.random((n_l, 2))
        X_u = rng.random((n_u, 2))

        def field(xyz, P):
            return np.stack([np.sin(3 * xyz[:, 0:1] * (1 + p[0]))
                             + p[1] * xyz[:, 1:2] for p in P],
                            axis=1)[:, :, 0]

        Y_hf_l = np.concatenate([field(xyz_hf, X_l),
                                 0.5 * field(xyz_hf, X_l)], axis=0)
        Y_lf_l = np.concatenate([field(xyz_lf, X_l) + 0.1,
                                 0.5 * field(xyz_lf, X_l)], axis=0)
        Y_lf_u = np.concatenate([field(xyz_lf, X_u) + 0.1,
                                 0.5 * field(xyz_lf, X_u)], axis=0)
        ck = CoKriging(X_l, X_u, Y_lf_l, Y_lf_u, Y_hf_l, xyz_lf, xyz_hf, nf)
        ck.manifold_alignment(select_modes="number", n_modes_hf=3,
                              n_modes_lf=3)
        ck.fit()
        return ck

    def test_matches_eager_predict(self):
        import numpy as np
        from openmeasure_tpu.serving import CoKrigingSensor
        ck = self._fitted_ck()
        X_test = np.random.default_rng(5).random((4, 2))
        Yp_ref, Ym_ref = ck.predict(X_test)
        sensor = CoKrigingSensor.from_cokriging(ck).warmup(batch=4)
        Yp, Ym = sensor(X_test)
        np.testing.assert_allclose(np.asarray(Yp), Yp_ref,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(Ym), Ym_ref,
                                   rtol=1e-8, atol=1e-10)

    def test_checkpoint_and_compile_sharing(self, tmp_path):
        import numpy as np
        from openmeasure_tpu import serving as S
        ck1 = self._fitted_ck(seed=0)
        path = str(tmp_path / "ck.npz")
        save_model(ck1, path)
        s1 = S.CoKrigingSensor.load(path).warmup(batch=2)
        size = S._ck_predict_kernel._cache_size()
        s2 = S.CoKrigingSensor.from_cokriging(
            self._fitted_ck(seed=7)).warmup(batch=2)
        assert S._ck_predict_kernel._cache_size() == size
        X = np.random.default_rng(1).random((2, 2))
        Yp_ref, _ = ck1.predict(X)
        np.testing.assert_allclose(np.asarray(s1(X)[0]), Yp_ref,
                                   rtol=1e-8, atol=1e-10)
        assert not np.allclose(np.asarray(s1(X)[0]), np.asarray(s2(X)[0]))

    def test_unfitted_raises(self):
        import numpy as np
        import pytest as _pytest
        from openmeasure_tpu import CoKriging
        from openmeasure_tpu.serving import CoKrigingSensor
        rng = np.random.default_rng(2)
        ck = CoKriging(rng.random((3, 1)), rng.random((4, 1)),
                       rng.random((8, 3)), rng.random((8, 4)),
                       rng.random((8, 3)), rng.random((4, 3)),
                       rng.random((4, 3)), 2)
        with _pytest.raises(AttributeError, match="batched"):
            CoKrigingSensor.from_cokriging(ck)


class TestDecoderSensor:
    """Serving + checkpointing of the shallow decoder
    (sensing/decoder.py, serving.DecoderSensor)."""

    def _fitted(self, seed=0, epochs=800):
        import numpy as np
        from openmeasure_tpu import SPR
        from openmeasure_tpu.sensing.decoder import ShallowDecoder
        rng = np.random.default_rng(seed)
        n_points, nf, m = 20, 2, 12
        t = np.linspace(0, 1, m)
        x = np.linspace(0, 1, n_points)
        X = np.concatenate([
            np.sin(2 * np.pi * (x[:, None] - 0.4 * t[None, :])),
            1.5 * np.cos(2 * np.pi * (x[:, None] + 0.2 * t[None, :])),
        ]) + 0.01 * rng.standard_normal((n_points * nf, m))
        xyz = np.column_stack([x, np.zeros(n_points), np.zeros(n_points)])
        spr = SPR(X, nf, xyz)
        spr.fit(select_modes="number", n_modes=4)
        C = np.asarray(spr.optimal_placement())
        dec = ShallowDecoder(X, nf, xyz, hidden=(16,))
        dec.fit(C, epochs=epochs, lr=3e-3, seed=seed)
        rows = np.argmax(C, axis=1)
        y = np.zeros((len(rows), 3))
        y[:, 0] = X[rows, 0]
        y[:, 2] = rows // n_points
        return dec, C, y, X

    def test_from_decoder_matches_eager_predict(self):
        import numpy as np
        from openmeasure_tpu.serving import DecoderSensor
        dec, C, y, X = self._fitted()
        sensor = DecoderSensor.from_decoder(dec, dtype=np.float64)
        x_eager = np.asarray(dec.predict(y))[:, 0]
        x_srv = np.asarray(sensor(y[:, 0]))
        np.testing.assert_allclose(x_srv, x_eager, rtol=1e-6, atol=1e-9)
        # batched path: both test vectors in one dispatch
        Y = np.stack([y[:, 0], 1.1 * y[:, 0]])
        Xb = np.asarray(sensor.predict_batch(Y))
        assert Xb.shape == (2, X.shape[0])
        np.testing.assert_allclose(Xb[0], x_eager, rtol=1e-6, atol=1e-9)

    def test_batch_shape_validation_and_unfitted_raise(self):
        import numpy as np
        import pytest as _pytest
        from openmeasure_tpu.sensing.decoder import ShallowDecoder
        from openmeasure_tpu.serving import DecoderSensor
        dec, C, y, X = self._fitted()
        sensor = DecoderSensor.from_decoder(dec)
        with _pytest.raises(ValueError, match="batch"):
            sensor.predict_batch(np.zeros((2, C.shape[0] + 1)))
        rng = np.random.default_rng(0)
        fresh = ShallowDecoder(np.asarray(dec.X), dec.n_features, dec.xyz)
        with _pytest.raises(ValueError, match="fit"):
            DecoderSensor.from_decoder(fresh)

    def test_checkpoint_roundtrip_and_sensor_load(self, tmp_path):
        import numpy as np
        from openmeasure_tpu.serving import DecoderSensor
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        dec, C, y, X = self._fitted()
        path = str(tmp_path / "dec.npz")
        save_model(dec, path)
        dec2 = load_model(path)
        np.testing.assert_allclose(np.asarray(dec2.predict(y)),
                                   np.asarray(dec.predict(y)),
                                   rtol=1e-6, atol=1e-9)
        sensor = DecoderSensor.load(path, dtype=np.float64)
        np.testing.assert_allclose(np.asarray(sensor(y[:, 0])),
                                   np.asarray(dec.predict(y))[:, 0],
                                   rtol=1e-6, atol=1e-9)

    def test_unfitted_save_raises(self, tmp_path):
        import numpy as np
        import pytest as _pytest
        from openmeasure_tpu.sensing.decoder import ShallowDecoder
        from openmeasure_tpu.utils.checkpoint import save_model
        rng = np.random.default_rng(1)
        dec = ShallowDecoder(rng.random((20, 4)), 2, rng.random((10, 3)))
        with _pytest.raises(ValueError, match="fit"):
            save_model(dec, str(tmp_path / "x.npz"))

    def test_same_architecture_models_share_compilation(self):
        import numpy as np
        from openmeasure_tpu import serving as S
        dec1, C, y, X = self._fitted(seed=0, epochs=200)
        dec2, _, _, _ = self._fitted(seed=1, epochs=200)
        s1 = S.DecoderSensor.from_decoder(dec1, dtype=np.float64).warmup()
        size = S._decoder_predict_kernel._cache_size()
        s2 = S.DecoderSensor.from_decoder(dec2, dtype=np.float64).warmup()
        assert S._decoder_predict_kernel._cache_size() == size
        assert not np.allclose(np.asarray(s1(y[:, 0])),
                               np.asarray(s2(y[:, 0])))


class TestBCOOCheckpoint:
    def test_bcoo_C_roundtrips(self, tmp_path):
        """Regression: np.asarray(BCOO) pickles an object array that
        load_model(allow_pickle=False) can never restore — BCOO C must be
        stored as COO triplets like the CSR branch."""
        import numpy as np
        from jax.experimental import sparse as jsparse
        import jax.numpy as jnp
        from openmeasure_tpu import SPR
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        rng = np.random.default_rng(21)
        X = rng.random((30, 6))
        spr = SPR(X, 2, rng.random((15, 3)))
        spr.fit(select_modes="number", n_modes=4)
        C = np.asarray(spr.optimal_placement())
        spr.train(jsparse.BCOO.fromdense(jnp.asarray(C)))
        path = str(tmp_path / "bcoo.npz")
        save_model(spr, path)
        spr2 = load_model(path)
        assert isinstance(spr2.C, jsparse.BCOO)
        rows = np.argmax(C, axis=1)
        y = np.zeros((len(rows), 3))
        y[:, 0] = X[rows, 0]
        y[:, 2] = rows // 15
        a1, _ = spr.predict(y)
        a2, _ = spr2.predict(y)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                                   rtol=1e-7, atol=1e-10)

    def test_decoder_bcoo_C_serves_from_checkpoint(self, tmp_path):
        import numpy as np
        from jax.experimental import sparse as jsparse
        import jax.numpy as jnp
        from openmeasure_tpu import SPR
        from openmeasure_tpu.sensing.decoder import ShallowDecoder
        from openmeasure_tpu.serving import DecoderSensor
        from openmeasure_tpu.utils.checkpoint import save_model
        rng = np.random.default_rng(22)
        X = rng.random((30, 10))
        xyz = rng.random((15, 3))
        spr = SPR(X, 2, xyz)
        spr.fit(select_modes="number", n_modes=4)
        C = np.asarray(spr.optimal_placement())
        dec = ShallowDecoder(X, 2, xyz, hidden=(8,))
        dec.fit(jsparse.BCOO.fromdense(jnp.asarray(C)), epochs=50)
        path = str(tmp_path / "dec_bcoo.npz")
        save_model(dec, path)
        sensor = DecoderSensor.load(path)
        rows = np.argmax(C, axis=1)
        y = np.zeros((len(rows), 3))
        y[:, 0] = X[rows, 0]
        y[:, 2] = rows // 15
        np.testing.assert_allclose(
            np.asarray(sensor(y[:, 0])),
            np.asarray(dec.predict(y))[:, 0], rtol=1e-5, atol=1e-6)
