"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openmeasure_tpu.parallel.sharded import (
    make_mesh, shard_snapshots, sharded_spr_step, sharded_mode_lstsq)
from openmeasure_tpu.pipelines import spr_end_to_end


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(4, 2)


def test_sharded_spr_matches_single_device(mesh):
    rng = np.random.default_rng(5)
    n_features, m, r = 3, 12, 4
    n_points = 64
    X_train = rng.standard_normal((n_features * n_points, m))
    X_test = rng.standard_normal((n_features * n_points, 2))

    with mesh:
        Xb_train = shard_snapshots(jnp.asarray(X_train), n_features, mesh)
        Xb_test = shard_snapshots(jnp.asarray(X_test), n_features, mesh)
        nrmse_sh, piv_sh = sharded_spr_step(Xb_train, Xb_test, r)

    res = spr_end_to_end(jnp.asarray(X_train), jnp.asarray(X_test),
                         n_features, r)
    np.testing.assert_array_equal(np.sort(np.asarray(piv_sh)),
                                  np.sort(np.asarray(res.pivots)))
    np.testing.assert_allclose(float(nrmse_sh), float(res.nrmse), rtol=1e-8)


def test_sharded_spr_output_is_sharded(mesh):
    rng = np.random.default_rng(6)
    n_features, n_points, m = 2, 32, 8
    X = rng.standard_normal((n_features * n_points, m))
    with mesh:
        Xb = shard_snapshots(jnp.asarray(X), n_features, mesh)
        shard_shapes = {s.data.shape for s in Xb.addressable_shards}
    # points axis split over 4 state shards
    assert shard_shapes == {(n_features, n_points // 4, m)}


def test_sharded_mode_lstsq_matches_dense(mesh):
    rng = np.random.default_rng(7)
    m, d, r = 12, 3, 4
    P0 = jnp.asarray(rng.standard_normal((m, d)))
    Vr = jnp.asarray(rng.standard_normal((m, r)))
    with mesh:
        coefs = np.asarray(sharded_mode_lstsq(mesh, P0, Vr))
    G = np.asarray(P0.T @ P0) + 1e-6 * np.eye(d)
    expect = np.linalg.solve(G, np.asarray(P0.T @ Vr)).T
    np.testing.assert_allclose(coefs, expect, rtol=1e-6)


@pytest.mark.parametrize("stype", ["pareto", "range", "median", "vast_2",
                                   "l2-norm"])
def test_sharded_scaling_all_types_match_eager(mesh, stype):
    from openmeasure_tpu.parallel.sharded import _scale_blocks
    from openmeasure_tpu.core import scaling as S
    rng = np.random.default_rng(11)
    n_features, n_points, m = 3, 32, 6
    X = rng.standard_normal((n_features * n_points, m)) + 2.0
    with mesh:
        Xb = shard_snapshots(jnp.asarray(X), n_features, mesh)
        X0b, cnt_b, scl_b = _scale_blocks(Xb, stype)
        X0_sh = np.asarray(X0b).reshape(n_features * n_points, m)
    X0, cnt, scl = S.scale_data(jnp.asarray(X), n_features, stype, 1)
    np.testing.assert_allclose(X0_sh, np.asarray(X0), rtol=1e-10)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(scl_b),
                        (n_features, n_points, 1)).reshape(-1),
        np.asarray(scl)[:, 0], rtol=1e-10)


def test_sharded_cols_matches_single_device(mesh):
    from openmeasure_tpu.parallel.sharded import sharded_spr_cols_step
    from openmeasure_tpu import SPR
    rng = np.random.default_rng(12)
    n_features, m, r = 2, 10, 3
    n_points = 64
    X_train = rng.random((n_features * n_points, m))
    X_test = rng.random((n_features * n_points, 2)) * 2.0  # outside limits
    lo_feat = jnp.asarray(np.array([0.1, 0.1]))
    hi_feat = jnp.asarray(np.array([0.9, 0.9]))

    with mesh:
        Xb_train = shard_snapshots(jnp.asarray(X_train), n_features, mesh)
        Xb_test = shard_snapshots(jnp.asarray(X_test), n_features, mesh)
        nrmse, piv, Ar_sh, (Ur_sh, lo, hi) = sharded_spr_cols_step(
            Xb_train, Xb_test, r, lo_feat, hi_feat,
            max_iter=8000, tol=1e-11)
        Ar_sh = np.asarray(Ar_sh)

    # eager single-device reference: same placement + COLS solve
    spr = SPR(X_train, n_features, np.zeros((n_points, 3)))
    spr.fit(select_modes="number", n_modes=r)
    C = np.asarray(spr.optimal_placement())
    spr.train(C, method="COLS",
              limits=[np.asarray(lo_feat), np.asarray(hi_feat)],
              admm_max_iter=8000, admm_tol=1e-11)
    rows = np.argmax(C, axis=1)
    ys = []
    for col in range(2):
        y = np.zeros((r, 3))
        y[:, 0] = X_test[rows, col]
        y[:, 2] = rows // n_points
        ys.append(y)
    Ar_ref, _ = spr.predict(ys)
    # same pivot set and same constrained coefficients (up to mode sign)
    np.testing.assert_array_equal(np.sort(np.asarray(piv)), np.sort(rows))
    rec_sh = np.abs(np.asarray(Ur_sh) @ Ar_sh.T)
    rec_ref = np.abs(np.asarray(spr.Ur) @ np.asarray(Ar_ref).T)
    np.testing.assert_allclose(rec_sh, rec_ref, atol=5e-5)


def test_sharded_gem_and_dg_match_eager(mesh):
    from openmeasure_tpu.parallel.sharded import (sharded_gem_select,
                                                  sharded_dg_select)
    from openmeasure_tpu.sensing.gem import gem_select
    from openmeasure_tpu.sensing.dg import dg_select
    from jax.sharding import NamedSharding, PartitionSpec as P
    rng = np.random.default_rng(13)
    n, r = 256, 5
    Ur = rng.standard_normal((n, r))
    xyz = np.tile(rng.random((n // 2, 3)), (2, 1))
    with mesh:
        Ur_sh = jax.device_put(jnp.asarray(Ur),
                               NamedSharding(mesh, P("state", None)))
        sel_gem = np.asarray(sharded_gem_select(
            Ur_sh, jnp.asarray(xyz), 6, d_min=0.05))
        sel_dg = np.asarray(sharded_dg_select(Ur_sh, 8))
    sel_gem_ref = np.asarray(gem_select(Ur, xyz, 6, d_min=0.05))
    sel_dg_ref = np.asarray(dg_select(Ur, 8))
    np.testing.assert_array_equal(sel_gem, sel_gem_ref)
    np.testing.assert_array_equal(sel_dg, sel_dg_ref)


def test_sharded_vdg_matches_eager(mesh):
    """Vector-probe placement under a points-sharded blocked basis selects
    the same locations as the single-device program (incl. d_min)."""
    from openmeasure_tpu.parallel.sharded import sharded_vdg_select
    from openmeasure_tpu.sensing.vector import vector_dg_select
    from jax.sharding import NamedSharding, PartitionSpec as P
    rng = np.random.default_rng(14)
    p, n_pts, r = 3, 128, 6
    Ur = rng.standard_normal((p * n_pts, r))
    xyz = rng.random((n_pts, 3))
    with mesh:
        # feature-blocked rows: shard so points land on the state axis
        Ur_sh = jax.device_put(
            jnp.asarray(Ur.reshape(p, n_pts, r)),
            NamedSharding(mesh, P(None, "state", None))
        ).reshape(p * n_pts, r)
        sel = np.asarray(sharded_vdg_select(Ur_sh, p, 5,
                                            xyz=jnp.asarray(xyz),
                                            d_min=0.1))
    sel_ref = np.asarray(vector_dg_select(Ur, p, 5, xyz=xyz, d_min=0.1))
    np.testing.assert_array_equal(sel, sel_ref)


@pytest.mark.slow
def test_sharded_gpr_train_matches_single_device(mesh):
    """The sharded trainer IS adam_early_stop on mode-sharded params — same
    early-stop/freeze semantics, same losses and iteration counts."""
    from openmeasure_tpu.parallel.sharded import (sharded_gpr_train,
                                                  init_mode_stacked_params)
    from openmeasure_tpu.gp import kernels as K, exact_gp as E
    rng = np.random.default_rng(14)
    p, d, r = 16, 3, 4
    P0 = jnp.asarray(rng.standard_normal((p, d)))
    Vr = jnp.asarray(np.sin(rng.standard_normal((p, r))))
    with mesh:
        res_sh = sharded_gpr_train(mesh, P0, Vr, max_iter=120,
                                   rel_error=1e-5)
        loss_sh = np.asarray(res_sh.loss)
        iters_sh = np.asarray(res_sh.iterations)
    mean, kern, lik = K.ConstantMean(), K.MaternKernel(2.5), \
        K.GaussianLikelihood()
    params0 = init_mode_stacked_params(r, d)
    loss_fn = E.make_single_task_loss(mean, kern, lik, P0, Vr.T)
    res = E.adam_early_stop(loss_fn, params0, lr=0.1, max_iter=120,
                            rel_error=1e-5)
    np.testing.assert_allclose(loss_sh, np.asarray(res.loss), rtol=1e-6)
    np.testing.assert_array_equal(iters_sh, np.asarray(res.iterations))
    # and some mode actually early-stopped (the semantics being claimed)
    assert np.any(iters_sh < 120)


@pytest.mark.slow
def test_sharded_gp_train_step(mesh):
    from openmeasure_tpu.parallel.sharded import (
        sharded_gp_train_step, init_mode_stacked_params)
    rng = np.random.default_rng(9)
    m, d, r = 16, 3, 4
    P0 = jnp.asarray(rng.standard_normal((m, d)))
    Vr = jnp.asarray(rng.standard_normal((m, r)))
    with mesh:
        params = init_mode_stacked_params(r, d)
        opt_state = None
        losses_hist = []
        for _ in range(5):
            params, opt_state, losses = sharded_gp_train_step(
                mesh, params, P0, Vr, opt_state)
            losses_hist.append(np.asarray(losses))
    # loss decreases for every mode, and params are mode-sharded
    assert np.all(losses_hist[-1] < losses_hist[0])
    leaf = params["kernel"]["raw_lengthscale"]
    assert len({s.device for s in leaf.addressable_shards}) > 1


@pytest.mark.slow
def test_sharded_mfk_matches_single_device(mesh):
    """Mode-sharded co-kriging (third model family, SURVEY §5): the
    output-sharded program must reproduce the single-device pipeline."""
    from openmeasure_tpu.parallel.sharded import sharded_mfk_end_to_end
    from openmeasure_tpu.pipelines import mfk_end_to_end
    rng = np.random.default_rng(4)
    K, d = 8, 2
    X_lf = rng.random((20, d))
    X_hf = X_lf[::3]
    f = lambda X, k: np.sin(3 * X[:, 0] + k) + 0.4 * np.cos(2 * X[:, 1])
    Y_hf = np.stack([f(X_hf, k) for k in range(K)])
    Y_lf = np.stack([0.7 * f(X_lf, k) - 0.2 for k in range(K)])
    X_t = rng.random((9, d))

    res_s = sharded_mfk_end_to_end(mesh, X_lf, Y_lf, X_hf, Y_hf, X_t)
    res_1 = mfk_end_to_end(jnp.asarray(X_lf), jnp.asarray(Y_lf),
                           jnp.asarray(X_hf), jnp.asarray(Y_hf),
                           jnp.asarray(X_t))
    # same program partitioned over outputs: tolerances cover fp
    # reassociation in the per-device reductions (outputs are independent,
    # so disagreement beyond round-off = wrong collective layout)
    np.testing.assert_allclose(np.asarray(res_s.mean),
                               np.asarray(res_1.mean), rtol=1e-4,
                               atol=1e-5 * np.abs(res_1.mean).max())
    np.testing.assert_allclose(np.asarray(res_s.mse),
                               np.asarray(res_1.mse), rtol=1e-2,
                               atol=1e-5 * np.abs(res_1.mse).max())


@pytest.mark.slow
class TestShardedServing:
    """Multi-chip serving: `sensor.shard(mesh)` row-shards the n-row state
    (serving.shard_state_rows) and must reproduce the single-device sensor
    exactly up to per-device reduction reassociation."""

    def _flame_spr(self, method="OLS"):
        from openmeasure_tpu import SPR
        from openmeasure_tpu.datasets.synthetic import make_flame_dataset
        data = make_flame_dataset(n_cells=40)          # n = 360, 360 % 4 == 0
        spr = SPR(data["X_train"].astype(np.float32), data["n_features"],
                  data["xyz"])
        spr.fit(select_modes="number", n_modes=6)
        C = np.asarray(spr.optimal_placement())
        if method == "COLS":
            npts = data["xyz"].shape[0]
            Xb = data["X_train"].reshape(data["n_features"], npts, -1)
            lo = Xb.min(axis=(1, 2)) - 0.1
            hi = Xb.max(axis=(1, 2)) + 0.1
            spr.train(C, method="COLS", limits=[lo, hi])
        else:
            spr.train(C)
        return spr, C, data

    def test_softsensor_ols_and_weighted(self, mesh):
        from jax.sharding import PartitionSpec as P
        from openmeasure_tpu.serving import SoftSensor
        spr, C, data = self._flame_spr("OLS")
        sensor = SoftSensor.from_spr(spr)
        ssens = sensor.shard(mesh)
        assert ssens._state["Ur"].sharding.spec == P("state", None)

        rows = np.argmax(C, axis=1)
        Y = np.asarray(data["X_test"], np.float32)[rows].T       # (4, s)
        S = 0.05 * np.abs(Y) + 0.01
        for sig in (None, S):
            f1, a1, s1 = sensor.predict_batch(Y, sig)
            f2, a2, s2 = ssens.predict_batch(Y, sig)
            scale = float(np.abs(np.asarray(f1)).max())
            np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                                       atol=1e-5 * scale)
            np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                                       rtol=1e-4, atol=1e-5)

    def test_softsensor_cols(self, mesh):
        from jax.sharding import PartitionSpec as P
        from openmeasure_tpu.serving import SoftSensor
        spr, C, data = self._flame_spr("COLS")
        sensor = SoftSensor.from_spr(spr)
        ssens = sensor.shard(mesh)
        assert ssens._state["A_c"].sharding.spec == P("state", None)

        rows = np.argmax(C, axis=1)
        Y = np.asarray(data["X_test"], np.float32)[rows].T
        f1, _, _ = sensor.predict_batch(Y)
        f2, _, _ = ssens.predict_batch(Y)
        scale = float(np.abs(np.asarray(f1)).max())
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                                   atol=1e-5 * scale)

    def test_gprsensor_constrained(self, mesh):
        from openmeasure_tpu import GPR
        from openmeasure_tpu.datasets.synthetic import make_flame_dataset
        from openmeasure_tpu.serving import GPRSensor
        data = make_flame_dataset(n_cells=40)
        gpr = GPR(data["X_train"], data["n_features"], data["xyz"],
                  data["P_train"], gpr_type="MultiTask")
        gpr.fit(select_modes="number", n_modes=4)
        gpr.train(max_iter=100)
        npts = data["xyz"].shape[0]
        Xb = data["X_train"].reshape(data["n_features"], npts, -1)
        lo = Xb.min(axis=(1, 2)) - 0.5
        hi = Xb.max(axis=(1, 2)) + 0.5
        sensor = GPRSensor.from_gpr(gpr, limits=[lo, hi])
        ssens = sensor.shard(mesh)

        P_test = np.asarray(data["P_test"], float)
        f1, _, s1 = sensor(P_test)
        f2, _, s2 = ssens(P_test)
        scale = float(np.abs(np.asarray(f1)).max())
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                                   rtol=1e-4, atol=1e-6 * scale)

    def test_cokriging_sensor(self, mesh):
        from openmeasure_tpu import CoKriging
        from openmeasure_tpu.serving import CoKrigingSensor
        rng = np.random.default_rng(3)
        nf, nc_hf, nc_lf = 2, 32, 24                   # n_hf = 64, 64 % 4 == 0
        X_l, X_u = rng.random((6, 2)), rng.random((8, 2))
        xyz_hf, xyz_lf = rng.random((nc_hf, 3)), rng.random((nc_lf, 3))

        def field(xyz, Pm):
            return np.stack([np.sin(3 * xyz[:, 0] * (1 + p[0]))
                             + p[1] * xyz[:, 1] for p in Pm], axis=1)

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
        sensor = CoKrigingSensor.from_cokriging(ck)
        ssens = sensor.shard(mesh)
        X_test = rng.random((4, 2))
        Yp1, Ym1 = sensor(X_test)
        Yp2, Ym2 = ssens(X_test)
        scale = float(np.abs(np.asarray(Yp1)).max())
        np.testing.assert_allclose(np.asarray(Yp2), np.asarray(Yp1),
                                   atol=1e-6 * scale)
        np.testing.assert_allclose(np.asarray(Ym2), np.asarray(Ym1),
                                   rtol=1e-5, atol=1e-6 * scale)

    def test_gprsensor_bc_pins_nondivisible_constraints_pad(self, mesh):
        """Appended bc pins make the constraint row count non-divisible by
        the state axis: shard() must pad the constraint set with inert
        rows, shard it, and still match the single-device sensor."""
        from jax.sharding import PartitionSpec as P
        from openmeasure_tpu import GPR
        from openmeasure_tpu.datasets.synthetic import make_flame_dataset
        from openmeasure_tpu.serving import GPRSensor
        data = make_flame_dataset(n_cells=40)
        gpr = GPR(data["X_train"], data["n_features"], data["xyz"],
                  data["P_train"], gpr_type="MultiTask")
        gpr.fit(select_modes="number", n_modes=4)
        gpr.train(max_iter=100)
        npts = data["xyz"].shape[0]
        Xb = data["X_train"].reshape(data["n_features"], npts, -1)
        lo = Xb.min(axis=(1, 2)) - 0.5
        hi = Xb.max(axis=(1, 2)) + 0.5
        rows = np.array([0, 1, 2])                 # 360 + 3 = 363, 363 % 4 != 0
        vals = data["X_train"][rows, 0]
        sensor = GPRSensor.from_gpr(gpr, limits=[lo, hi], bc=(rows, vals))
        ssens = sensor.shard(mesh)
        assert ssens._state["Ur"].sharding.spec == P("state", None)
        assert ssens._state["A_c"].sharding.spec == P("state", None)
        n_c = sensor._state["A_c"].shape[0]                    # 363
        assert ssens._state["A_c"].shape[0] == -(-n_c // 4) * 4  # padded

        P_test = np.asarray(data["P_test"], float)
        f1, a1, _ = sensor(P_test)
        f2, a2, _ = ssens(P_test)
        scale = float(np.abs(np.asarray(f1)).max())
        # tolerance note: admm_box_qp normalizes residuals by the ACTIVE
        # row count (state["n_c"], not the padded A.shape[0]) and padded
        # rows contribute exact zeros to every matvec/norm, so the f64 MAP
        # trajectory agrees with the unpadded sensor to reduction-order
        # ULPs (measured 2e-16 relative on both coefficients and field);
        # bars are 1e-12·scale — four orders of margin, still ULP-class.
        a_scale = float(np.abs(np.asarray(a1)).max())
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                                   atol=1e-12 * a_scale)
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                                   atol=1e-12 * scale)

    def test_softsensor_nondivisible_n_pads_and_matches(self, mesh):
        """The flagship case the padding exists for: n not divisible by the
        state axis (n = 9·41 = 369, 369 % 4 = 1).  The state must pad+shard
        and the (sliced) predictions must match the single-device sensor."""
        from jax.sharding import PartitionSpec as P
        from openmeasure_tpu import SPR
        from openmeasure_tpu.datasets.synthetic import make_flame_dataset
        from openmeasure_tpu.serving import SoftSensor
        data = make_flame_dataset(n_cells=41)
        spr = SPR(data["X_train"].astype(np.float32), data["n_features"],
                  data["xyz"])
        spr.fit(select_modes="number", n_modes=6)
        C = np.asarray(spr.optimal_placement())
        npts = data["xyz"].shape[0]
        Xb = data["X_train"].reshape(data["n_features"], npts, -1)
        lo = Xb.min(axis=(1, 2)) - 0.1
        hi = Xb.max(axis=(1, 2)) + 0.1
        spr.train(C, method="COLS", limits=[lo, hi])
        sensor = SoftSensor.from_spr(spr)
        ssens = sensor.shard(mesh)
        n = 9 * 41
        assert ssens._state["Ur"].shape[0] == -(-n // 4) * 4   # padded
        assert ssens._state["Ur"].sharding.spec == P("state", None)

        rows = np.argmax(C, axis=1)
        Y = np.asarray(data["X_test"], np.float32)[rows].T
        f1, a1, s1 = sensor.predict_batch(Y)
        f2, a2, s2 = ssens.predict_batch(Y)
        assert np.asarray(f2).shape == np.asarray(f1).shape    # sliced back
        # tolerance note (repo convention: coefficients first, fields
        # relative): the ρ-adaptation normalization is padding-invariant
        # (admm_box_qp n_rows = active count) and padded rows contribute
        # exact zeros, BUT this model is float32 and padding changes the
        # contraction length (369 → 372), so XLA blocks the n-row dots
        # differently; the resulting per-iteration ULP noise compounds
        # through 300 fixed-budget ADMM iterations (clip nonlinearities)
        # to the solver's fp32 reproducibility bound — measured 1.8e-5
        # relative on coefficients and 1.1e-5·scale on the field.  Bars
        # are 1e-4 (≈6× margin); the f64 sibling test above pins the
        # ULP-exact case.
        scale = float(np.abs(np.asarray(f1)).max())
        a_scale = float(np.abs(np.asarray(a1)).max())
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                                   atol=1e-4 * a_scale)
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                                   atol=1e-4 * scale)
        # single-request path slices too
        x1 = np.asarray(sensor(Y[0]))
        x2 = np.asarray(ssens(Y[0]))
        assert x1.shape == x2.shape
        np.testing.assert_allclose(x2, x1, atol=1e-4 * scale)


def test_sharded_decoder_sensor_matches_single_device(mesh):
    """DecoderSensor.shard column-shards the output layer; padded inert
    columns must slice away and predictions match the unsharded sensor
    (n = 90 is NOT divisible by the 4-way state axis)."""
    from openmeasure_tpu import SPR
    from openmeasure_tpu.sensing.decoder import ShallowDecoder
    from openmeasure_tpu.serving import DecoderSensor
    rng = np.random.default_rng(23)
    n_points, nf = 45, 2                    # n = 90, 90 % 4 != 0
    X = rng.random((n_points * nf, 10)).astype(np.float32)
    xyz = rng.random((n_points, 3))
    spr = SPR(X, nf, xyz)
    spr.fit(select_modes="number", n_modes=4)
    C = np.asarray(spr.optimal_placement())
    dec = ShallowDecoder(X, nf, xyz, hidden=(8,))
    dec.fit(C, epochs=100)
    sensor = DecoderSensor.from_decoder(dec)
    ssens = sensor.shard(mesh)
    rows = np.argmax(C, axis=1)
    Y = X[rows, :3].T                       # (3, s)
    f1 = np.asarray(sensor.predict_batch(Y))
    f2 = np.asarray(ssens.predict_batch(Y))
    assert f2.shape == f1.shape == (3, n_points * nf)
    scale = float(np.abs(f1).max())
    np.testing.assert_allclose(f2, f1, atol=1e-6 * scale)
    np.testing.assert_allclose(np.asarray(ssens(Y[0])),
                               np.asarray(sensor(Y[0])),
                               atol=1e-6 * scale)
