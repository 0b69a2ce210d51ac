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
