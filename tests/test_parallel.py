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
