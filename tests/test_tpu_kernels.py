"""TPU-only Pallas kernel parity tests.

The CI suite runs on CPU (conftest pins the platform), where Mosaic kernels
cannot execute — these tests self-skip there.  On a TPU host
(``JAX_PLATFORMS`` unset / axon) they assert pivot parity of both Pallas
QRCP kernels against the jnp sweep, which is itself scipy-diff-tested in
``test_linalg.py``.  The verify drive scripts exercise the same kernels at
flagship/3D scale with timing.
"""

import numpy as np
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas TPU kernels need a TPU backend")


@pytest.mark.parametrize("shape", [(14, 5000), (8, 20000)])
def test_in_vmem_kernel_matches_jnp(shape):
    from openmeasure_tpu.linalg import qrcp as Q, qrcp_pallas as QP
    rng = np.random.default_rng(0)
    A = rng.standard_normal(shape).astype(np.float32)
    r = shape[0]
    piv_v = np.asarray(QP.qrcp_pivots_pallas(jnp.asarray(A), r))
    piv_j = np.asarray(Q.qrcp_pivots(jnp.asarray(A), r))
    np.testing.assert_array_equal(piv_v, piv_j)


@pytest.mark.parametrize("shape,bn", [((14, 50000), 8192),
                                      ((8, 20000), 4096)])
def test_streamed_kernel_matches_jnp(shape, bn):
    from openmeasure_tpu.linalg import qrcp as Q, qrcp_pallas as QP
    rng = np.random.default_rng(1)
    A = rng.standard_normal(shape).astype(np.float32)
    r = shape[0]
    piv_s = np.asarray(QP.qrcp_pivots_streamed(jnp.asarray(A), r,
                                               block_cols=bn))
    piv_j = np.asarray(Q.qrcp_pivots(jnp.asarray(A), r))
    np.testing.assert_array_equal(piv_s, piv_j)


def test_streamed_kernel_row_scale_matches_prescaled_jnp():
    """In-kernel row scaling (the SPR pipeline's folded basis
    normalization) must pivot exactly like the explicitly prescaled
    panel."""
    from openmeasure_tpu.linalg import qrcp as Q, qrcp_pallas as QP
    rng = np.random.default_rng(2)
    A = rng.standard_normal((14, 50000)).astype(np.float32)
    # decades-spread row scales, like 1/sigma of an ill-conditioned basis
    dinv = np.geomspace(1.0, 1e4, 14).astype(np.float32)
    piv_s = np.asarray(QP.qrcp_pivots_streamed(
        jnp.asarray(A), 14, block_cols=8192, row_scale=jnp.asarray(dinv)))
    piv_j = np.asarray(Q.qrcp_pivots(jnp.asarray(A * dinv[:, None]), 14))
    np.testing.assert_array_equal(piv_s, piv_j)


def test_weighted_solve_accuracy_on_tpu():
    """The device fp32 SVD-route pinv loses ~1% of the coefficients when the
    scaled per-feature sigmas make cond(WΘ) ~1e5; both eager SPR.predict
    (host f64 LAPACK) and SoftSensor (QR + one refinement step on device)
    must stay at fp32 round-off of the f64 solution."""
    from openmeasure_tpu import SPR
    from openmeasure_tpu.serving import SoftSensor
    from openmeasure_tpu.datasets.synthetic import make_flame_dataset

    data = make_flame_dataset()
    X = data["X_train"].astype(np.float32)
    Xt = data["X_test"].astype(np.float32)
    nf = data["n_features"]
    spr = SPR(X, nf, data["xyz"])
    spr.fit(select_modes="number", n_modes=14)
    C = np.asarray(spr.optimal_placement())
    spr.train(C)
    rows = np.argmax(C, axis=1)
    n_points = X.shape[0] // nf
    y = np.zeros((14, 3), dtype=np.float32)
    y[:, 0] = Xt[rows, 0]
    y[:, 1] = 0.05
    y[:, 2] = rows // n_points

    Th64 = np.asarray(spr.Theta, np.float64)
    cnt = np.asarray(spr.X_cnt, np.float64)[rows, 0]
    scl = np.asarray(spr.X_scl, np.float64)[rows, 0]
    y064 = (y[:, 0].astype(np.float64) - cnt) / scl
    w64 = scl / 0.05                       # 1 / (sigma / scl)
    a64 = np.linalg.pinv(Th64 * w64[:, None]) @ (w64 * y064)
    scale = np.max(np.abs(a64))

    a_spr, _ = spr.predict(y)
    assert np.max(np.abs(np.asarray(a_spr)[0] - a64)) / scale < 1e-5

    sensor = SoftSensor.from_spr(spr).warmup()
    _, a_srv, _ = sensor.predict_full(y[:, 0], y[:, 1])
    assert np.max(np.abs(np.asarray(a_srv, np.float64) - a64)) / scale < 1e-5


@pytest.mark.parametrize("B,p", [(14, 41), (3, 17), (30, 64)])
def test_chol_inv_logdet_kernel_matches_jnp(B, p):
    """Pallas batched small-SPD inverse+logdet vs the cholesky+cho_solve
    formulation: K⁻¹ to f32 round-off, logdet to the log-accumulation
    round-off (p sequential adds vs 2·Σ log diag)."""
    from openmeasure_tpu.linalg import chol_pallas as CP
    rng = np.random.default_rng(0)
    Q = rng.standard_normal((B, p, p))
    Kn = jnp.asarray(np.einsum("bij,bkj->bik", Q, Q) / p
                     + 0.5 * np.eye(p)[None], jnp.float32)
    ki_p, ld_p = jax.jit(CP.chol_inv_logdet_pallas)(Kn)
    ki_j, ld_j = jax.jit(CP.chol_inv_logdet_jnp)(Kn)
    scale = float(jnp.max(jnp.abs(ki_j)))
    assert float(jnp.max(jnp.abs(ki_p - ki_j))) / scale < 5e-6
    assert float(jnp.max(jnp.abs(ld_p - ld_j))) < 5e-3


def test_gp_log_prob_posterior_kernel_path_matches_fallback():
    """gp_log_prob / gp_posterior take the Pallas chol-inverse path on TPU
    f32 (the PIGPR added-loss hot path); value, posterior mean/var, and
    gradients (through the kernel's analytic JVP) must match the cholesky
    fallback (forced via OMTPU_NO_CHOL_KERNEL) at f32 round-off."""
    import os
    from openmeasure_tpu.gp import exact_gp as E, kernels as K
    rng = np.random.default_rng(3)
    p, d, s = 29, 3, 7
    X = jnp.asarray(rng.standard_normal((p, d)), jnp.float32)
    Xs = jnp.asarray(rng.standard_normal((s, d)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(p), jnp.float32)
    mean, kern = K.ConstantMean(), K.MaternKernel(2.5)
    params = {"mean": mean.init_params(d), "kernel": kern.init_params(d)}
    noise = jnp.float32(0.04)

    def lp(q):
        return E.gp_log_prob(mean, kern, q, noise, X, y)

    def post(q):
        m, v = E.gp_posterior(mean, kern, q, noise, X, y, Xs)
        return m, v

    lp_k, g_k = jax.value_and_grad(lp)(params)
    m_k, v_k = post(params)
    assert "OMTPU_NO_CHOL_KERNEL" not in os.environ
    os.environ["OMTPU_NO_CHOL_KERNEL"] = "1"
    try:
        lp_f, g_f = jax.value_and_grad(lp)(params)
        m_f, v_f = post(params)
    finally:
        del os.environ["OMTPU_NO_CHOL_KERNEL"]

    assert abs(float(lp_k - lp_f)) / abs(float(lp_f)) < 1e-4
    flat_k, _ = jax.flatten_util.ravel_pytree(g_k)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_f)
    gscale = float(jnp.max(jnp.abs(flat_f))) + 1e-12
    assert float(jnp.max(jnp.abs(flat_k - flat_f))) / gscale < 5e-4
    mscale = float(jnp.max(jnp.abs(m_f))) + 1e-12
    assert float(jnp.max(jnp.abs(m_k - m_f))) / mscale < 5e-5
    vscale = float(jnp.max(jnp.abs(v_f))) + 1e-12
    assert float(jnp.max(jnp.abs(v_k - v_f))) / vscale < 5e-4


def test_gp_oracle_kernel_path_matches_autodiff_on_tpu():
    """On TPU the closed-form GP oracle routes its factorization through the
    Pallas kernel (exact_gp.lp_and_grads TPU branch); its (loss, grad) must
    still match reverse-mode autodiff of the plain cholesky loss at f32
    tolerance — the same bar the CPU suite pins for the cho_solve path."""
    from openmeasure_tpu.gp import exact_gp as E, kernels as K
    rng = np.random.default_rng(2)
    p, d, r = 23, 3, 5
    X = jnp.asarray(rng.standard_normal((p, d)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((r, p)), jnp.float32)
    mean, kern, lik = K.ConstantMean(), K.MaternKernel(2.5), \
        K.GaussianLikelihood()
    task0 = {"mean": mean.init_params(d), "kernel": kern.init_params(d),
             "likelihood": lik.init_params()}
    params = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (r,) + x.shape), task0)
    vag = E.make_single_task_value_and_grad(mean, kern, lik, X, Y)
    loss_fn = E.make_single_task_loss(mean, kern, lik, X, Y)
    losses, grads = jax.jit(vag)(params)
    l_ad, g_ad = jax.jit(jax.value_and_grad(
        lambda q: jnp.sum(loss_fn(q))))(params)
    assert float(jnp.max(jnp.abs(jnp.sum(losses) - l_ad))) < 5e-4
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    flat_ad, _ = jax.flatten_util.ravel_pytree(g_ad)
    scale = float(jnp.max(jnp.abs(flat_ad))) + 1e-12
    assert float(jnp.max(jnp.abs(flat - flat_ad))) / scale < 5e-4
