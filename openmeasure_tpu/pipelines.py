"""Fully-jitted end-to-end pipelines.

The class API (ROM/SPR/GPR) is eager and numpy-friendly for reference parity;
these functional pipelines are the TPU fast path: the entire README flow —
scale → Gram-SVD → truncate → QRCP placement → gappy-POD solve → reconstruct
(``README.md:157-183`` of the reference) — compiles to ONE XLA program with
static shapes, so XLA fuses the scaling into the Gram pass and keeps every
intermediate in HBM.  This is the benchmark ("flagship model") entry point.

Evaluated and rejected on measurement (TPU v5e): a WIDE-layout variant of
the SPR pipeline carrying every panel transposed — snapshots as rows,
state in lanes, ``(r, n)`` instead of ``(n, r)`` — on the theory that the
narrow panels pay minor-dim lane padding (14 → 128) on every pass and the
QRCP kernel consumes ``Urᵀ`` without a physical transpose.  Measured
end-to-end (slope method): 3D 1.7M×45 r=14 **20.8 ms vs 9.7 ms tall**
(2.1× SLOWER — XLA inserts layout changes for the sublane-contraction
matmuls ``VᵀX0w`` / ``V2ᵀBw``, which cost more than any padding saved) and
NRMSE 1.27e-5 vs 2.8e-6 (the sublane-contraction MXU path also loses
accuracy at HIGHEST); flagship 0.65 ms vs 0.85 but NRMSE 3.0e-6 vs 1.3e-6.
The variant passed full numerical parity on CPU (pivot-exact in f64) —
the rejection is purely the measured TPU regression.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .core import scaling as _scaling
from .linalg import svd as _svd
from .linalg import qrcp_pallas as _qrcp_pl


class SPRResult(NamedTuple):
    X_rec: jax.Array        # (n, m_test) reconstructed fields
    pivots: jax.Array       # (r,) sensor row indices
    Ar: jax.Array           # (m_test, r) gappy-POD coefficients
    nrmse: jax.Array        # scalar — reconstruction NRMSE vs X_test
    exp_variance: jax.Array  # (r,)


@functools.partial(jax.jit, static_argnames=("n_features", "r", "scale_type",
                                             "refine", "svd_width"))
def spr_end_to_end(
    X_train: jax.Array,
    X_test: jax.Array,
    n_features: int,
    r: int,
    scale_type: str = "std",
    refine: Optional[int] = None,
    svd_width: Optional[int] = None,
) -> SPRResult:
    """POD fit + QRCP sensor placement + gappy-POD OLS reconstruction of the
    test snapshots, sampled at the selected sensors.  One XLA program.

    Equivalent reference flow: ``SPR.fit(select_modes='number', n_modes=r)``;
    ``optimal_placement()``; ``train(C_qr)``; ``predict(y)``;
    ``reconstruct(ap)``.

    ``svd_width``: optional width (r ≤ w ≤ m) of the SVD refine subspace —
    see :func:`openmeasure_tpu.linalg.svd.svd_tall`; ``None`` keeps the
    full-width (top-r-exact) refine.
    """
    X0, cnt, scl = _scaling.scale_data(X_train, n_features, scale_type, 1)
    # normalize=False: the basis normalization U = B·diag(1/‖b_i‖) never
    # materializes — the QRCP kernel row-scales the streamed blocks in
    # VMEM and the (r,)-sized factor folds into Theta and the
    # reconstruction coefficients (measured on the 3D bench: 9.3→8.7 ms,
    # the eliminated (n, r) normalize+rewrite pass; identical NRMSE)
    B, S, _ = _svd.svd_tall(X0, refine=refine, canonicalize=False, rank=r,
                            width=svd_width, normalize=False)
    exp_var = _svd.explained_variance(S)[:r]
    dinv = 1.0 / _svd.floored_norms(S[:r], X0.shape[0], X0.dtype)

    pivots = _qrcp_pl.qrcp_pivots_auto(B.T, r, row_scale=dinv)

    Theta = B[pivots, :] * dinv[None, :]    # (r, r) == Ur[pivots, :]
    y = X_test[pivots, :]               # raw sensor readings, (r, m_test)
    y0 = (y - cnt[pivots, 0][:, None]) / scl[pivots, 0][:, None]

    Ar = jnp.linalg.solve(Theta, y0).T  # (m_test, r) — square system
    # HIGHEST precision on the reconstruction matmul: the TPU default is
    # bf16 operands, which alone caps reconstruction NRMSE at ~1.2e-4 on
    # the flagship set (measured); full fp32 products land at ~1e-6.
    X_rec0 = jnp.matmul(B, (Ar * dinv[None, :]).T,
                        precision=jax.lax.Precision.HIGHEST)
    X_rec = X_rec0 * scl + cnt

    err = X_rec - X_test
    nrmse = jnp.sqrt(jnp.mean(err * err)) / (
        jnp.max(X_test) - jnp.min(X_test))
    return SPRResult(X_rec, pivots, Ar, nrmse, exp_var)


class GPRResult(NamedTuple):
    X_rec: jax.Array        # (n, n_test) reconstructed fields
    A_pred: jax.Array       # (n_test, r)
    A_sigma: jax.Array      # (n_test, r)
    nrmse: jax.Array
    gp_loss: jax.Array      # (r,) final per-mode -MLL


@functools.partial(jax.jit, static_argnames=("n_features", "r", "scale_type",
                                             "max_iter", "rel_error", "lr"))
def gpr_end_to_end(
    X_train: jax.Array,
    P_train: jax.Array,
    P_test: jax.Array,
    X_test: jax.Array,
    n_features: int,
    r: int,
    scale_type: str = "std",
    max_iter: int = 1000,
    rel_error: float = 1e-5,
    lr: float = 0.1,
) -> GPRResult:
    """Full GPR-ROM flow as ONE XLA program: scale → POD → normalize → scale
    parameters → train r per-mode GPs (vmapped Adam with early stop) →
    posterior at P_test → rescale → reconstruct → NRMSE.

    Equivalent reference flow: ``GPR(...).fit(); train(); predict();
    reconstruct()`` (README.md:194-202 there), which crosses into
    libtorch r times serially."""
    from .gp import kernels as K
    from .gp import exact_gp as E

    # deflate=r//2: the GP regresses each coefficient series separately, so
    # the deep-tail modes should be per-mode accurate — the deflated SVD
    # restores them on TPU up to the data's near-degenerate tail cluster
    # (svd_tall_deflated docstring has the full measured gpr_nrmse
    # decomposition: the residual vs f64 is fp32 GP training + the
    # fp32-unresolvable cluster split, not the basis route)
    Ur, Ar, Sigma_r, cnt, scl = pod_fit(X_train, n_features, r, scale_type,
                                        deflate=r // 2)
    Vr = Ar / Sigma_r[None, :]

    P0, P_cnt, P_scl = _scaling.scale_parameters(P_train, scale_type)
    P0_test = (P_test - P_cnt[0][None, :]) / P_scl[0][None, :]

    mean, kernel, lik = K.ConstantMean(), K.MaternKernel(2.5), \
        K.GaussianLikelihood()
    d = P_train.shape[1]
    task0 = {"mean": mean.init_params(d), "kernel": kernel.init_params(d),
             "likelihood": lik.init_params()}
    params0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (r,) + x.shape), task0)
    loss_fn = E.make_single_task_loss(mean, kernel, lik, P0, Vr.T)
    vag = E.make_single_task_value_and_grad(mean, kernel, lik, P0, Vr.T)
    res = E.adam_early_stop(loss_fn, params0, lr=lr, max_iter=max_iter,
                            rel_error=rel_error, value_and_grad=vag)

    def post_one(tp, y):
        nz = lik.noise(tp["likelihood"])
        return E.gp_posterior(mean, kernel, tp, nz, P0, y, P0_test,
                              include_noise=True)
    means, variances = jax.vmap(post_one)(res.params, Vr.T)
    V_pred, V_sigma = means.T, jnp.sqrt(variances).T

    A_pred = V_pred * Sigma_r[None, :]
    A_sigma = V_sigma * Sigma_r[None, :]
    X_rec = jnp.matmul(Ur, A_pred.T,
                       precision=jax.lax.Precision.HIGHEST) * scl + cnt
    err = X_rec - X_test
    nrmse = jnp.sqrt(jnp.mean(err * err)) / (
        jnp.max(X_test) - jnp.min(X_test))
    return GPRResult(X_rec, A_pred, A_sigma, nrmse, res.loss)


class MFKResult(NamedTuple):
    mean: jax.Array     # (K, n_test) recursive co-kriging posterior mean
    mse: jax.Array      # (K, n_test) posterior MSE
    theta: jax.Array    # (2, K, d) fitted correlation parameters per level


@functools.partial(jax.jit, static_argnames=("regr", "rho_regr"))
def mfk_end_to_end(
    X_lf: jax.Array, Y_lf: jax.Array,
    X_hf: jax.Array, Y_hf: jax.Array,
    X_test: jax.Array,
    regr: str = "constant", rho_regr: str = "constant",
) -> MFKResult:
    """Two-level recursive co-kriging for K outputs sharing the same sites,
    as ONE XLA program: normalize → level-0 θ-multistart + GLS fit →
    level-0 posterior at the HF sites → level-1 (ρ-coupled) θ-multistart +
    GLS fit → recursive posterior at X_test → denormalize.

    The latent-space workload of the reference's ``CoKriging.fit`` +
    ``predict`` (``cokriging.py:109-144``: K serial OpenMDAO
    ``MultiFiCoKriging`` fits and predicts), with the default knobs
    (θ0=0.5, bounds [1e-6, 100], initial_range=0.3, tol=1e-6).  Same math
    as :class:`openmeasure_tpu.multifi.mfk.BatchedMFK` (shared helpers) —
    parity pinned in ``tests/test_multifi.py``.

    Y_lf: (K, n_lf); Y_hf: (K, n_hf).  Returns per-output means/MSEs.
    """
    from .multifi import mfk as M

    K_out = Y_lf.shape[0]
    d = X_lf.shape[1]

    # ---- normalization (BatchedMFK normalize=True semantics) ----
    X_all = jnp.concatenate([X_lf, X_hf], axis=0)
    X_mean = jnp.mean(X_all, axis=0)
    X_std0 = jnp.std(X_all, axis=0)
    X_std = jnp.where(X_std0 == 0.0, 1.0, X_std0)
    Y_all = jnp.concatenate([Y_lf, Y_hf], axis=1)
    y_mean = jnp.mean(Y_all, axis=1)
    y_std0 = jnp.std(Y_all, axis=1)
    y_std = jnp.where(y_std0 == 0.0, 1.0, y_std0)
    Xn_lf = (X_lf - X_mean) / X_std
    Xn_hf = (X_hf - X_mean) / X_std
    Xn_t = (X_test - X_mean) / X_std
    Yn_lf = (Y_lf - y_mean[:, None]) / y_std[:, None]
    Yn_hf = (Y_hf - y_mean[:, None]) / y_std[:, None]

    # ---- hyperparameter search grid (host-side constants at trace time) --
    import numpy as _np
    theta0 = _np.full((d,), 0.5)
    thetaL = _np.full((d,), 1e-6)
    thetaU = _np.full((d,), 100.0)
    starts = M._make_starts(theta0, thetaL, thetaU, 0.3)
    starts = jnp.asarray(starts, X_lf.dtype)
    lo = jnp.asarray(_np.log10(thetaL), X_lf.dtype)
    hi = jnp.asarray(_np.log10(thetaU), X_lf.dtype)

    def fit_level(Xl, F_batch, Yl):
        log_t = M._multistart_opt_batch(starts, Xl, F_batch, Yl, lo, hi,
                                        1e-6)
        thetas = 10.0 ** log_t
        beta, gamma, sigma2, L, Ggls = jax.vmap(
            lambda th, F, y: M._level_fit_terms(th, Xl, F, y)
        )(thetas, F_batch, Yl)
        return dict(X=Xl, Y=Yl, F=F_batch, theta=thetas, beta=beta,
                    gamma=gamma, sigma2=sigma2, L=L, G=Ggls)

    # ---- level 0 (LF) ----
    F0 = M._regr(regr, Xn_lf)
    lev0 = fit_level(Xn_lf, jnp.broadcast_to(F0, (K_out,) + F0.shape), Yn_lf)

    # ---- level 1 (HF, rho-coupled) ----
    rho_cols = M._regr(rho_regr, Xn_hf).shape[1]
    m_prev, _ = M.predict_levels_batch([lev0], (0,), regr, rho_regr, 0,
                                       Xn_hf)
    G1 = M._regr(rho_regr, Xn_hf)
    Fr = M._regr(regr, Xn_hf)
    F1 = jnp.concatenate([G1[None] * m_prev[:, :, None],
                          jnp.broadcast_to(Fr, (K_out,) + Fr.shape)], axis=2)
    lev1 = fit_level(Xn_hf, F1, Yn_hf)

    # ---- recursive posterior at X_test ----
    mean_n, var_n = M.predict_levels_batch([lev0, lev1], (0, rho_cols),
                                           regr, rho_regr, 1, Xn_t)
    mean = mean_n * y_std[:, None] + y_mean[:, None]
    mse = var_n * y_std[:, None] ** 2
    return MFKResult(mean, mse, jnp.stack([lev0["theta"], lev1["theta"]]))


@functools.partial(jax.jit, static_argnames=("n_features", "r", "scale_type",
                                             "deflate"))
def pod_fit(
    X_train: jax.Array, n_features: int, r: int, scale_type: str = "std",
    deflate: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Scale + truncated POD, jitted.  Returns (Ur, Ar, Sigma_r, cnt, scl).

    ``deflate=k`` recomputes modes k..r from the leading-block-deflated
    panel (:func:`linalg.svd.svd_tall_deflated`) — needed by per-mode
    consumers (the GP ROM) on TPU, where the plain Gram route's deep-tail
    modes (σ/σ₁ ≲ √eps) are product-noise-limited."""
    X0, cnt, scl = _scaling.scale_data(X_train, n_features, scale_type, 1)
    U, S, Vt = _svd.svd_tall_deflated(X0, rank=r, deflate=deflate)
    Ar = (S[:r, None] * Vt[:r]).T
    return U, Ar, S[:r], cnt, scl
