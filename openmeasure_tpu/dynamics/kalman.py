"""Reduced-order Kalman filtering of sparse-measurement time series.

Capability beyond the reference: its reconstruction is memoryless — each
measurement vector is solved independently (``sparse_sensing.py:806-895``),
so sensor noise passes straight into the reconstructed field.  When the
snapshots are a time series, the POD coefficients follow near-linear
dynamics that a filter can exploit: this module identifies a reduced-space
linear model ``a_{k+1} = A a_k + w`` from the training coefficients and runs
a standard discrete Kalman filter against the gappy measurement model
``y0_k = Theta a_k + v`` (the same ``Theta = C @ Ur`` the static solve uses).

TPU-first shape: the identification (tiny (r, r) least squares) and the
stationary covariance run on host float64 at packaging time; the filter
itself is one jitted ``lax.scan`` over the measurement series — static
shapes, Joseph-form covariance updates for fp32 stability, every matmul at
HIGHEST precision (r, s ≤ ~64: the cost is per-op dispatch, not FLOPs, so
a K-frame series is ONE device program instead of K solves).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


def fit_reduced_operator(Ar, ridge: float = 0.0) -> np.ndarray:
    """One-step linear dynamics on the reduced coefficients.

    ``Ar`` (m, r) holds the time-ordered POD coefficients (the house layout:
    one snapshot per ROW, ``ROM.fit``).  Returns the (r, r) operator A
    minimizing ``sum_k ||A a_k - a_{k+1}||^2`` (+ ridge ``lam*tr(G)/r`` on
    the Gram diagonal) — host LAPACK float64, like every tiny solve whose
    result is baked into packaged state.

    With the basis taken from the SVD of the first m-1 snapshots this is
    exactly the projected-DMD operator; here the basis is whatever the model
    was fitted with, so A is the least-squares generator in THOSE
    coordinates — the right object for filtering against ``Theta = C Ur``.
    """
    Ar = np.asarray(Ar, dtype=np.float64)
    if Ar.ndim != 2 or Ar.shape[0] < 2:
        raise ValueError(
            f"Ar must be (m >= 2, r) time-ordered coefficients; got "
            f"{Ar.shape}.")
    Y1, Y2 = Ar[:-1], Ar[1:]
    if ridge == 0.0:
        At, *_ = np.linalg.lstsq(Y1, Y2, rcond=None)
        return np.ascontiguousarray(At.T)
    r = Ar.shape[1]
    G = Y1.T @ Y1
    G_reg = G + (ridge * np.trace(G) / max(r, 1)) * np.eye(r)
    At = np.linalg.solve(G_reg, Y1.T @ Y2)
    return np.ascontiguousarray(At.T)


def estimate_process_noise(A, Ar, floor_rel: float = 1e-8) -> np.ndarray:
    """Process-noise covariance from the one-step residuals of ``A``.

    ``Q = E^T E / (k - 1)`` over the k = m-1 residuals
    ``e_k = a_{k+1} - A a_k`` (zero-mean by the least-squares normal
    equations when A came from :func:`fit_reduced_operator`), symmetrized,
    with a relative diagonal floor so a perfectly-linear training series
    still yields a positive-definite Q (the filter needs one).
    """
    A = np.asarray(A, dtype=np.float64)
    Ar = np.asarray(Ar, dtype=np.float64)
    E = Ar[1:] - Ar[:-1] @ A.T
    k = E.shape[0]
    Q = (E.T @ E) / max(k - 1, 1)
    Q = 0.5 * (Q + Q.T)
    r = Q.shape[0]
    scale = max(np.trace(Q) / max(r, 1), np.mean(np.square(Ar)))
    return Q + (floor_rel * max(scale, np.finfo(np.float64).tiny)) \
        * np.eye(r)


def stationary_covariance(A, Q) -> np.ndarray:
    """Stationary state covariance ``P = A P A^T + Q`` (discrete Lyapunov).

    Solved by scipy when the dynamics are stable; an unstable A (spectral
    radius >= 1, e.g. a training series with a growing mode) has no
    stationary covariance — the filter then starts from ``Q`` scaled by a
    modest factor, which the first few measurement updates wash out.
    """
    A = np.asarray(A, dtype=np.float64)
    Q = np.asarray(Q, dtype=np.float64)
    rho = np.max(np.abs(np.linalg.eigvals(A)))
    if rho >= 1.0 - 1e-9:
        return 10.0 * Q
    from scipy.linalg import solve_discrete_lyapunov
    P = solve_discrete_lyapunov(A, Q)
    return 0.5 * (P + P.T)


# effective variance of a GATED (outlier-rejected) measurement: large
# enough that the Kalman gain is numerically zero, small enough that the
# SPD innovation solve stays well-conditioned in fp32
_GATED_R = 1e12

# relative floor on each measurement's effective variance vs its own
# predicted innovation variance (see _kf_core) — ~10x fp32 eps
_R_FLOOR_REL = 1e-6


def _kf_core(A, Q, H, a, P, y0, r_diag, gate):
    """One predict + Joseph-form update.  All matmuls HIGHEST (fp32 device:
    the covariance recursions are differences of near-equal products).
    Returns the full posterior AND the prediction (the smoother needs
    both); the filter scan keeps only what it emits.

    ``gate`` (scalar) is the innovation-gating threshold in predicted
    standard deviations: a measurement entry whose innovation
    ``|y_i - (H a_pred)_i|`` exceeds ``gate * sqrt(S_ii)`` (with
    ``S_ii = (H P_pred H^T)_ii + r_i``, the filter's own predicted
    innovation variance) is a gross outlier under the model and is
    rejected — its variance is replaced by :data:`_GATED_R`, so it
    contributes ~zero gain, exactly like a missing reading.  ``gate=inf``
    disables gating (the ``where`` masks select every original value, so
    results are bit-identical to the ungated filter)."""
    a_pred = jnp.matmul(A, a, precision=_HP)
    P_pred = jnp.matmul(jnp.matmul(A, P, precision=_HP), A.T,
                        precision=_HP) + Q
    PHt = jnp.matmul(P_pred, H.T, precision=_HP)               # (r, s)
    innov = y0 - jnp.matmul(H, a_pred, precision=_HP)
    hpht_diag = jnp.sum(H * PHt.T, axis=1)                     # (s,)
    S_diag = hpht_diag + r_diag
    rej = jnp.square(innov) > jnp.square(gate) * S_diag
    # RELATIVE variance floor: with more sensors than modes, H P H^T has
    # rank <= r < s, so an (near-)exact-measurement R (0, or an absolute
    # floor below fp32 eps * ||S||) leaves S singular and the fp32 SPD
    # solve NaN-poisons the whole series.  Flooring at 1e-6 of each
    # entry's own predicted variance keeps the solve well-posed at every
    # scale while leaving any realistic R (> 1e-6 relative) bit-unchanged.
    r_eff = jnp.maximum(r_diag, _R_FLOOR_REL * hpht_diag)
    r_eff = jnp.where(rej, jnp.full_like(r_diag, _GATED_R), r_eff)
    S = jnp.matmul(H, PHt, precision=_HP) + jnp.diag(r_eff)    # (s, s) SPD
    K = jax.scipy.linalg.solve(S, PHt.T, assume_a="pos").T     # (r, s)
    # a REJECTED entry's innovation is zeroed outright: the gated gain is
    # ~1e-12 but not exactly 0, and a large finite garbage reading (e.g.
    # a 1e36 DAQ fill value, which passes upstream isfinite masks) times
    # a 1e-12 leak still drags or overflows the state — zeroing makes
    # gating EXACTLY equivalent to a missing reading
    innov_eff = jnp.where(rej, jnp.zeros_like(innov), innov)
    a_new = a_pred + jnp.matmul(K, innov_eff, precision=_HP)
    IKH = jnp.eye(a.shape[0], dtype=P.dtype) \
        - jnp.matmul(K, H, precision=_HP)
    P_new = jnp.matmul(jnp.matmul(IKH, P_pred, precision=_HP), IKH.T,
                       precision=_HP) \
        + jnp.matmul(K * r_eff[None, :], K.T, precision=_HP)
    P_new = 0.5 * (P_new + P_new.T)
    return a_new, P_new, a_pred, P_pred, rej


def _kf_step(A, Q, H, gate, carry, inputs):
    a, P = carry
    y0, r_diag = inputs
    a_new, P_new, _, _, rej = _kf_core(A, Q, H, a, P, y0, r_diag, gate)
    return (a_new, P_new), (a_new, jnp.diagonal(P_new), rej)


def _kf_step_full(A, Q, H, gate, carry, inputs):
    """Filter step that also emits the full covariances and predictions
    (the RTS backward pass consumes them)."""
    a, P = carry
    y0, r_diag = inputs
    a_new, P_new, a_pred, P_pred, rej = _kf_core(A, Q, H, a, P, y0,
                                                 r_diag, gate)
    return (a_new, P_new), (a_new, P_new, a_pred, P_pred, rej)


@functools.partial(jax.jit, static_argnames=("return_rejected",))
def kalman_filter(A, Q, H, a0, P0, Y0, R_diag, gate=None,
                  return_rejected: bool = False):
    """Filter a series of SCALED measurements through the reduced dynamics.

    A (r, r), Q (r, r): dynamics and process noise (reduced space).
    H (s, r): measurement matrix (``Theta`` for gappy sensing).
    a0 (r,), P0 (r, r): prior state at the step BEFORE ``Y0[0]``.
    Y0 (K, s): scaled measurement series; R_diag (K, s): per-step
    measurement-noise variances (scaled space; 0 = exact measurement).
    gate: optional innovation-gating threshold in predicted standard
    deviations — entries whose innovation exceeds ``gate * sqrt(S_ii)``
    are rejected as gross outliers (zero gain); ``None`` disables gating
    (results bit-identical to the ungated filter).

    Returns ``(A_filt (K, r), var_diag (K, r), (a_K, P_K))`` — the filtered
    means, their marginal variances, and the final carry for streaming
    continuation; with ``return_rejected=True`` a fourth (K, s) boolean
    array marks the gated entries.  One ``lax.scan``: a K-frame series is
    a single device dispatch.
    """
    g = jnp.inf if gate is None else gate
    step = functools.partial(_kf_step, A, Q, H, g)
    (aK, PK), (A_filt, var, rej) = jax.lax.scan(
        step, (a0, P0), (Y0, R_diag))
    if return_rejected:
        return A_filt, var, (aK, PK), rej
    return A_filt, var, (aK, PK)


@functools.partial(jax.jit, static_argnames=("return_rejected",))
def kalman_smoother(A, Q, H, a0, P0, Y0, R_diag, gate=None,
                    return_rejected: bool = False):
    """Rauch–Tung–Striebel smoothing of the full measurement series.

    Same inputs/contract as :func:`kalman_filter` (including the optional
    innovation ``gate``, applied on the forward pass), but every returned
    mean conditions on ALL K measurements (the filter conditions step k on
    measurements 0..k only) — the right estimator for OFFLINE analysis of a
    recorded series.  Returns ``(A_smooth (K, r), var_diag (K, r),
    (a_K, P_K))`` where the carry is the FORWARD filter's final state (so a
    streaming continuation picks up exactly where filtering would).

    Shape: one forward ``lax.scan`` (Joseph-form, emitting the full
    covariances) + one ``reverse=True`` scan for the backward gain
    ``G_k = P_k A^T P_{k+1|k}^{-1}`` — computed via an SPD solve, never an
    explicit inverse.  Still two device dispatches' worth of work fused in
    one program: no Python loop, no (K, r, r) host round-trips.
    """
    if Y0.shape[0] == 0:
        raise ValueError(
            "kalman_smoother needs at least one frame (K >= 1); an empty "
            "series has no last filtered state to smooth from.")
    g = jnp.inf if gate is None else gate
    step = functools.partial(_kf_step_full, A, Q, H, g)
    (aK, PK), (A_f, P_f, A_p, P_p, rej) = jax.lax.scan(
        step, (a0, P0), (Y0, R_diag))

    def back(carry, inputs):
        a_s, P_s = carry
        a_f, P_fk, a_p1, P_p1 = inputs   # filtered at k, prediction at k+1
        # G^T = P_{k+1|k}^{-1} A P_k  (SPD solve)
        Gt = jax.scipy.linalg.solve(
            P_p1, jnp.matmul(A, P_fk, precision=_HP), assume_a="pos")
        a_new = a_f + jnp.matmul(Gt.T, a_s - a_p1, precision=_HP)
        P_new = P_fk + jnp.matmul(
            jnp.matmul(Gt.T, P_s - P_p1, precision=_HP), Gt, precision=_HP)
        P_new = 0.5 * (P_new + P_new.T)
        return (a_new, P_new), (a_new, jnp.diagonal(P_new))

    inputs = (A_f[:-1], P_f[:-1], A_p[1:], P_p[1:])
    _, (A_sm, var_sm) = jax.lax.scan(
        back, (A_f[-1], P_f[-1]), inputs, reverse=True)
    A_smooth = jnp.concatenate([A_sm, A_f[-1:]], axis=0)
    var = jnp.concatenate([var_sm, jnp.diagonal(P_f[-1])[None, :]], axis=0)
    if return_rejected:
        return A_smooth, var, (aK, PK), rej
    return A_smooth, var, (aK, PK)
