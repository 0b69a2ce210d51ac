"""Box-constrained quadratic programming on device (ADMM).

Replaces every CVXPY/Clarabel use in the reference — all of which are
box-constrained least squares or box-constrained Gaussian-MAP QPs:

* COLS gappy-POD predict (``sparse_sensing.py:880-892``):
  ``min ‖W(y0 − Θ g)‖²  s.t.  lo ≤ Ur g ≤ hi``
* CPOD (``sparse_sensing.py:434-461``):
  ``min ‖Ur g − x0‖²    s.t.  lo ≤ Ur g ≤ hi``
* constrained GPR MAP (``gpr.py:569-580``):
  ``min (v−μ)ᵀ Σ⁻¹ (v−μ)  s.t.  lo ≤ Ur diag(Σ_r) v ≤ hi``

All reduce to  ``min ½ gᵀH g − cᵀg  s.t.  lo ≤ A g ≤ hi``  with a tiny
(r × r) Hessian and a tall constraint operator A (n × r).  The ADMM splitting
``z = A g`` costs two (n, r) matvecs per iteration — pure MXU work over the
HBM-resident basis, no host round-trip, vmappable over batches of snapshots.
The (r, r) g-update factorization ``chol(H + ρ AᵀA)`` is trivial next to
the (n, r) matvecs and is recomputed each step so the penalty ρ can adapt
(residual balancing).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


class ADMMInfo(NamedTuple):
    iterations: jax.Array  # int32
    primal_residual: jax.Array
    dual_residual: jax.Array


class LinearConstraints(NamedTuple):
    """Stacked linear constraint set ``lo ≤ A g ≤ hi``.

    This is the device-native equivalent of the reference's "caller-built
    CVXPY problem" (``sparse_sensing.py:434-461``, ``gpr.py:569-580``): every
    constraint the reference actually uses is an interval on a linear map of
    the coefficients, so a general set is expressed by STACKING operators:

    * box:        rows with finite ``lo < hi``;
    * equality:   rows with ``lo == hi`` (e.g. boundary-condition pins);
    * one-sided:  rows with ``lo = -inf`` or ``hi = +inf``.

    ``lo``/``hi`` may carry a leading batch dimension (per-snapshot CPOD
    values, per-test-point GPR boundary conditions — the reference's
    ``bc0_limits`` pattern, ``gpr.py:575-578``) while the operator ``A`` is
    shared; batched solves vmap over that axis.
    """
    A: jax.Array    # (q, r)
    lo: jax.Array   # (q,) or (batch, q)
    hi: jax.Array   # (q,) or (batch, q)

    @property
    def batched(self) -> bool:
        return jnp.ndim(self.lo) == 2 or jnp.ndim(self.hi) == 2


def concat_constraints(parts) -> LinearConstraints:
    """Stack multiple :class:`LinearConstraints` into one set.

    Unbatched parts broadcast against batched ones (the shared-operator,
    per-item-values pattern)."""
    parts = [LinearConstraints(*p) for p in parts]
    A = jnp.concatenate([jnp.atleast_2d(p.A) for p in parts], axis=0)
    batch_sizes = {p.lo.shape[0] for p in parts if jnp.ndim(p.lo) == 2}
    batch_sizes |= {p.hi.shape[0] for p in parts if jnp.ndim(p.hi) == 2}
    if len(batch_sizes) > 1:
        raise ValueError(
            f"inconsistent constraint batch sizes: {sorted(batch_sizes)}")
    if batch_sizes:
        b = batch_sizes.pop()
        lo = jnp.concatenate(
            [jnp.broadcast_to(jnp.atleast_1d(p.lo),
                              (b, jnp.atleast_2d(p.A).shape[0]))
             for p in parts], axis=1)
        hi = jnp.concatenate(
            [jnp.broadcast_to(jnp.atleast_1d(p.hi),
                              (b, jnp.atleast_2d(p.A).shape[0]))
             for p in parts], axis=1)
    else:
        # broadcast scalar / length-1 bounds to each part's row count,
        # like the batched branch — a mismatch would otherwise surface
        # only as an opaque broadcast error inside the jitted solver
        lo = jnp.concatenate(
            [jnp.broadcast_to(jnp.atleast_1d(p.lo),
                              (jnp.atleast_2d(p.A).shape[0],))
             for p in parts])
        hi = jnp.concatenate(
            [jnp.broadcast_to(jnp.atleast_1d(p.hi),
                              (jnp.atleast_2d(p.A).shape[0],))
             for p in parts])
    return LinearConstraints(A=A, lo=lo, hi=hi)


def build_constraint_set(constraints=None, box=None):
    """Compose a user `constraints` argument (a :class:`LinearConstraints`,
    a raw (A, lo, hi) tuple, or a list of either) with an optional scaled
    physical `box` part into ONE stacked set.

    This is the single implementation of the "`limits` and `constraints`
    compose" contract shared by ``ROM.CPOD``, ``SPR.predict`` (COLS), and
    ``SoftSensor.from_spr`` — both given means both enforced, never a
    silent drop.  Returns ``(cs, box_only)`` where ``box_only`` is True
    when the set is exactly the box part (callers can then reuse an
    already-computed operator Gram), or ``(None, False)`` when neither
    argument was given.
    """
    def as_part(c):
        return c if isinstance(c, LinearConstraints) else \
            LinearConstraints(*c)

    parts = []
    if constraints is not None:
        if isinstance(constraints, LinearConstraints):
            parts.append(constraints)
        elif isinstance(constraints, (list, tuple)):
            # disambiguate the documented RAW (A, lo, hi) triple from a
            # list of constraint sets: a triple's first element is the
            # 2-D operator itself, a list's elements are sets/tuples
            # (previously a raw triple was unpacked ROW-WISE as
            # constructor args — garbage constraints for q == 3, a
            # confusing TypeError otherwise)
            if (len(constraints) == 3
                    and not isinstance(constraints[0],
                                       (LinearConstraints, list, tuple))
                    and jnp.ndim(constraints[0]) == 2):
                parts.append(LinearConstraints(*constraints))
            else:
                parts.extend(as_part(c) for c in constraints)
        else:
            parts.append(LinearConstraints(*constraints))
    n_user = len(parts)
    if box is not None:
        parts.append(LinearConstraints(*box))
    if not parts:
        return None, False
    cs = parts[0] if len(parts) == 1 else concat_constraints(parts)
    # exactly-the-box also when `constraints` was an EMPTY list
    return cs, n_user == 0


@functools.partial(jax.jit, static_argnames=("max_iter", "tol", "adapt_rho"))
def admm_box_qp(
    H: jax.Array,
    c: jax.Array,
    A: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    AtA: Optional[jax.Array] = None,
    rho: Optional[jax.Array] = None,
    max_iter: int = 2000,
    tol: float = 1e-8,
    over_relax: float = 1.6,
    n_rows: Optional[jax.Array] = None,
    adapt_rho: bool = True,
) -> Tuple[jax.Array, ADMMInfo]:
    """Solve ``min ½ gᵀH g − cᵀg  s.t. lo ≤ A g ≤ hi``.

    Parameters
    ----------
    H : (r, r) PSD Hessian.
    c : (r,) linear term.
    A : (n, r) constraint operator.
    AtA : (r, r), optional — pass when known analytically (e.g. identity for
        an orthonormal POD basis) to skip the n-row Gram.
    rho : optional ADMM penalty; defaults to ``tr(H)/tr(AᵀA)`` (scale-matched).
    n_rows : optional ACTIVE constraint-row count for the residual
        normalizations, defaulting to ``A.shape[0]``.  Sharded serving pads
        the constraint set with inert rows (zero operator, [0, 0] bounds) to
        make it divisible by the mesh axis; those rows contribute exactly
        zero to every matvec and norm, so with the unpadded count passed
        here the whole iteration trajectory — including the ρ-adaptation
        decisions below — is bit-identical to the unpadded solve, which is
        what makes the sharded-vs-single-device COEFFICIENT parity exact
        (``tests/test_parallel.py`` TestShardedServing).
    adapt_rho : True (default) keeps the residual-balancing ρ schedule —
        the robust general-purpose path.  ``adapt_rho=False`` is the
        FIXED-ρ fast path for fixed-budget serving: the (r, r)
        factorization hoists out of the loop and, with ``tol=0``, the
        per-iteration residual norms are skipped entirely (they only feed
        the schedule/stop test; one final pass still fills
        :class:`ADMMInfo`).  Measured on the flagship COLS serving batch
        (300 iters, batch 50, v5e): 1.82 → 0.92 ms/frame (2.0×) with
        equivalent converged accuracy (probe in docs/performance.md) —
        but on ILL-SCALED problems a fixed scale-matched ρ can converge
        far slower than the balancing schedule, so it is opt-in.
    """
    r = H.shape[0]
    dtype = H.dtype
    hp = jax.lax.Precision.HIGHEST
    if AtA is None:
        AtA = jnp.matmul(A.T, A, precision=hp)
    if rho is None:
        rho = (jnp.trace(H) + jnp.asarray(1e-12, dtype)) / (
            jnp.trace(AtA) + jnp.asarray(1e-12, dtype))
        rho = jnp.maximum(rho, jnp.asarray(1e-8, dtype))

    rho0 = rho
    eye_r = jnp.eye(r, dtype=dtype)
    # eps-level ridge on the g-update factor: when BOTH H and AtA are
    # rank-deficient (fewer sensors than modes AND a thin constraint set)
    # H + rho*AtA is singular and cho_factor would silently return NaN —
    # the 64·eps·(tr/r) shift keeps the factor finite at a perturbation
    # far below the solver tolerance, and is invisible for any
    # full-rank combination
    eps = jnp.finfo(dtype).eps
    # relative convergence floor: the residuals of an O(scale) problem
    # stall at rounding level ~eps·scale, which a purely absolute tol
    # (1e-8 default) never reaches in fp32 — every on-TPU solve would
    # burn the full max_iter.  tol==0 keeps the exact fixed-budget
    # semantics (the serving kernels' deterministic-latency contract).
    eps_rel = 10.0 * eps
    normA = jnp.sqrt(jnp.trace(AtA))

    def factor(rho):
        M = H + rho * AtA
        return cho_factor(M + (64.0 * eps * (jnp.trace(M) / r)) * eye_r)

    g0 = cho_solve(factor(rho), c)                # ρ-regularized warm start
    z0 = jnp.clip(jnp.matmul(A, g0, precision=hp), lo, hi)
    w0 = jnp.zeros_like(z0)
    alpha = jnp.asarray(over_relax, dtype)
    sqrt_n = jnp.sqrt(jnp.asarray(
        A.shape[0] if n_rows is None else n_rows, dtype))
    sqrt_r = jnp.sqrt(jnp.asarray(r, dtype))
    # fixed-ρ fast path: the factor is loop-invariant — compute it ONCE
    # here (XLA hoists closure constants out of the while_loop); with
    # tol == 0 the residual norms are also dead (they only feed the stop
    # test and the ρ schedule), so the loop body shrinks to the two
    # (n, r) matvecs + clip — the 2.0× serving measurement in the
    # docstring
    fixed_fac = None if adapt_rho else factor(jnp.asarray(rho, dtype))
    # norms are skippable only when the stop test is dead: the fixed-rho
    # path with tol == 0 (tol is STATIC — a handful of knob constants —
    # precisely so this decision is concrete through nested jits)
    need_norms = adapt_rho or float(tol) > 0.0

    def residuals(Ag, z, z_new, rho):
        pri = jnp.linalg.norm(Ag - z_new) / sqrt_n
        dua = rho * jnp.linalg.norm(
            jnp.matmul(A.T, z_new - z, precision=hp)) / sqrt_r
        return pri, dua

    def cond(state):
        _, _, _, _, k, _, _, conv = state
        return jnp.logical_and(k < max_iter, jnp.logical_not(conv))

    def body(state):
        g, z, w, rho, k, _, _, _ = state
        # The (r, r) factorization is trivial next to the (n, r) matvecs, so
        # refactorizing every step lets ρ adapt freely (adaptive path).
        fac = factor(rho) if adapt_rho else fixed_fac
        g = cho_solve(fac,
                      c + rho * jnp.matmul(A.T, z - w, precision=hp))
        Ag = jnp.matmul(A, g, precision=hp)
        Ag_relaxed = alpha * Ag + (1.0 - alpha) * z
        z_new = jnp.clip(Ag_relaxed + w, lo, hi)
        w = w + Ag_relaxed - z_new
        if not need_norms:
            return (g, z_new, w, rho, k + 1,
                    jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
                    jnp.asarray(False))
        pri, dua = residuals(Ag, z, z_new, rho)
        z_scale = jnp.linalg.norm(z_new) / sqrt_n
        has_tol = jnp.asarray(tol, dtype) > 0
        pri_thr = tol + jnp.where(
            has_tol,
            eps_rel * jnp.maximum(jnp.linalg.norm(Ag) / sqrt_n, z_scale),
            0.0)
        dua_thr = tol + jnp.where(
            has_tol, eps_rel * rho * normA * z_scale / sqrt_r, 0.0)
        conv = jnp.logical_and(pri <= pri_thr, dua <= dua_thr)
        if not adapt_rho:
            return g, z_new, w, rho, k + 1, pri, dua, conv
        # Residual balancing (Boyd et al. §3.4.1): grow ρ when the primal
        # residual dominates, shrink when the dual does; rescale the scaled
        # dual variable accordingly.  Dramatically tightens box feasibility
        # on ill-scaled problems vs a fixed penalty.
        grow = pri > 10.0 * dua
        shrink = dua > 10.0 * pri
        factor_rho = jnp.where(grow, 2.0, jnp.where(shrink, 0.5, 1.0))
        # clamp: rho must not shrink to zero (nor blow up) under repeated
        # rebalancing — the factor's conditioning tracks rho
        rho_new = jnp.clip(rho * factor_rho, rho0 * 1e-6, rho0 * 1e6)
        w = w * (rho / rho_new)
        return g, z_new, w, rho_new, k + 1, pri, dua, conv

    big = jnp.asarray(jnp.inf, dtype)
    g, z, w, rho, k, pri, dua, _ = jax.lax.while_loop(
        cond, body, (g0, z0, w0, jnp.asarray(rho, dtype),
                     jnp.asarray(0, jnp.int32), big, big,
                     jnp.asarray(False)))

    if not need_norms:
        # one post-loop pass fills the diagnostics the skipped per-iter
        # norms would have provided (the LAST iterate's residuals)
        Ag = jnp.matmul(A, g, precision=hp)
        pri = jnp.linalg.norm(Ag - jnp.clip(Ag, lo, hi)) / sqrt_n
        dua = jnp.asarray(jnp.nan, dtype)   # no z_{k-1} retained
    info = ADMMInfo(iterations=k, primal_residual=pri, dual_residual=dua)
    return g, info


@functools.partial(jax.jit, static_argnames=("max_iter", "tol", "adapt_rho"))
def box_constrained_lstsq(
    Theta: jax.Array,
    y: jax.Array,
    w_diag: jax.Array,
    A: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    AtA: Optional[jax.Array] = None,
    max_iter: int = 2000,
    tol: float = 1e-8,
    over_relax: float = 1.6,
    n_rows: Optional[jax.Array] = None,
    adapt_rho: bool = True,
) -> Tuple[jax.Array, ADMMInfo]:
    """``min ‖diag(w)(y − Θ g)‖²  s.t. lo ≤ A g ≤ hi`` (COLS, CPOD).

    The half-factor convention cancels: stationary points match the
    reference's CVXPY objective exactly.
    """
    hp = jax.lax.Precision.HIGHEST
    Wt = Theta * w_diag[:, None]
    Wy = y * w_diag
    H = jnp.matmul(Wt.T, Wt, precision=hp)
    c = jnp.matmul(Wt.T, Wy, precision=hp)
    return admm_box_qp(H, c, A, lo, hi, AtA=AtA, max_iter=max_iter, tol=tol,
                       over_relax=over_relax, n_rows=n_rows,
                       adapt_rho=adapt_rho)


@functools.partial(jax.jit, static_argnames=("max_iter", "tol", "adapt_rho"))
def box_constrained_map(
    mean: jax.Array,
    cov: jax.Array,
    A: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    AtA: Optional[jax.Array] = None,
    max_iter: int = 2000,
    tol: float = 1e-8,
    over_relax: float = 1.6,
    n_rows: Optional[jax.Array] = None,
    adapt_rho: bool = True,
) -> Tuple[jax.Array, ADMMInfo]:
    """Gaussian MAP under box constraints:
    ``max −(v−μ)ᵀ cov⁻¹ (v−μ)  s.t. lo ≤ A v ≤ hi`` — the constrained GPR
    prediction QP (``gpr.py:569-580``).

    ``cov⁻¹`` is never formed: with ``L = chol(cov)`` and the whitened
    variable ``u = L⁻¹(v − μ)`` the problem becomes
    ``min ½‖u‖²  s.t.  lo − Aμ ≤ (A L) u ≤ hi − Aμ`` — identity Hessian,
    perfectly conditioned, one triangular transform each way."""
    hp = jax.lax.Precision.HIGHEST
    L = jnp.linalg.cholesky(cov)
    r = mean.shape[0]
    H = jnp.eye(r, dtype=cov.dtype)
    c = jnp.zeros((r,), dtype=cov.dtype)
    A_mu = jnp.matmul(A, mean, precision=hp)
    AL = jnp.matmul(A, L, precision=hp)
    if AtA is not None:
        ALtAL = jnp.matmul(L.T, jnp.matmul(AtA, L, precision=hp),
                           precision=hp)
    else:
        ALtAL = None
    u, info = admm_box_qp(H, c, AL, lo - A_mu, hi - A_mu, AtA=ALtAL,
                          max_iter=max_iter, tol=tol, over_relax=over_relax,
                          n_rows=n_rows, adapt_rho=adapt_rho)
    return mean + jnp.matmul(L, u, precision=hp), info
