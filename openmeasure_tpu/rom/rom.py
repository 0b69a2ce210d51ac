"""Reduced-order-model core: the ``ROM`` class.

API-parity re-implementation of the reference ``ROM``
(``sparse_sensing.py:18-511``) on a TPU-native substrate:

* scaling is one fused XLA pass (``openmeasure_tpu.core.scaling``),
* the POD decomposition is a Gram-route tall-skinny SVD
  (``openmeasure_tpu.linalg.svd``) instead of LAPACK ``gesdd``,
* constrained POD (CPOD) solves its per-snapshot box-constrained projection
  with a vmapped on-device ADMM QP (``openmeasure_tpu.linalg.boxls``) instead
  of CVXPY→Clarabel, batching all m snapshots in one program,
* reconstruction + unscaling is a single batched matmul pass instead of the
  reference's per-column Python loop (``sparse_sensing.py:367-373``).

Public attributes mirror the reference: ``X_cnt, X_scl, X0, Ur, Ar, Vr,
Sigma_r, r``.  Attributes are JAX arrays; they interoperate with numpy
(``np.asarray`` / ``__array__``) so downstream user code keeps working.

Documented deviations (SURVEY §4 convention):

* ``adaptive_sampling`` computes its scaled matrix with the module-level
  scaling function and does NOT overwrite ``self.X_cnt``/``X_scl`` — the
  reference routes through ``self.scale_data`` whose side effect replaces
  the fitted reconstruction statistics with whatever ``scale_type`` the
  sampling call used (a post-fit ``adaptive_sampling(P, 'range')`` there
  silently corrupts every later ``reconstruct``);
* the leave-one-out influence uses the intended projector form — the
  reference's literal scalar-product expression is a bug, pinned
  bit-exact in ``tests/test_reference_diff.py`` (see
  ``adaptive_sampling``'s docstring);
* a (re)``fit`` invalidates subclass trained state derived from the old
  basis (SPR's ``Theta``, GPR's hyperparameters/training set) via
  ``_invalidate_trained_state`` — the reference keeps them, silently
  solving against the stale basis while reconstructing with the new one.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core import scaling as _scaling
from ..linalg import svd as _svd
from ..linalg import boxls as _boxls


def _as_device(x):
    return x if isinstance(x, jax.Array) else jnp.asarray(x)


def apply_sampling(sampling, M):
    """Apply a measurement/sampling operator to an (n, ...) array.

    Accepts dense numpy/JAX arrays, scipy.sparse matrices, or JAX BCOO —
    the CTC workflow feeds huge sparse operators (reference uses scipy CSR,
    ``utils.py:466-468``)."""
    try:
        import scipy.sparse as sp
        if sp.issparse(sampling):
            return jnp.asarray(sampling.dot(np.asarray(M)))
    except ImportError:  # pragma: no cover
        pass
    try:
        from jax.experimental import sparse as jsparse
        if isinstance(sampling, jsparse.BCOO):
            return sampling @ _as_device(M)
    except ImportError:  # pragma: no cover
        pass
    return jnp.matmul(_as_device(sampling), _as_device(M),
                      precision=jax.lax.Precision.HIGHEST)


def scale_measurement_values(y, cnt_vector, scl_full, n_points):
    """Value-column measurement scaling — the single source for the
    reference's ``SPR.scale_vector`` semantics (``sparse_sensing.py:553-
    584``): each measurement's scale is the feature-block SCALAR
    ``X_scl[feature_id * n_points]`` (the block start — every row of a block
    shares it), its centering the precomputed ``C @ X_cnt``.  Shared by
    ``SPR.scale_vector`` and ``sensing.decoder.ShallowDecoder`` so the two
    reconstruction families can never diverge on measurement scaling.
    Returns ``(scaled_values, scl_vector)``."""
    y = np.asarray(y)
    scl_vector = np.asarray(scl_full)[y[:, 2].astype(int) * n_points]
    return (y[:, 0] - cnt_vector) / scl_vector, scl_vector


class ROM:
    """Reduced-order model over a feature-blocked snapshot matrix.

    Parameters (reference ``sparse_sensing.py:50-81``):

    X : array (n, m), n = n_features * n_points
    n_features : int
    xyz : array (n_points, 3)
    """

    def __init__(self, X, n_features, xyz):
        if not isinstance(X, (np.ndarray, jax.Array)):
            raise TypeError("The matrix X is not a numpy array.")
        if type(n_features) is not int:
            # reference parity (`type(...) is not int`): bool must NOT
            # pass as a feature count (same convention as select_rank)
            raise TypeError("The parameter n_features is not an integer.")
        self.X = X
        self.n_features = n_features
        self.xyz = xyz
        n = X.shape[0]
        self.n_points = n // n_features
        if n % n_features != 0:
            raise Exception("The number of rows of X is not a multiple of n_features")

    # ------------------------------------------------------------------ #
    # Scaling (reference sparse_sensing.py:83-240)
    # ------------------------------------------------------------------ #

    def scale_data(self, scale_type: str = "std", axis_cnt: Optional[int] = 1):
        X0, X_cnt, X_scl = _scaling.scale_data(
            _as_device(self.X), self.n_features, scale_type, axis_cnt)
        # Degenerate-block guard (documented deviation): a constant (dead)
        # feature block yields a zero/round-off-noise scale under the
        # spread-based scale types (std/pareto/range/variance/vast*), and
        # value-based types can hit exact zeros (l2 of a zero block, level
        # with zero mean).  The reference divides anyway
        # (`sparse_sensing.py:114-165`) and the resulting NaN/garbage
        # silently poisons the SVD and every downstream fit — raise HERE
        # with the offending feature ids instead.  Constancy is tested
        # directly (block max == min): the computed statistic of a
        # constant block can land at eps-level instead of exact zero
        # (XLA reassociation), which would dodge a pure zero test.  Cost:
        # two fused block reductions + an (n_features,) readback per fit.
        # The streaming tier already fails loudly on the same input
        # (tests/test_streaming.py zero-scale test).
        scl_blocks = np.asarray(X_scl[:: self.n_points, 0])
        bad = ~(np.isfinite(scl_blocks) & (scl_blocks != 0))
        if scale_type in ("std", "pareto", "range", "variance",
                          "vast", "vast_2", "vast_3", "vast_4"):
            Xb = _as_device(self.X).reshape(self.n_features,
                                            self.n_points, -1)
            spread = np.asarray(jnp.max(Xb, axis=(1, 2))
                                - jnp.min(Xb, axis=(1, 2)))
            bad |= spread == 0
        bad_idx = np.flatnonzero(bad)
        if bad_idx.size:
            raise ValueError(
                f"scale_data(scale_type={scale_type!r}): feature block(s) "
                f"{bad_idx.tolist()} are constant (dead channel) or have "
                f"a zero/non-finite scale factor "
                f"(values {scl_blocks[bad_idx].tolist()}). Dividing by it "
                "would silently corrupt the whole fit; drop or repair "
                "those features, or use scale_type='none'.")
        self.X_cnt = X_cnt
        self.X_scl = X_scl
        # new statistics invalidate SPR's cached C @ X_cnt and host scale
        # copy (a refit after train() must not mix old centering with new
        # scaling), and any cached COLS constraint set built on them
        self._cnt_vector_cache = None
        self._scl_vector_cache = None
        self._cols_cache = None
        return X0

    def scale_limits(self, limits: Sequence):
        """``limits = [mins, maxs]`` with per-feature ``(n_features,)``
        arrays (``sparse_sensing.py:173-210``).  Convenience beyond the
        reference: a scalar min/max broadcasts to every feature; any other
        size mismatch raises instead of the reference's opaque
        ``limits[0][i]`` indexing error."""
        def as_feature_vec(b, name):
            arr = jnp.atleast_1d(jnp.asarray(b, dtype=self.X_cnt.dtype))
            if arr.size == 1:
                return jnp.broadcast_to(arr.reshape(()), (self.n_features,))
            if arr.shape != (self.n_features,):
                raise ValueError(
                    f"limits {name} must be a scalar or an "
                    f"(n_features,) = ({self.n_features},) array; got "
                    f"shape {tuple(arr.shape)}.")
            return arr
        lo, hi = _scaling.scale_limits(
            as_feature_vec(limits[0], "min"),
            as_feature_vec(limits[1], "max"),
            self.X_cnt, self.X_scl, self.n_features)
        return [lo, hi]

    def unscale_data(self, x0, sampling=None):
        if sampling is None:
            return _scaling.unscale_data(_as_device(x0), self.X_cnt, self.X_scl)
        scl = apply_sampling(sampling, self.X_scl[:, 0])
        cnt = apply_sampling(sampling, self.X_cnt[:, 0])
        x0 = _as_device(x0)
        if x0.ndim == 1:
            return scl * x0 + cnt
        return scl[:, None] * x0 + cnt[:, None]

    # ------------------------------------------------------------------ #
    # Decomposition (reference sparse_sensing.py:242-340)
    # ------------------------------------------------------------------ #

    def decomposition(self, X0, select_modes: str = "variance", n_modes=99):
        """Thin POD of the scaled snapshots.  Returns (Ur, Ar,
        exp_variance[:r]); ``A = (diag(S) Vt)ᵀ``."""
        X0 = _as_device(X0)
        U, S, Vt = _svd.svd_tall_safe(X0)
        A = (S[:, None] * Vt).T
        exp_variance = _svd.explained_variance(S)
        Ur, Ar = self.reduction(U, A, exp_variance, select_modes, n_modes)
        r = Ar.shape[1]
        return Ur, Ar, exp_variance[:r]

    def reduction(self, U, A, exp_variance, select_modes, n_modes):
        r = _svd.select_rank(exp_variance, select_modes, n_modes, A.shape[1])
        self.r = r
        return _as_device(U)[:, :r], _as_device(A)[:, :r]

    # ------------------------------------------------------------------ #
    # Fit / reconstruct (reference sparse_sensing.py:342-375, 463-511)
    # ------------------------------------------------------------------ #

    def fit(self, scale_type: str = "std", axis_cnt: Optional[int] = 1,
            select_modes: str = "variance", n_modes=99, basis=None,
            config=None):
        """``config`` (:class:`openmeasure_tpu.core.config.FitConfig`)
        overrides the individual kwargs when given."""
        if config is not None:
            scale_type = config.scale_type
            axis_cnt = config.axis_cnt
            select_modes = config.select_modes
            n_modes = config.n_modes
        self.scale_type = scale_type
        self.X0 = self.scale_data(scale_type, axis_cnt)
        if basis is None:
            Ur, Ar, _ = self.decomposition(self.X0, select_modes, n_modes)
        else:
            Ur, Ar = _as_device(basis[0]), _as_device(basis[1])

        self.Ur = Ur
        self.Ar = Ar
        self.r = Ar.shape[1]

        Sigma_r = jnp.linalg.norm(Ar, axis=0)
        self.Vr = Ar / Sigma_r[None, :]
        self.Sigma_r = Sigma_r
        self._invalidate_trained_state()

    def _invalidate_trained_state(self):
        """Hook run at the end of every (re)fit: subclasses holding
        trained state derived from the basis (SPR's Theta, GPR's
        hyperparameters) drop it here — a refit silently serving
        stale-basis solves is the failure mode this prevents."""

    def update_basis(self, X_new, select_modes: str = "number",
                     n_modes=None, reorth: bool = True):
        """Append new snapshots and update the POD basis incrementally.

        Capability beyond the reference: acquiring new snapshots there means
        a full refit (``ROM.fit`` recomputes the SVD from scratch,
        ``sparse_sensing.py:463-511``) and ``GPR.update`` (``gpr.py:603-675``)
        extends only the GP training data, never the basis.  This uses
        Brand's rank-additive SVD update
        (:func:`openmeasure_tpu.linalg.incremental.svd_append_columns`):
        three narrow (n, r+q) panel passes + a tiny replicated SVD, no
        re-read of the original snapshots — exact (to round-off) for the
        rank-r matrix the current factorization represents.

        Semantics:

        * **Frozen scaling statistics** — ``X_new`` is scaled with the stats
          from :meth:`fit` (the same contract as ``GPR.update`` scaling new
          parameters with stored stats, ``gpr.py:630-632``).  A full refit
          would recompute means/scales over the enlarged set; after many
          updates drift the stats by refitting.
        * Rank selection: ``n_modes=None`` keeps the current rank r;
          otherwise ``select_modes``/``n_modes`` choose as in :meth:`fit`
          (``'variance'`` uses the *retained* energy — the tail discarded by
          the original truncation is gone).
        * Requires an unmodified POD factorization: call after :meth:`fit`.
          After :meth:`CPOD` the coefficients are constrained projections,
          not ``V diag(S)``, and the update would silently discard that —
          re-run CPOD after updating if constrained coefficients are needed.

        Updates ``X, X0, Ur, Ar, Vr, Sigma_r, r`` in place.
        """
        if not hasattr(self, "Ur"):
            raise AttributeError(
                "The fit function has to be called before update_basis.")

        X_new = np.asarray(X_new) if not isinstance(X_new, jax.Array) \
            else X_new
        if X_new.ndim == 1:
            X_new = X_new[:, None]
        if X_new.shape[0] != self.X.shape[0]:
            raise ValueError(
                f"X_new has {X_new.shape[0]} rows; expected "
                f"{self.X.shape[0]} (the fitted snapshot dimension).")

        Xn = _as_device(X_new).astype(self.Ur.dtype)
        X0n = (Xn - self.X_cnt) / self.X_scl
        self._update_basis_core(X0n, select_modes, n_modes, reorth)

        if isinstance(self.X, np.ndarray):
            self.X = np.concatenate([self.X, np.asarray(X_new)], axis=1)
        else:
            self.X = jnp.concatenate(
                [_as_device(self.X), Xn.astype(_as_device(self.X).dtype)],
                axis=1)
        if hasattr(self, "X0"):
            self.X0 = jnp.concatenate([self.X0, X0n], axis=1)

    def _update_basis_core(self, X0n, select_modes, n_modes, reorth):
        """Shared update math (in-core + streaming): Brand update of the
        current (Ur, Sigma_r, Vr) triple with the pre-scaled columns X0n,
        rank selection, attribute writes."""
        from ..linalg import incremental as _inc
        # eager host-f64 core SVD: accurate tail singular values on TPU
        # (device fp32 SVD loses them at cond(K) ~ 1e5 — see incremental.py)
        U2, S2, Vt2 = _inc.svd_append_columns_eager(
            self.Ur, self.Sigma_r, self.Vr.T, X0n, reorth=reorth)
        if n_modes is None:
            r_new = min(self.r, S2.shape[0])
        else:
            exp_var = _svd.explained_variance(S2)
            r_new = _svd.select_rank(exp_var, select_modes, n_modes,
                                     S2.shape[0])
        self.r = r_new
        self.Ur = U2[:, :r_new]
        self.Sigma_r = S2[:r_new]
        self.Vr = Vt2.T[:, :r_new]
        self.Ar = self.Vr * self.Sigma_r[None, :]

    def reconstruct(self, Ar, sampling=None):
        """``X_rec = Ur @ Arᵀ`` (optionally sampled), unscaled column-wise in
        one fused pass."""
        Ar = _as_device(Ar)
        hp = jax.lax.Precision.HIGHEST   # bf16 operands alone cost ~1e-4
        if Ar.ndim < 2:
            Ar = Ar[None, :]
        if sampling is not None:
            SUr = apply_sampling(sampling, self.Ur)
            X_rec = jnp.matmul(SUr, Ar.T, precision=hp)
            return self.unscale_data(X_rec, sampling)
        X_rec = jnp.matmul(self.Ur, Ar.T, precision=hp)
        return _scaling.unscale_data(X_rec, self.X_cnt, self.X_scl)

    # ------------------------------------------------------------------ #
    # CPOD (reference sparse_sensing.py:434-461)
    # ------------------------------------------------------------------ #

    def CPOD(self, limits=None, solver_fn=None, max_iter: int = 4000,
             tol: float = 1e-9, over_relax: float = 1.6, solver_config=None,
             constraints=None):
        """Constrained POD: per snapshot i solve
        ``min ‖Ur g − x0_i‖²  s.t. limits0[0] ≤ Ur g ≤ limits0[1]``
        and replace ``Ar ← G``, ``Vr ← G / Σ_r``.

        Must be called after :meth:`fit`.  The reference delegates each
        snapshot to a caller-built CVXPY problem solved serially
        (``sparse_sensing.py:449-454``); here all m snapshots are vmapped
        through the on-device ADMM box-QP in a single program.

        General constraint sets stay on device: pass ``constraints`` — a
        :class:`openmeasure_tpu.linalg.boxls.LinearConstraints` (or a list of
        them, stacked) in *scaled coefficient space*: box rows, equality pins
        (``lo == hi``), and one-sided rows (±inf) in any mix; ``lo``/``hi``
        may carry a leading per-snapshot batch axis (the reference's
        caller-built per-snapshot CVXPY problems, ``sparse_sensing.py:449-454``,
        all reduce to this form).  All m snapshots solve as one vmapped ADMM
        program.

        ``solver_fn(Ur, x0_i, g_init) -> g`` remains an escape hatch for
        genuinely nonlinear constraint sets, applied per snapshot on host.
        """
        if solver_config is not None:
            max_iter = solver_config.max_iter
            tol = solver_config.tol
            over_relax = solver_config.over_relax
        if solver_fn is not None:
            Gr = np.zeros_like(np.asarray(self.Ar))
            for i in range(Gr.shape[0]):
                Gr[i, :] = solver_fn(self.Ur, self.X0[:, i], self.Ar[i, :])
            Gr = jnp.asarray(Gr)
            self.admm_info = None          # host solver: no ADMM diagnostics
        else:
            Ur = self.Ur
            hp = jax.lax.Precision.HIGHEST
            # H = UrᵀUr (== I only for an unmasked orthonormal basis — a
            # masked placement zeroes rows of Ur destructively).
            H = jnp.matmul(Ur.T, Ur, precision=hp)

            # `limits` and `constraints` COMPOSE (single shared contract:
            # linalg.boxls.build_constraint_set) — both given → one stacked
            # set, the physical box is never silently dropped.
            box = None
            if limits is not None:
                lo_b, hi_b = self.scale_limits(limits)
                box = (Ur, lo_b, hi_b)
            cs, box_only = _boxls.build_constraint_set(constraints, box)
            if cs is None:
                raise ValueError(
                    "CPOD requires `limits`, `constraints`, or a solver_fn.")
            if box_only:
                A_c, lo, hi = Ur, cs.lo, cs.hi
                AtA = H                      # box-only: reuse the Ur Gram
            else:
                A_c = _as_device(cs.A)
                lo, hi = _as_device(cs.lo), _as_device(cs.hi)
                AtA = jnp.matmul(A_c.T, A_c, precision=hp)

            def solve_one(x0_col, lo_i, hi_i):
                return _boxls.admm_box_qp(
                    H, jnp.matmul(Ur.T, x0_col, precision=hp), A_c,
                    lo_i, hi_i, AtA=AtA, max_iter=max_iter, tol=tol,
                    over_relax=over_relax)

            in_axes = (1, 0 if jnp.ndim(lo) == 2 else None,
                       0 if jnp.ndim(hi) == 2 else None)
            Gr, info = jax.vmap(solve_one, in_axes=in_axes)(self.X0, lo, hi)
            # per-snapshot solver diagnostics (see SPR.predict note: large
            # primal residuals after the full budget flag infeasible sets)
            self.admm_info = info

        self.Ar = Gr
        self.Vr = Gr / self.Sigma_r[None, :]

    # ------------------------------------------------------------------ #
    # Adaptive sampling (reference sparse_sensing.py:377-432)
    # ------------------------------------------------------------------ #

    def adaptive_sampling(self, P, scale_type: str = "std", seed=None):
        """DoE enrichment: leave-one-snapshot-out SVD influence × LHS
        candidate distance (``sparse_sensing.py:377-432``).

        Deviation from the reference: the reference computes
        ``Vt[k,:] @ V[k,:]`` — a *scalar* inner product
        ``c_k = Σ_i Vt[k,i]·Vt[i,k]`` — where the leave-one-out projector
        ``I − v_k v_kᵀ`` was intended (``sparse_sensing.py:402``); the
        literal form builds ``diag(S)(I − c_k·𝟙𝟙ᵀ)``, a finite but
        meaningless uniform all-ones shift unrelated to removing snapshot
        k's direction.  We implement the intended rank-1 projector; the
        literal behavior is pinned bit-for-bit in
        ``tests/test_reference_diff.py::TestAdaptiveSamplingDiff``.
        """
        from scipy.stats import qmc

        X0, _, _ = _scaling.scale_data(_as_device(self.X), self.n_features,
                                       scale_type, 1)
        _, S, Vt = _svd.svd_tall(X0)
        V = Vt.T
        p = V.shape[0]

        def influence(k):
            proj = jnp.eye(p, dtype=X0.dtype) - jnp.outer(V[:, k], V[:, k])
            M = S[:, None] * proj
            Un, _, _ = jnp.linalg.svd(M, full_matrices=False)
            inf_ui = 1.0 / jnp.abs(jnp.diagonal(Un)) - 1.0
            return jnp.sum(S * inf_ui)

        # vmap holds batched (p, p) projectors/SVD workspaces -> O(p^3)
        # memory; a sequential lax.map keeps the reference's O(p^2) peak
        # for large snapshot counts (p = m is tiny in the reference
        # workloads, so vmap's one-dispatch win applies there)
        if p <= 64:
            Inf_basis = jax.vmap(influence)(jnp.arange(p))
        else:
            Inf_basis = jax.lax.map(influence, jnp.arange(p))
        Inf_rel = np.asarray(Inf_basis / jnp.sum(Inf_basis))

        P = np.asarray(P)
        n_dim = P.shape[1]
        sampler = qmc.LatinHypercube(d=n_dim, seed=seed)
        q = 100 * n_dim
        sample0 = sampler.random(n=q)
        span = P.max(axis=0) - P.min(axis=0)
        sample = span[None, :] * sample0 + P.min(axis=0)[None, :]

        dist = np.linalg.norm(sample[:, None, :] - P[None, :, :], axis=2)
        j = np.argmin(dist, axis=1)
        pot = dist[np.arange(q), j] * Inf_rel[j]
        return sample[np.argmax(pot), :]
