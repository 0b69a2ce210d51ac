"""Sparse Placement for Reconstruction (SPR).

API-parity re-implementation of the reference ``SPR``
(``sparse_sensing.py:513-901``) with TPU-native internals:

* ``optimal_placement('qr')`` → on-device greedy column-pivoted QR
  (``openmeasure_tpu.linalg.qrcp``) instead of LAPACK ``geqp3``;
* ``optimal_placement('gem')`` → batched greedy entropy maximization
  (``openmeasure_tpu.sensing.gem``);
* ``predict`` OLS path → batched float64 pinv least squares on HOST — the
  reference's exact LAPACK op (``:877``) over the whole vector list at once
  (the reference loops in Python, ``:865-899``).  Host-side because the
  (s, r) systems are tiny but can be ill-conditioned (cond ~1e4-1e5 on
  flame-scale placements), where an fp32 device pinv costs ~5e-4 field
  NRMSE; the compiled fp32 fast paths are ``pipelines`` / ``serving``;
* ``predict`` COLS path → on-device ADMM box-constrained LS
  (``openmeasure_tpu.linalg.boxls``) instead of CVXPY→Clarabel.

The measurement matrix C may be dense (numpy/JAX), scipy.sparse, or JAX BCOO
— the CTC workflow feeds sparse operators of shape (n_pixels, n_features·n_cells).

Documented deviation (SURVEY §4 convention): a σ=0 entry inside an
otherwise-weighted measurement vector receives the largest finite weight of
that vector instead of the reference's literal 1/0 → inf
(``sparse_sensing.py:872``), which sends NaNs through LAPACK's pinv.  Exact
measurements therefore dominate the weighted solve rather than breaking it.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from ..rom.rom import (ROM, apply_sampling, _as_device,
                       scale_measurement_values as _scale_measurement_values)
from ..linalg import qrcp as _qrcp
from ..linalg import qrcp_pallas as _qrcp_pl
from ..linalg import boxls as _boxls
from .gem import gem_select


class SPR(ROM):
    """Sparse placement + gappy-POD reconstruction (reference
    ``sparse_sensing.py:513-550``)."""

    def __init__(self, X, n_features, xyz):
        super().__init__(X, n_features, xyz)

    # ------------------------------------------------------------------ #
    # Measurement scaling (reference :553-584)
    # ------------------------------------------------------------------ #

    def scale_vector(self, y):
        """Scale a measurement vector y (s, 3) = [value, σ, feature-id] with
        the training statistics.  Returns y0 (s, 2).

        ``C @ X_cnt`` is constant once trained; :meth:`train` caches it so
        a stream of predict calls against a huge sparse CTC operator does
        not pay one SpMV per measurement vector."""
        y = np.asarray(y)
        cnt_vector = getattr(self, "_cnt_vector_cache", None)
        if cnt_vector is None:
            cnt_vector = np.asarray(apply_sampling(self.C, self.X_cnt[:, 0]))
            self._cnt_vector_cache = cnt_vector     # re-cache (one SpMV)
        scl_full = getattr(self, "_scl_vector_cache", None)
        if scl_full is None:
            # host copy cached: a per-call device readback costs a full
            # tunnel round-trip (~27-55 ms) per measurement vector
            scl_full = np.asarray(self.X_scl[:, 0])
            self._scl_vector_cache = scl_full
        vals, scl_vector = _scale_measurement_values(
            y, cnt_vector, scl_full, self.n_points)

        # float64: the host-f64 pinv solve downstream exists to avoid fp32
        # error — truncating the scaled values to the device storage dtype
        # here would round its RHS before it runs
        y0 = np.zeros((y.shape[0], 2), dtype=np.float64)
        y0[:, 0] = vals
        y0[:, 1] = y[:, 1] / scl_vector

        self.cnt_vector = cnt_vector
        self.scl_vector = scl_vector
        return y0

    # ------------------------------------------------------------------ #
    # Placement (reference :586-756)
    # ------------------------------------------------------------------ #

    def _invalidate_trained_state(self):
        """Refit hook (see :meth:`ROM.fit`): a new basis orphans the
        trained ``Theta`` — drop it so predict demands train() instead of
        silently solving against the old basis."""
        if getattr(self, "Theta", None) is not None:
            del self.Theta
            self._needs_retrain = True
        self._cols_cache = None

    def gem(self, Ur, n_sensors, mask, d_min, verbose):
        xyz_tiled = np.tile(np.asarray(self.xyz), (self.n_features, 1))
        return gem_select(Ur, xyz_tiled, n_sensors, mask, d_min, verbose)

    def optimal_placement(self, calc_type: str = "qr", n_sensors: int = 10,
                          mask=None, d_min: float = 0.0,
                          verbose: bool = False, config=None):
        """Compute the one-hot measurement matrix C (s, n).

        ``calc_type='qr'``: first-r column pivots of Urᵀ (LAPACK-geqp3
        semantics, s = r).  A region ``mask`` zeroes the excluded rows of Ur
        destructively, as in the reference (``sparse_sensing.py:737-738``).
        ``calc_type='dg'`` (beyond-reference): determinant-based greedy,
        D-optimal for any n_sensors including more sensors than modes.
        ``calc_type='vdg'`` (beyond-reference): vector-measurement greedy —
        n_sensors physical probes each measuring all n_features at one
        point; C gets n_sensors·n_features rows (sensor-major).

        ``config`` (:class:`openmeasure_tpu.core.config.PlacementConfig`)
        overrides calc_type/n_sensors/d_min/verbose when given.
        """
        if config is not None:
            calc_type = config.calc_type
            n_sensors = config.n_sensors
            d_min = config.d_min
            verbose = config.verbose
        n = self.X.shape[0]
        if calc_type == "qr":
            if mask is not None:
                keep = jnp.asarray(np.asarray(mask, dtype=bool))
                self.Ur = jnp.where(keep[:, None], self.Ur, 0.0)
            pivots = _qrcp_pl.qrcp_pivots_auto(self.Ur.T, self.r)
            C = _qrcp.pivots_to_onehot(pivots, n).astype(self.Ur.dtype)
        elif calc_type == "gem":
            P = self.gem(self.Ur, n_sensors, mask, d_min, verbose)
            C = np.zeros((P.size, n), dtype=np.dtype(self.Ur.dtype))
            C[np.arange(P.size), P] = 1.0
            C = jnp.asarray(C)
        elif calc_type == "dg":
            # determinant-based greedy (beyond-reference): D-optimal
            # selection supporting n_sensors > r (see sensing/dg.py).
            # Mask contract matches 'qr': excluded rows of Ur are zeroed
            # destructively so downstream COLS/reconstruct see the same
            # basis regardless of calc_type.
            from .dg import dg_select
            if mask is not None:
                keep = jnp.asarray(np.asarray(mask, dtype=bool))
                self.Ur = jnp.where(keep[:, None], self.Ur, 0.0)
            P = dg_select(self.Ur, n_sensors, mask)
            C = np.zeros((P.size, n), dtype=np.dtype(self.Ur.dtype))
            C[np.arange(P.size), P] = 1.0
            C = jnp.asarray(C)
        elif calc_type == "vdg":
            # vector-measurement greedy (beyond-reference): each sensor is a
            # physical probe measuring ALL n_features at one point — one
            # selection appends a whole p-row feature block to Theta (see
            # sensing/vector.py; Saito et al. arXiv:1906.00778).  The mask
            # restricts the candidate points WITHOUT zeroing the basis
            # (documented deviation from the 'qr'/'dg' contract).
            from .vector import vector_dg_select, vector_onehot
            P = vector_dg_select(self.Ur, self.n_features, n_sensors, mask,
                                 xyz=self.xyz, d_min=d_min)
            self.sensor_points = P
            C = vector_onehot(P, self.n_features, self.n_points,
                              dtype=np.dtype(self.Ur.dtype))
        else:
            raise NotImplementedError(
                "The sensor selection method has not been implemented yet")
        return C

    # ------------------------------------------------------------------ #
    # Train (reference :758-820)
    # ------------------------------------------------------------------ #

    def train(self, C, is_Theta: bool = False, limits=None,
              method: str = "OLS", solver: str = "ADMM", cond: bool = False,
              verbose: bool = False, admm_max_iter: int = 4000,
              admm_tol: float = 1e-9, admm_over_relax: float = 1.6,
              solver_config=None, constraints=None):
        """``limits=[min_per_feature, max_per_feature]`` is the reference's
        box; ``constraints`` (a
        :class:`openmeasure_tpu.linalg.boxls.LinearConstraints`, or a list to
        stack) generalizes it to any mix of box / equality / one-sided rows in
        scaled coefficient space, optionally with per-measurement-vector
        batched bounds.  ``solver_config``
        (:class:`openmeasure_tpu.core.config.SolverConfig`) overrides the
        ADMM knobs."""
        if solver_config is not None:
            admm_max_iter = solver_config.max_iter
            admm_tol = solver_config.tol
            admm_over_relax = solver_config.over_relax
        if constraints is not None and isinstance(constraints, (list, tuple)) \
                and not isinstance(constraints, _boxls.LinearConstraints):
            constraints = _boxls.concat_constraints(constraints)
        self.constraints = constraints
        if (C.shape[1] != self.X.shape[0]) and not is_Theta:
            raise ValueError("The number of columns of C does not match the"
                             " number of rows of X.")
        if not is_Theta:
            self.C = C
            Theta = apply_sampling(C, self.Ur)
            # constant across predicts (see scale_vector docstring)
            self._cnt_vector_cache = np.asarray(
                apply_sampling(C, self.X_cnt[:, 0]))
        else:
            Theta = _as_device(C)
            # a PREVIOUS train(C) must not survive: update_basis would
            # silently rebuild Theta from the old operator, and
            # scale_vector would center this Theta's measurements with
            # the old C's sensors
            self.C = None
            self._cnt_vector_cache = None

        if Theta.shape[1] != self.Ur.shape[1]:
            raise ValueError("The number of columns of Theta does not match"
                             " the number of columns of Ur.")

        self.Theta = Theta
        self._needs_retrain = False
        self._cols_cache = None
        self.limits = limits
        self.method = method
        self.solver = solver
        self.verbose = verbose
        self.admm_max_iter = admm_max_iter
        self.admm_tol = admm_tol
        self.admm_over_relax = admm_over_relax

        if cond:
            # host f64 SVD of Theta directly: cond(pinv(Theta)) ==
            # cond(Theta), and the reference's pinv detour
            # (sparse_sensing.py:813-820) run on-device would bury the
            # smallest singular value under TPU bf16/fp32 noise for
            # exactly the ill-conditioned placements users check k on
            S_theta = np.linalg.svd(np.asarray(Theta, dtype=np.float64),
                                    compute_uv=False)
            self.k = float(S_theta[0] / S_theta[-1])

    def update_basis(self, X_new, select_modes: str = "number",
                     n_modes=None, reorth: bool = True):
        """Incremental basis update (see :meth:`ROM.update_basis`) that keeps
        a trained sensor consistent: ``Theta = C @ Ur`` is re-derived from
        the stored measurement operator (the cached ``C @ X_cnt`` centering
        stays valid — update_basis freezes the scaling stats).  A sensor
        trained with ``is_Theta=True`` supplied a Theta encoding the OLD
        basis; it is invalidated and :meth:`train` must be called again."""
        super().update_basis(X_new, select_modes=select_modes,
                             n_modes=n_modes, reorth=reorth)
        self._refresh_theta_after_update()

    def _refresh_theta_after_update(self):
        if getattr(self, "Theta", None) is not None:
            self._cols_cache = None      # box part was built on old Ur
            if getattr(self, "C", None) is not None:
                self.Theta = apply_sampling(self.C, self.Ur)
            else:
                del self.Theta           # is_Theta path: must re-train
                self._needs_retrain = True

    def fit_predict(self, C, y, scale_type: str = "std",
                    select_modes: str = "variance", n_modes=99, **train_kw):
        """Convenience: fit + train + predict in one call.

        The reference *declares* this method in the SPR class docstring
        (``sparse_sensing.py:541-543``) but never defines it; implemented
        here with the documented signature semantics."""
        self.fit(scale_type=scale_type, select_modes=select_modes,
                 n_modes=n_modes)
        self.train(C, **train_kw)
        return self.predict(y)

    # ------------------------------------------------------------------ #
    # Predict (reference :822-901)
    # ------------------------------------------------------------------ #

    def predict(self, y):
        """Gappy-POD solve for one measurement vector (s, 3) or a list.

        Returns (Ar, Ar_sigma), each (n_vectors, r).  OLS: weighted pinv.
        COLS: box-constrained LS via ADMM with the physical `limits` given to
        :meth:`train`."""
        if not hasattr(self, "Theta"):
            if getattr(self, "_needs_retrain", False):
                raise AttributeError(
                    "the trained sensor was invalidated (the basis "
                    "changed after train(): a refit, or update_basis on "
                    "an is_Theta=True sensor) — call train() again; the "
                    "fitted basis is intact.")
            raise AttributeError("The function fit has to be called "
                                 "before calling predict.")
        if isinstance(y, (np.ndarray, jax.Array)):
            y = [y]
        for yi in y:
            if self.Theta.shape[0] != yi.shape[0]:
                raise ValueError("The number of rows of Theta does not match"
                                 " the number of rows of y.")
            if yi.shape[1] != 3:
                raise ValueError("The y array has the wrong number of columns."
                                 " y has to have dimensions (s,3).")

        n_vec = len(y)
        y0_np = np.stack([self.scale_vector(np.asarray(yi)) for yi in y])
        has_sigma = np.array([bool(np.any(np.asarray(yi)[:, 1])) for yi in y])

        y0_stack = jnp.asarray(y0_np)               # (n_vec, s, 2)
        s = y0_stack.shape[1]
        # Weighted solve: W = diag(1/σ).  Deviation from the reference
        # (sparse_sensing.py:872): a σ=0 entry inside an otherwise-weighted
        # vector yields an infinite weight there (NaNs out of LAPACK pinv);
        # here an exact measurement gets the LARGEST finite weight of its
        # vector, so it dominates the solve without poisoning it.
        sig_np = y0_np[:, :, 1].astype(np.float64)
        inv_sigma = np.where(sig_np > 0,
                             1.0 / np.where(sig_np > 0, sig_np, 1.0), 0.0)
        w_max = inv_sigma.max(axis=1, keepdims=True)
        w_weighted = np.where(sig_np > 0, inv_sigma, w_max)
        w_np = np.where(has_sigma[:, None], w_weighted,
                        np.ones((n_vec, s)))

        Theta = self.Theta

        # The eager pinv solve runs HOST-SIDE in float64 — exactly the
        # reference's LAPACK op (sparse_sensing.py:877).  On TPU the fp32
        # pinv of an ill-conditioned weighted Θ (cond ~1e4-1e5 on flame-
        # scale placements) costs ~5e-4 field NRMSE (measured); these (s, r)
        # systems are microseconds on host.  The compiled fp32 fast paths
        # live in `pipelines` and `serving`, where latency matters.
        Th64 = np.asarray(Theta, dtype=np.float64)
        WT = Th64[None, :, :] * w_np[:, :, None]        # (n_vec, s, r)
        pinvs = np.linalg.pinv(WT)                      # batched f64 pinv
        ar_np = np.einsum("vrs,vs->vr", pinvs, w_np * y0_np[:, :, 0])
        sig_prop = np.abs(np.einsum("vrs,vs->vr", pinvs, sig_np))
        ar_sigma_np = np.where(has_sigma[:, None], sig_prop, 0.0)
        dtype = np.dtype(Theta.dtype)
        Ar_ols = jnp.asarray(ar_np.astype(dtype))
        Ar_sigma = jnp.asarray(ar_sigma_np.astype(dtype))
        w = jnp.asarray(w_np.astype(dtype))

        if self.method == "OLS":
            Ar = Ar_ols
            self.admm_info = None          # no ADMM ran for this predict

        elif self.method == "COLS":
            hp = jax.lax.Precision.HIGHEST
            cache = getattr(self, "_cols_cache", None)
            if cache is None:
                # built ONCE per train/update (limits/constraints/Ur and
                # the scaling stats are train-time constants — rebuilding
                # the stacked set and the O(n r^2) operator Gram on every
                # predict would dominate streaming-predict latency)
                # `limits` and `constraints` COMPOSE (single shared
                # contract: linalg.boxls.build_constraint_set, as in
                # ROM.CPOD).
                box = None
                if self.limits is not None:
                    lo_b, hi_b = self.scale_limits(self.limits)
                    box = (self.Ur, lo_b, hi_b)
                cs, _ = _boxls.build_constraint_set(
                    getattr(self, "constraints", None), box)
                if cs is None:
                    raise ValueError(
                        "method='COLS' requires physical `limits` (or a "
                        "`constraints` set) passed to train(C, ...).")
                A_c = _as_device(cs.A)
                lo, hi = _as_device(cs.lo), _as_device(cs.hi)
                # One cheap panel pass for the exact Gram: Ur^T Ur == I
                # only for an unmasked POD basis (optimal_placement(mask=)
                # zeroes rows destructively, sparse_sensing.py:737-738).
                AtA = jnp.matmul(A_c.T, A_c, precision=hp)
                self._cols_cache = (A_c, lo, hi, AtA)
            else:
                A_c, lo, hi, AtA = cache

            def cols_one(w_i, y_i, lo_i, hi_i):
                return _boxls.box_constrained_lstsq(
                    Theta, y_i, w_i, A_c, lo_i, hi_i, AtA=AtA,
                    max_iter=self.admm_max_iter, tol=self.admm_tol,
                    over_relax=getattr(self, "admm_over_relax", 1.6))
            in_axes = (0, 0, 0 if jnp.ndim(lo) == 2 else None,
                       0 if jnp.ndim(hi) == 2 else None)
            Ar, info = jax.vmap(cols_one, in_axes=in_axes)(
                w, y0_stack[:, :, 0], lo, hi)
            # Per-vector solver diagnostics: a primal residual far above
            # tol after the full budget signals a (near-)infeasible
            # constraint set — e.g. physical limits that exclude the data —
            # where the returned coefficients are a compromise, not an
            # optimum.  The solve stays silent (device-side); callers can
            # inspect `self.admm_info`.
            self.admm_info = info
        else:
            raise NotImplementedError(
                "The prediction method selected has not been implemented yet")

        return Ar, Ar_sigma
