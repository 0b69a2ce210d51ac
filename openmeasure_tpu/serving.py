"""Low-latency soft-sensor serving.

The reference is a library for offline analysis; this module packages a
fitted model for production streaming inference: device-resident state,
pre-compiled fixed-shape predict functions, single dispatch per measurement
batch, and checkpoint loading.

    sensor = SoftSensor.from_spr(spr)              # or .load("ckpt.npz")
    x_hat = sensor(y_values)                       # (s,) -> (n,) field
    x_hat, a, sigma = sensor.predict_full(y_values, y_sigma)
    fields, A, sig = sensor.predict_batch(Y)       # (b, s) -> (b, n)

The compiled path fuses measurement scaling, the gappy-POD solve, and
reconstruction+unscaling into one XLA program.  Per-request latency is
bounded below by the host↔device round-trip (the result must come back to
be useful); high-rate streams should use :meth:`predict_batch` — measured
on a tunneled v5e (CTC COLS, 400-iter ADMM): 45.7 → 4.8 → 1.15 ms/frame
at batch 1 / 10 / 50.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def shard_state_rows(state, mesh, axis_name: str = "state",
                     row_keys=("Ur", "X_cnt", "X_scl", "A_c", "lo", "hi")):
    """Row-shard a serving-state pytree over one mesh axis (multi-chip
    serving).

    Every array named in ``row_keys`` is sharded along its leading
    dimension (the state dimension n — the tall axis of ``Ur`` and the
    constraint set); every other leaf is committed replicated to the same
    mesh.  Because the serving kernels take state as a pytree ARGUMENT,
    jitting them with a sharded state compiles an SPMD program: the (n, r)
    reconstruct and the per-iteration COLS/MAP constraint products run
    shard-local with only (r,)-sized cross-chip reductions — the same
    layout as ``parallel.sharded`` uses for training (SURVEY §5).

    Leading dims that are not divisible by the axis size (e.g. the
    flagship n = 165,258 on a 4-chip axis, or constraint sets with
    appended boundary-condition pins) are padded to the next multiple with
    INERT rows — zero basis/constraint rows, unit scale, [0, 0] bounds —
    before sharding (``jax.device_put`` requires divisibility).  The
    padded rows produce extra (zero·scale + zero-center) field entries and
    trivially-satisfied constraint rows; the sensors' ``shard()`` methods
    slice every field output back to the original n.  Parity vs the
    single-device sensor (tested): direct solves (OLS, GPR posterior) and
    f64 ADMM paths agree to reduction-order ULPs; fp32 fixed-budget ADMM
    paths agree to the solver's measured fp32 reproducibility (~2e-5
    relative — padding changes the contraction length, so per-iteration
    ULP noise compounds over the iteration budget).  The ADMM residual
    normalizations themselves are padding-invariant: the solvers receive
    the ACTIVE row count (``state["n_c"]``), not the padded shape.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    size = mesh.shape[axis_name]
    pad_value = {"X_scl": 1.0}

    def put_rep(x):
        if hasattr(x, "ndim"):
            return jax.device_put(x, NamedSharding(mesh, P()))
        return x

    out = {}
    for k, v in state.items():
        if k in row_keys and hasattr(v, "ndim") and v.ndim >= 1:
            n0 = v.shape[0]
            n_pad = -(-n0 // size) * size
            if n_pad != n0:
                widths = [(0, n_pad - n0)] + [(0, 0)] * (v.ndim - 1)
                v = jnp.pad(v, widths,
                            constant_values=pad_value.get(k, 0.0))
            spec = P(axis_name, *([None] * (v.ndim - 1)))
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        else:
            out[k] = jax.tree_util.tree_map(put_rep, v)
    return out


def _predict_math(state, y_values, y_sigma, method, admm_iters, over_relax,
                  adapt_rho=True):
    """The full single-request math: scaling → weighted QR(+refinement)
    solve → optional COLS ADMM → reconstruct+unscale.

    Model state arrives as a pytree ARGUMENT (not closure constants), so the
    jitted wrappers below are shared across every :class:`SoftSensor` of the
    same shapes — reloading a retrained checkpoint (blue/green deploys,
    periodic refits) hits the compile cache instead of paying a fresh
    XLA compile.
    """
    from .linalg import boxls as _boxls
    hp = jax.lax.Precision.HIGHEST
    y0 = (y_values - state["cnt_sensors"]) / state["scl_sensors"]
    sig0 = y_sigma / state["scl_sensors"]
    # Same weighted-path trigger as the eager SPR.predict (`np.any(yi[:, 1])`
    # — any NONZERO sigma, matching the reference's test at
    # sparse_sensing.py:869), not `> 0`: the two paths must agree even on
    # malformed (negative-sigma) input.
    use_w = jnp.any(y_sigma != 0)
    # Same weighting as SPR.predict (spr.py, documented deviation): a
    # σ=0 entry inside an otherwise-weighted vector gets the LARGEST
    # finite weight of the vector — exact measurements dominate — so
    # SoftSensor.from_spr(spr).predict(y) reproduces spr.predict(y).
    inv_sigma = jnp.where(sig0 > 0,
                          1.0 / jnp.where(sig0 > 0, sig0, 1.0), 0.0)
    w_max = jnp.max(inv_sigma)
    w = jnp.where(use_w, jnp.where(sig0 > 0, inv_sigma, w_max),
                  jnp.ones_like(sig0))
    # NaN sigma propagates (reference W=diag(1/sig0) semantics,
    # sparse_sensing.py:873) rather than silently taking the max weight —
    # the two paths must agree even on malformed input.  (DynamicSensor
    # masks non-finite sigmas as MISSING instead — documented difference:
    # a filter has a prior to fall back on, a memoryless solve does not.)
    w = jnp.where(jnp.isnan(sig0), jnp.nan, w)
    # Weighted LS via QR + ONE iterative-refinement step, not pinv: the
    # scaled per-feature sigmas make the weights span decades, so
    # cond(WΘ) reaches ~1e5 even for a well-conditioned Θ, and the
    # device fp32 SVD-route pinv then loses ~1% of the coefficients
    # (measured on flame-scale: pinv 3.3 abs err, QR 0.40, QR+refine
    # 5e-5 — fp32 round-off — vs the f64 solution; LAPACK-f64 parity
    # for the eager API lives in SPR.predict).
    Theta = state["Theta"]
    WT = Theta * w[:, None]
    Q, R = jnp.linalg.qr(WT)
    # Rank-deficiency guard: a masked placement can zero Ur rows
    # destructively and leave Theta singular; a zero on R's diagonal
    # would turn the triangular solves into NaN where pinv returned the
    # least-norm solution.  Floor the diagonal at eps-level — the
    # served solution is then a bounded REGULARIZED one (documented
    # deviation; the eager SPR.predict keeps exact f64 pinv semantics).
    d = jnp.diagonal(R)
    # Floor scales with max|diag(R)| only — an absolute clamp (e.g.
    # max(·, 1.0)) would assume O(1) scaling and silently over-regularize a
    # legitimately tiny-scale system.  The `where` guards the all-zero
    # operator (fully masked placement), where any positive floor just keeps
    # the solves finite.
    dmax = jnp.max(jnp.abs(d))
    floor = (jnp.where(dmax > 0, dmax, 1.0)
             * jnp.finfo(d.dtype).eps * WT.shape[0])
    d_safe = jnp.where(jnp.abs(d) < floor,
                       jnp.where(d < 0, -floor, floor), d)
    R = R + jnp.diag(d_safe - d)

    def wsolve(rhs):
        x = jax.scipy.linalg.solve_triangular(
            R, jnp.matmul(Q.T, rhs, precision=hp), lower=False)
        resid = rhs - jnp.matmul(WT, x, precision=hp)
        return x + jax.scipy.linalg.solve_triangular(
            R, jnp.matmul(Q.T, resid, precision=hp), lower=False)

    a_ols = jnp.where(use_w, wsolve(w * y0),
                      jnp.matmul(state["pinv"], y0, precision=hp))
    if method == "COLS":
        # tol=0 → the while_loop runs the full fixed budget: every
        # request compiles to the same instruction count (deterministic
        # latency), and the budget is the accuracy knob.
        # n_rows = the ACTIVE (unpadded) constraint-row count: keeps the
        # ADMM trajectory bit-identical after shard() pads inert rows.
        # adapt_rho=False is the fixed-rho fast path (admm_rho='fixed'):
        # hoisted factorization + no per-iter residual norms — measured
        # 2.0x on the flagship COLS batch at equivalent accuracy
        a, _ = _boxls.box_constrained_lstsq(
            Theta, y0, w, state["A_c"], state["lo"], state["hi"],
            AtA=state["AtA"], max_iter=admm_iters, tol=0.0,
            over_relax=over_relax, n_rows=state["n_c"],
            adapt_rho=adapt_rho)
    else:
        a = a_ols
    a_sigma = jnp.where(use_w, jnp.abs(wsolve(sig0)),
                        jnp.zeros(Theta.shape[1], dtype=y0.dtype))
    x = jnp.matmul(state["Ur"], a, precision=hp) * state["X_scl"] \
        + state["X_cnt"]
    return x, a, a_sigma


@functools.partial(jax.jit, static_argnames=("method", "admm_iters",
                                             "over_relax", "adapt_rho"))
def _predict_one(state, y_values, y_sigma, *, method, admm_iters,
                 over_relax, adapt_rho=True):
    return _predict_math(state, y_values, y_sigma, method, admm_iters,
                         over_relax, adapt_rho)


@functools.partial(jax.jit, static_argnames=("method", "admm_iters",
                                             "over_relax", "adapt_rho"))
def _predict_many(state, Y_values, Y_sigma, *, method, admm_iters,
                  over_relax, adapt_rho=True):
    return jax.vmap(lambda yv, ys: _predict_math(
        state, yv, ys, method, admm_iters, over_relax,
        adapt_rho))(Y_values, Y_sigma)


def _sp_coo(dat_idx, shape):
    import scipy.sparse as sp
    dat, idx = dat_idx
    return sp.coo_matrix((dat, (idx[:, 0], idx[:, 1])), shape=shape).tocsr()


def _measurement_scaling(C, X_cnt, X_scl, n_points, feature_ids=None):
    """Per-measurement centering (always ``C @ X_cnt``, reference
    ``sparse_sensing.py:573``) and scaling from a dense / scipy-sparse /
    BCOO measurement operator.

    For a one-hot C (QR/GEM/DG/VDG placements) the scaling is derived from
    the selected rows; a general C (e.g. CTC projections) needs
    ``feature_ids`` (s,) — the feature index of each measurement, the third
    column of the reference's measurement vectors."""
    import scipy.sparse as sp
    from jax.experimental import sparse as jsparse

    if isinstance(C, jsparse.BCOO):
        # BCOO analog of the CSR branch: SPR.train accepts BCOO measurement
        # operators (rom.py apply_sampling), so a BCOO-trained model must
        # package too.  Row-nnz / one-hot detection runs on the COO
        # triplets host-side — as does the center product, in float64
        # like the dense/scipy branches (a device matvec would run at the
        # ambient matmul precision on fp32-cast centers).
        idx = np.asarray(C.indices).reshape(-1, 2)
        dat = np.asarray(C.data).ravel()
        cnt_sensors = np.asarray(
            _sp_coo((dat, idx), C.shape).dot(np.asarray(X_cnt,
                                                        np.float64))).ravel()
        nz = dat != 0
        rows_nz, cols_nz, dat_nz = idx[nz, 0], idx[nz, 1], dat[nz]
        row_nnz = np.bincount(rows_nz, minlength=C.shape[0])
        # duplicate (row, col) triplets would double-count: only a
        # duplicate-free one-hot pattern takes the automatic path
        one_hot = bool(np.all(row_nnz == 1) and np.all(dat_nz == 1.0))
        argmax_rows = np.zeros(C.shape[0], dtype=int)
        if one_hot:
            argmax_rows[rows_nz] = cols_nz
    elif sp.issparse(C):
        cnt_sensors = np.asarray(C.dot(X_cnt)).ravel()
        # detect one-hot on the DUPLICATE-SUMMED canonical form: raw COO
        # triplets can hold two (i, j) ones whose effective row value is
        # 2.0 — checking raw .data would mis-scale that row silently
        Cc = C.tocsr().copy()
        Cc.sum_duplicates()
        row_nnz = np.diff(Cc.indptr)
        one_hot = bool(np.all(row_nnz == 1) and np.all(Cc.data == 1.0))
        argmax_rows = np.asarray(Cc.argmax(axis=1)).ravel()
    else:
        Cd = np.asarray(C)
        cnt_sensors = Cd @ X_cnt
        one_hot = bool(np.all((Cd != 0).sum(axis=1) == 1)
                       and np.all(Cd[Cd != 0] == 1.0))
        argmax_rows = np.argmax(Cd, axis=1)

    if feature_ids is not None:
        scl_sensors = X_scl[np.asarray(feature_ids, int) * n_points]
    elif one_hot:
        scl_sensors = X_scl[argmax_rows]
    else:
        raise ValueError(
            "C is not one-hot: pass feature_ids (the per-measurement "
            "feature indices) so measurement scaling is well-defined.")
    return cnt_sensors, scl_sensors


class SoftSensor:
    """Immutable, compiled gappy-POD soft sensor.

    ``method='COLS'`` serves the constrained model (the reference's flagship
    CTC use, ``docs/ctc_doc.ipynb`` cells 9-14): the gappy solve becomes a
    vmappable on-device ADMM QP against the constraint set captured at train
    time, run for a FIXED iteration budget (``admm_iters``) so request
    latency is deterministic."""

    def __init__(self, Ur, Theta, cnt_sensors, scl_sensors, X_cnt, X_scl,
                 dtype=jnp.float32, method: str = "OLS",
                 constraint_A=None, constraint_lo=None, constraint_hi=None,
                 admm_iters: int = 300, admm_over_relax: float = 1.6,
                 admm_rho: str = "adaptive"):
        self.Ur = jnp.asarray(Ur, dtype)
        self.Theta = jnp.asarray(Theta, dtype)
        self.cnt_sensors = jnp.asarray(cnt_sensors, dtype)
        self.scl_sensors = jnp.asarray(scl_sensors, dtype)
        self.X_cnt = jnp.asarray(X_cnt, dtype).reshape(-1)
        self.X_scl = jnp.asarray(X_scl, dtype).reshape(-1)
        self.r = self.Theta.shape[1]
        self.s = self.Theta.shape[0]
        # original (unpadded) state row count — shard() slices outputs
        # back to this, and re-sharding an already-sharded sensor onto a
        # different mesh must not inherit the previous padding
        self.n = int(self.Ur.shape[0])
        self.method = method
        # normalized so equal values hash equally across models (they key
        # the shared jitted kernels' static arguments)
        self.admm_iters = int(admm_iters)
        self.admm_over_relax = float(admm_over_relax)
        # 'adaptive' (default, residual-balancing rho — robust) or
        # 'fixed' (hoisted factorization + normless body: measured 2.0x
        # per-frame on the flagship COLS batch at equivalent converged
        # accuracy; see linalg/boxls.admm_box_qp adapt_rho)
        if admm_rho not in ("adaptive", "fixed"):
            raise ValueError(
                f"admm_rho must be 'adaptive' or 'fixed'; got {admm_rho!r}")
        self.admm_rho = admm_rho
        if method == "COLS":
            if constraint_A is None or constraint_lo is None \
                    or constraint_hi is None:
                raise ValueError(
                    "method='COLS' needs constraint_A/lo/hi (scaled "
                    "coefficient-space constraint set).")
            self._A_c = jnp.asarray(constraint_A, dtype)
            self._lo = jnp.asarray(constraint_lo, dtype)
            self._hi = jnp.asarray(constraint_hi, dtype)
            self._AtA = jnp.matmul(self._A_c.T, self._A_c,
                                   precision=jax.lax.Precision.HIGHEST)
        elif method != "OLS":
            raise NotImplementedError(f"serving method {method!r}")
        # precompute the solve operator once (pinv for the general case) —
        # in float64 on host (construction-time, microseconds) so the stored
        # fp32 operator carries no device-SVD error
        self._pinv = jnp.asarray(
            np.linalg.pinv(np.asarray(self.Theta, np.float64)).astype(
                np.asarray(self.Theta).dtype))
        # model state as a pytree: the shared jitted kernels take it as an
        # ARGUMENT, so same-shape models (e.g. a reloaded retrained
        # checkpoint) reuse the existing compilation
        self._state = {"Ur": self.Ur, "Theta": self.Theta,
                       "cnt_sensors": self.cnt_sensors,
                       "scl_sensors": self.scl_sensors,
                       "X_cnt": self.X_cnt, "X_scl": self.X_scl,
                       "pinv": self._pinv}
        if method == "COLS":
            # n_c: active constraint-row count — stays at the unpadded
            # value when shard() pads the set (it is replicated, not
            # row-sharded), so the sharded ADMM trajectory is identical
            self._state.update(A_c=self._A_c, lo=self._lo, hi=self._hi,
                               AtA=self._AtA,
                               n_c=jnp.asarray(self._A_c.shape[0], dtype))
        self._rebind_predicts()

    def _rebind_predicts(self, n_serve=None) -> None:
        """(Re)bind the compiled predict entry points to ``self._state`` —
        the single wiring site shared by ``__init__`` and :meth:`shard`.
        ``n_serve``: when the state was row-padded for sharding, slice the
        reconstructed field back to this many rows."""
        kw = dict(method=self.method, admm_iters=self.admm_iters,
                  over_relax=self.admm_over_relax,
                  adapt_rho=self.admm_rho == "adaptive")
        p1 = functools.partial(_predict_one, self._state, **kw)
        pb = functools.partial(_predict_many, self._state, **kw)
        if n_serve is not None and \
                int(self._state["Ur"].shape[0]) != int(n_serve):
            def _sliced(fn, n):
                def wrapped(yv, ys):
                    x, a, s = fn(yv, ys)
                    return x[..., :n], a, s
                return wrapped
            p1, pb = _sliced(p1, int(n_serve)), _sliced(pb, int(n_serve))
        self._predict, self._predict_batch = p1, pb

    # ------------------------------------------------------------------ #

    @classmethod
    def from_spr(cls, spr, feature_ids=None, dtype=jnp.float32,
                 admm_iters: int = 300,
                 admm_rho: str = "adaptive") -> "SoftSensor":
        """Package a trained :class:`openmeasure_tpu.SPR` (after fit +
        train).  C may be dense or scipy.sparse.

        For a one-hot C (QR/GEM placement) the per-measurement scaling is
        derived automatically.  For a general C (e.g. CTC projection
        operators) pass ``feature_ids`` (s,) — the feature index each
        measurement belongs to, as in the third column of the reference's
        measurement vectors.

        A model trained with ``method='COLS'`` carries its constraint set
        (``limits`` box or a general ``constraints`` spec with unbatched
        bounds) into the compiled server."""
        X_cnt = np.asarray(spr.X_cnt)[:, 0]
        X_scl = np.asarray(spr.X_scl)[:, 0]
        cnt_sensors, scl_sensors = _measurement_scaling(
            spr.C, X_cnt, X_scl, spr.n_points, feature_ids)

        method = getattr(spr, "method", "OLS")
        kw = {}
        if method == "COLS":
            from .linalg import boxls as _boxls
            # `limits` and `constraints` COMPOSE (single shared contract:
            # linalg.boxls.build_constraint_set, as in SPR.predict).
            box = None
            if getattr(spr, "limits", None) is not None:
                lo, hi = spr.scale_limits(spr.limits)
                box = (spr.Ur, lo, hi)
            stacked, _ = _boxls.build_constraint_set(
                getattr(spr, "constraints", None), box)
            if stacked is None:
                raise ValueError(
                    "COLS model has neither limits nor constraints.")
            if np.ndim(np.asarray(stacked.lo)) == 2 or \
                    np.ndim(np.asarray(stacked.hi)) == 2:
                raise ValueError(
                    "per-request batched constraint bounds cannot be "
                    "baked into a serving model; use unbatched bounds.")
            kw = dict(constraint_A=stacked.A, constraint_lo=stacked.lo,
                      constraint_hi=stacked.hi)
        return cls(spr.Ur, spr.Theta, cnt_sensors, scl_sensors,
                   X_cnt, X_scl, dtype, method=method,
                   admm_iters=admm_iters, admm_rho=admm_rho,
                   admm_over_relax=getattr(spr, "admm_over_relax", 1.6),
                   **kw)

    @classmethod
    def load(cls, path: str, feature_ids=None, dtype=jnp.float32,
             admm_iters: int = 300,
             admm_rho: str = "adaptive") -> "SoftSensor":
        """Build from a checkpoint written by
        :func:`openmeasure_tpu.utils.checkpoint.save_model`.  Pass
        ``feature_ids`` for models trained with a general (non-one-hot) C."""
        from .utils.checkpoint import load_model
        return cls.from_spr(load_model(path), feature_ids=feature_ids,
                            dtype=dtype, admm_iters=admm_iters,
                            admm_rho=admm_rho)

    # ------------------------------------------------------------------ #

    def predict_full(self, y_values, y_sigma=None
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (field (n,), coefficients (r,), coefficient σ (r,))."""
        y_values = jnp.asarray(y_values, self.Ur.dtype)
        if y_values.shape != (self.s,):
            raise ValueError(
                f"y_values must be (s={self.s},); got {y_values.shape}. "
                "Use predict_batch for (batch, s) frames.")
        if y_sigma is None:
            y_sigma = jnp.zeros_like(y_values)
        else:
            y_sigma = jnp.broadcast_to(
                jnp.asarray(y_sigma, self.Ur.dtype), y_values.shape)
        return self._predict(y_values, y_sigma)

    def __call__(self, y_values, y_sigma=None) -> jax.Array:
        return self.predict_full(y_values, y_sigma)[0]

    def predict_batch(self, Y_values, Y_sigma=None
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Batched inference: ``Y_values`` (b, s) → (fields (b, n),
        coefficients (b, r), coefficient σ (b, r)) in ONE device dispatch.

        The per-request path costs one dispatch + tunnel round-trip each;
        a vmapped batch amortizes both, so frame-stream workloads (e.g.
        CTC tomography at camera rate) should batch frames.  Note each
        batch shape compiles once — keep batch sizes fixed (pad the tail).
        """
        Y_values = jnp.asarray(Y_values, self.Ur.dtype)
        if Y_values.ndim != 2 or Y_values.shape[1] != self.s:
            raise ValueError(
                f"Y_values must be (batch, s={self.s}); got "
                f"{Y_values.shape}.")
        if Y_sigma is None:
            Y_sigma = jnp.zeros_like(Y_values)
        else:
            Y_sigma = jnp.asarray(Y_sigma, self.Ur.dtype)
        return self._predict_batch(Y_values, Y_sigma)

    def warmup(self) -> "SoftSensor":
        """Force compilation so first real request is fast."""
        _ = jax.tree_util.tree_map(
            lambda x: x.block_until_ready(),
            self._predict(jnp.zeros((self.s,), self.Ur.dtype),
                          jnp.zeros((self.s,), self.Ur.dtype)))
        return self

    def shard(self, mesh, axis_name: str = "state") -> "SoftSensor":
        """Multi-chip serving: return a copy whose n-row state (Ur, the
        unscaling vectors, and the COLS constraint set) is row-sharded over
        ``mesh``'s ``axis_name`` axis — non-divisible row counts are padded
        with inert rows and the field output sliced back (see
        :func:`shard_state_rows`, including the parity guarantees: OLS
        exact to ULPs, fixed-budget fp32 COLS to the measured ~2e-5
        solver reproducibility when padding changes the contraction
        length); the reconstruct and ADMM constraint products run
        shard-local."""
        import copy
        new = copy.copy(self)
        new._state = shard_state_rows(self._state, mesh, axis_name)
        new.Ur = new._state["Ur"]
        new.X_cnt, new.X_scl = new._state["X_cnt"], new._state["X_scl"]
        if self.method == "COLS":
            new._A_c, new._lo, new._hi = (new._state["A_c"],
                                          new._state["lo"],
                                          new._state["hi"])
        new._rebind_predicts(n_serve=self.n)
        return new


# ---------------------------------------------------------------------- #
# GPR serving: parameter -> field
# ---------------------------------------------------------------------- #

def _gpr_predict_math(state, P_star, mean_spec, kernel_spec,
                      likelihood_spec, gpr_type, constrained, admm_iters,
                      over_relax, adapt_rho=True):
    """Posterior at scaled design points + rescale + reconstruct — the
    compiled form of ``GPR.predict(...)`` followed by ``reconstruct``.
    Specs are static (hashable frozen dataclasses); model state is a pytree
    argument, so same-shape retrained models share the compilation.

    ``constrained=True`` serves the constrained prediction (the eager
    ``GPR.predict(limits=..., bc=..., constraints=...)`` path, reference
    ``gpr.py:569-580``): each point's posterior mean is replaced by the
    whitened ADMM MAP under the constraint set baked into ``state`` at
    packaging time, run for a FIXED iteration budget (``tol=0``) so request
    latency is deterministic — same design as COLS :class:`SoftSensor`."""
    from .gp.gpr import posterior_all_modes
    from .linalg import boxls as _boxls
    hp = jax.lax.Precision.HIGHEST
    P0s = (P_star - state["P_cnt"][None, :]) / state["P_scl"][None, :]
    means, variances = posterior_all_modes(
        mean_spec, kernel_spec, likelihood_spec, gpr_type,
        state["params"], state["P0_train"], state["Y"], P0s)

    V_pred = means.T                                   # (q, r)
    V_sigma = jnp.sqrt(variances).T
    if constrained:
        A_c, lo, hi, AtA = (state["A_c"], state["lo"], state["hi"],
                            state["AtA"])

        def map_one(mu, var):
            # n_rows = active (unpadded) constraint rows: sharded-vs-single
            # trajectory invariance, same contract as the COLS path above
            v, _ = _boxls.box_constrained_map(
                mu, jnp.diag(var), A_c, lo, hi, AtA=AtA,
                max_iter=admm_iters, tol=0.0, over_relax=over_relax,
                n_rows=state["n_c"], adapt_rho=adapt_rho)
            return v
        V_pred = jax.vmap(map_one)(V_pred, variances.T)
    A = V_pred * state["Sigma_r"][None, :]
    A_sigma = V_sigma * state["Sigma_r"][None, :]
    fields = (jnp.matmul(state["Ur"], A.T, precision=hp)
              * state["X_scl"][:, None] + state["X_cnt"][:, None]).T
    return fields, A, A_sigma


@functools.partial(jax.jit, static_argnames=("mean_spec", "kernel_spec",
                                             "likelihood_spec", "gpr_type",
                                             "constrained", "admm_iters",
                                             "over_relax", "adapt_rho"))
def _gpr_predict_kernel(state, P_star, *, mean_spec, kernel_spec,
                        likelihood_spec, gpr_type, constrained=False,
                        admm_iters=300, over_relax=1.6, adapt_rho=True):
    return _gpr_predict_math(state, P_star, mean_spec, kernel_spec,
                             likelihood_spec, gpr_type, constrained,
                             admm_iters, over_relax, adapt_rho)


class GPRSensor:
    """Compiled parameter→field soft sensor for a trained
    :class:`openmeasure_tpu.GPR` — the serving form of the second model
    family (``predict`` + ``reconstruct`` as one shared jitted program).

        sensor = GPRSensor.from_gpr(gpr)       # gpr after fit + train
        fields, A, A_sigma = sensor(P_star)    # (q, d) -> (q, n) fields

    Same compile-sharing design as :class:`SoftSensor`: the model state is
    an argument of a module-level jitted kernel, so retrained same-shape
    models (checkpoint reloads) skip recompilation.  Each distinct test
    batch shape compiles once — keep query batch sizes fixed.

    A constraint set (``limits`` box / ``bc`` pins / general
    ``constraints``) given to :meth:`from_gpr` is baked into the server:
    every request's posterior mean is replaced by the whitened ADMM MAP of
    the eager ``GPR.predict(limits=...)`` path (reference ``gpr.py:569-580``)
    under a fixed iteration budget.
    """

    def __init__(self, mean_spec, kernel_spec, likelihood_spec,
                 gpr_type, state, admm_iters: int = 300,
                 admm_over_relax: float = 1.6,
                 admm_rho: str = "adaptive"):
        self.mean_spec = mean_spec
        self.kernel_spec = kernel_spec
        self.likelihood_spec = likelihood_spec
        self.gpr_type = gpr_type
        self._state = state
        self.constrained = "A_c" in state
        self.admm_iters = int(admm_iters)
        self.admm_over_relax = float(admm_over_relax)
        if admm_rho not in ("adaptive", "fixed"):
            raise ValueError(
                f"admm_rho must be 'adaptive' or 'fixed'; got {admm_rho!r}")
        self.admm_rho = admm_rho
        self.d = int(state["P_cnt"].shape[0])
        self.r = int(state["Sigma_r"].shape[0])
        self.n = int(state["Ur"].shape[0])

    @classmethod
    def from_gpr(cls, gpr, limits=None, bc=None, constraints=None,
                 admm_iters: int = 300,
                 admm_over_relax: float = 1.6,
                 admm_rho: str = "adaptive") -> "GPRSensor":
        """Package a trained GPR (after ``fit`` + ``train``).

        ``limits``/``bc``/``constraints`` follow ``GPR.predict``'s contract
        (they COMPOSE), with two serving restrictions: ``bc=(rows, values)``
        values are a fixed (n_bc,) vector enforced on every request (the
        per-request batched form cannot be baked into a compiled model), and
        ``constraints`` bounds must be unbatched — same rule as COLS
        :class:`SoftSensor`."""
        if not hasattr(gpr, "Ur"):
            raise AttributeError(
                "GPRSensor.from_gpr needs a fitted and trained GPR: "
                "call gpr.fit() and gpr.train() first.")
        if not hasattr(gpr, "models"):
            raise AttributeError(
                "GPRSensor.from_gpr needs a trained GPR: call gpr.train() "
                "after fit().")
        state = {
            "P0_train": jnp.asarray(gpr._train_X),
            "Y": jnp.asarray(gpr._train_Y),
            "params": gpr.params,
            "Sigma_r": jnp.asarray(gpr.Sigma_r),
            "Ur": jnp.asarray(gpr.Ur),
            "X_cnt": jnp.asarray(gpr.X_cnt)[:, 0],
            "X_scl": jnp.asarray(gpr.X_scl)[:, 0],
            "P_cnt": jnp.asarray(gpr.P_cnt)[0],
            "P_scl": jnp.asarray(gpr.P_scl)[0],
        }
        parts = []
        if limits is not None or bc is not None or constraints is not None:
            from .linalg import boxls as _boxls
            if gpr.gpr_type != "MultiTask":
                raise NotImplementedError(
                    "Constrained prediction only works for MultiTask "
                    "models.")
            if bc is not None and np.asarray(bc[1]).ndim != 1:
                raise ValueError(
                    "serving bc values must be a fixed (n_bc,) vector "
                    "(per-request batched pins cannot be baked into a "
                    "compiled model).")
            # constraint-space construction shared with GPR.predict
            # (gpr._state_constraint_parts — the MAP variable is the
            # normalized coefficient vector v, the physical operator is
            # Ur diag(Sigma_r))
            parts = gpr._state_constraint_parts(limits, bc)
            if constraints is not None:
                cs_user, _ = _boxls.build_constraint_set(constraints, None)
                parts.append(cs_user)
            cs = _boxls.concat_constraints(parts)
            if cs.batched:
                raise ValueError(
                    "per-request batched constraint bounds cannot be baked "
                    "into a serving model; use unbatched bounds.")
            state.update(
                A_c=jnp.asarray(cs.A), lo=jnp.asarray(cs.lo),
                hi=jnp.asarray(cs.hi),
                AtA=jnp.matmul(cs.A.T, cs.A,
                               precision=jax.lax.Precision.HIGHEST),
                # active row count: replicated under shard(), so padded
                # inert rows do not perturb the MAP ADMM trajectory
                n_c=jnp.asarray(cs.A.shape[0], jnp.asarray(cs.A).dtype))
        return cls(gpr.mean, gpr.kernel, gpr.likelihood, gpr.gpr_type,
                   state, admm_iters=admm_iters,
                   admm_over_relax=admm_over_relax, admm_rho=admm_rho)

    @classmethod
    def load(cls, path: str, limits=None, bc=None, constraints=None,
             admm_iters: int = 300,
             admm_over_relax: float = 1.6,
             admm_rho: str = "adaptive") -> "GPRSensor":
        from .utils.checkpoint import load_model
        return cls.from_gpr(load_model(path), limits=limits, bc=bc,
                            constraints=constraints, admm_iters=admm_iters,
                            admm_over_relax=admm_over_relax,
                            admm_rho=admm_rho)

    def __call__(self, P_star):
        P_star = jnp.asarray(P_star, self._state["Ur"].dtype)
        if P_star.ndim < 2:
            P_star = P_star[None, :]
        if P_star.shape[1] != self.d:
            raise ValueError(
                f"P_star must be (batch, d={self.d}); got {P_star.shape}.")
        fields, A, A_sigma = _gpr_predict_kernel(
            self._state, P_star, mean_spec=self.mean_spec,
            kernel_spec=self.kernel_spec,
            likelihood_spec=self.likelihood_spec, gpr_type=self.gpr_type,
            constrained=self.constrained, admm_iters=self.admm_iters,
            over_relax=self.admm_over_relax,
            adapt_rho=self.admm_rho == "adaptive")
        if fields.shape[1] != self.n:      # row-padded sharded state
            fields = fields[:, :self.n]
        return fields, A, A_sigma

    def warmup(self, batch: int = 1) -> "GPRSensor":
        _ = jax.tree_util.tree_map(
            lambda x: x.block_until_ready(),
            self(jnp.zeros((batch, self.d), self._state["Ur"].dtype)))
        return self

    def shard(self, mesh, axis_name: str = "state") -> "GPRSensor":
        """Multi-chip serving: copy with the n-row state (Ur, unscaling
        vectors, constrained-MAP constraint set) row-sharded over ``mesh``
        — non-divisible row counts are padded with inert rows and field
        outputs sliced back (see :func:`shard_state_rows`); parity-tested
        vs single-device."""
        import copy
        new = copy.copy(self)
        new._state = shard_state_rows(self._state, mesh, axis_name)
        return new


# ---------------------------------------------------------------------- #
# CoKriging serving: multifidelity parameters -> HF field
# ---------------------------------------------------------------------- #

@functools.partial(jax.jit, static_argnames=("regr", "rho_regr",
                                             "rho_cols_seq", "n_levels"))
def _ck_predict_kernel(state, X, *, regr, rho_regr, rho_cols_seq,
                       n_levels):
    """Recursive co-kriging posterior for all latent dims + HF projection +
    unscale, as one program (the compiled form of ``CoKriging.predict``).
    Same compile-sharing design as the other serving kernels."""
    from .multifi.mfk import predict_levels_batch
    hp = jax.lax.Precision.HIGHEST
    Xn = (X - state["X_mean"][None, :]) / state["X_std"][None, :]
    mean, var = predict_levels_batch(state["levels"], rho_cols_seq, regr,
                                     rho_regr, n_levels - 1, Xn)
    means = mean * state["y_std"][:, None] + state["y_mean"][:, None]
    mses = var * state["y_std"][:, None] ** 2
    Y0_pred = jnp.matmul(state["Ur"], means, precision=hp)   # (n, q)
    Y0_mse = jnp.matmul(state["Ur"], mses, precision=hp)
    # unscale BOTH, exactly like CoKriging.predict (the reference unscales
    # the MSE through the same affine map — quirk kept, cokriging.py:140-142)
    scl, cnt = state["X_scl"][:, None], state["X_cnt"][:, None]
    return scl * Y0_pred + cnt, scl * Y0_mse + cnt


class CoKrigingSensor:
    """Compiled multifidelity parameter→field sensor for a fitted
    :class:`openmeasure_tpu.CoKriging` (after ``manifold_alignment`` +
    ``fit`` with the batched engine).

        sensor = CoKrigingSensor.from_cokriging(ck)
        Y_pred, Y_mse = sensor(X_test)          # (q, d) -> (n, q), (n, q)

    Output orientation matches ``CoKriging.predict``.  Model state is a
    pytree argument of a shared jitted kernel — same-shape refits reuse the
    compilation.
    """

    def __init__(self, regr, rho_regr, rho_cols_seq, n_levels, state):
        self.regr = regr
        self.rho_regr = rho_regr
        self.rho_cols_seq = rho_cols_seq
        self.n_levels = n_levels
        self._state = state
        self.d = int(state["X_mean"].shape[0])
        self.n = int(state["Ur"].shape[0])

    @classmethod
    def from_cokriging(cls, ck) -> "CoKrigingSensor":
        if not hasattr(ck, "_batch"):
            raise AttributeError(
                "CoKrigingSensor needs a CoKriging fitted with the batched "
                "engine (call manifold_alignment() then fit()).")
        b = ck._batch
        n_latent = ck.n_latent
        # cast to the AMBIENT default float (f32 on device, f64 under the
        # x64 CPU suite): a host-f64-fit model (engine='host') carries
        # f64 CPU-committed level arrays, which a bare jnp.asarray would
        # keep as f64 — an emulated-f64 (or failing) program on TPU
        dt = jnp.asarray(0.0).dtype

        def dev(v):
            a = np.asarray(v)
            return jnp.asarray(a, dt) if np.issubdtype(a.dtype,
                                                       np.floating) \
                else jnp.asarray(a)

        levels = [{k: dev(v) for k, v in lev.items()
                   if k != "rho_cols"} for lev in b.levels]
        state = {
            "levels": levels,
            "X_mean": dev(b._X_mean),
            "X_std": dev(b._X_std),
            "y_mean": dev(b._y_mean),
            "y_std": dev(b._y_std),
            "Ur": dev(ck.Ur_hf[:, :n_latent]),
            "X_cnt": dev(np.asarray(ck.rom_hf.X_cnt)[:, 0]),
            "X_scl": dev(np.asarray(ck.rom_hf.X_scl)[:, 0]),
        }
        rho_cols_seq = tuple(lev["rho_cols"] for lev in b.levels)
        return cls(b._proto.regr, b._proto.rho_regr, rho_cols_seq,
                   b.n_levels, state)

    @classmethod
    def load(cls, path: str) -> "CoKrigingSensor":
        from .utils.checkpoint import load_model
        return cls.from_cokriging(load_model(path))

    def __call__(self, X_test):
        X_test = np.atleast_2d(np.asarray(X_test, dtype=float))
        if X_test.shape[1] != self.d:
            raise ValueError(
                f"X_test must be (q, d={self.d}); got {X_test.shape}.")
        X_test = jnp.asarray(X_test, self._state["X_mean"].dtype)
        Yp, Ym = _ck_predict_kernel(
            self._state, X_test, regr=self.regr, rho_regr=self.rho_regr,
            rho_cols_seq=self.rho_cols_seq, n_levels=self.n_levels)
        if Yp.shape[0] != self.n:          # row-padded sharded state
            Yp, Ym = Yp[:self.n], Ym[:self.n]
        return Yp, Ym

    def warmup(self, batch: int = 1) -> "CoKrigingSensor":
        _ = jax.tree_util.tree_map(
            lambda x: x.block_until_ready(),
            self(np.zeros((batch, self.d))))
        return self

    def shard(self, mesh, axis_name: str = "state") -> "CoKrigingSensor":
        """Multi-chip serving: copy with the n-row HF state (Ur_hf and the
        unscaling vectors) row-sharded over ``mesh`` (see
        :func:`shard_state_rows`) — the (n, q) HF projection runs
        shard-local; the latent-space posterior (tiny) is replicated."""
        import copy
        new = copy.copy(self)
        new._state = shard_state_rows(self._state, mesh, axis_name)
        return new


# ---------------------------------------------------------------------- #
# Shallow-decoder serving: sensors -> field through the trained MLP
# ---------------------------------------------------------------------- #

@jax.jit
def _decoder_predict_kernel(state, Y_values):
    """Scaled-sensor MLP forward + unscale.  Y_values (b, s) -> (b, n).

    ``state`` is an ARGUMENT (module-level jit, same convention as the
    other serving kernels) so same-architecture decoders share one
    compilation — the pytree structure (layer count/shapes) is the only
    compile key."""
    from .sensing.decoder import _forward
    y0 = (Y_values - state["cnt_sensors"][None, :]) \
        / state["scl_sensors"][None, :]
    X0 = _forward(state["layers"], y0)
    return X0 * state["X_scl"][None, :] + state["X_cnt"][None, :]


class DecoderSensor:
    """Immutable, compiled shallow-decoder soft sensor
    (:class:`openmeasure_tpu.sensing.decoder.ShallowDecoder` packaged for
    production) — sensors → full field, one MLP forward per batch.

    No coefficient / σ outputs: the decoder reconstructs outside the POD
    span and has no closed-form error propagation (use :class:`SoftSensor`
    when σ is needed)."""

    def __init__(self, params, cnt_sensors, scl_sensors, X_cnt, X_scl,
                 dtype=jnp.float32):
        layers = tuple((jnp.asarray(W, dtype), jnp.asarray(b, dtype))
                       for W, b in params)
        self.s = int(layers[0][0].shape[0])
        self.n = int(layers[-1][0].shape[1])
        self._state = {
            "layers": layers,
            "cnt_sensors": jnp.asarray(cnt_sensors, dtype).reshape(-1),
            "scl_sensors": jnp.asarray(scl_sensors, dtype).reshape(-1),
            "X_cnt": jnp.asarray(X_cnt, dtype).reshape(-1),
            "X_scl": jnp.asarray(X_scl, dtype).reshape(-1),
        }

    @classmethod
    def from_decoder(cls, dec, feature_ids=None,
                     dtype=jnp.float32) -> "DecoderSensor":
        """Package a fitted :class:`ShallowDecoder`.  ``feature_ids`` as in
        :meth:`SoftSensor.from_spr` (required for non-one-hot C)."""
        if not hasattr(dec, "params"):
            raise ValueError("DecoderSensor.from_decoder needs a fitted "
                             "decoder: call dec.fit(C) first.")
        X_cnt = np.asarray(dec.X_cnt)[:, 0]
        X_scl = np.asarray(dec.X_scl)[:, 0]
        cnt_sensors, scl_sensors = _measurement_scaling(
            dec.C, X_cnt, X_scl, dec.n_points, feature_ids)
        return cls(dec.params, cnt_sensors, scl_sensors, X_cnt, X_scl,
                   dtype)

    @classmethod
    def load(cls, path: str, feature_ids=None,
             dtype=jnp.float32) -> "DecoderSensor":
        from .utils.checkpoint import load_model
        return cls.from_decoder(load_model(path), feature_ids=feature_ids,
                                dtype=dtype)

    def __call__(self, y_values) -> jax.Array:
        """One request: sensor values (s,) → field (n,)."""
        y = jnp.asarray(y_values, self._state["X_cnt"].dtype)
        out = _decoder_predict_kernel(self._state, y[None, :])[0]
        return out[: self.n] if out.shape[0] != self.n else out

    def predict_batch(self, Y_values) -> jax.Array:
        """Batched inference: (b, s) → fields (b, n) in one dispatch."""
        Y = jnp.asarray(Y_values, self._state["X_cnt"].dtype)
        if Y.ndim != 2 or Y.shape[1] != self.s:
            raise ValueError(
                f"Y_values must be (batch, s={self.s}); got {Y.shape}.")
        out = _decoder_predict_kernel(self._state, Y)
        return out[:, : self.n] if out.shape[1] != self.n else out

    def warmup(self) -> "DecoderSensor":
        _ = self(jnp.zeros((self.s,))).block_until_ready()
        return self

    def shard(self, mesh, axis_name: str = "state") -> "DecoderSensor":
        """Multi-chip serving: copy with the n-sized state sharded over
        ``mesh`` — the output layer's COLUMNS (plus its bias and the
        unscaling vectors) split across chips, so the dominant
        (hidden × n) matmul runs shard-local with no collectives (the
        hidden activations are replicated, tiny).  Non-divisible n is
        padded with inert columns (zero weights/center, unit scale) and
        the field output sliced back — results identical to the
        single-device sensor (parity tested)."""
        import copy
        from jax.sharding import NamedSharding, PartitionSpec as P

        size = mesh.shape[axis_name]
        n0 = self.n
        pad = -(-n0 // size) * size - n0

        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        *hidden, (W_out, b_out) = self._state["layers"]
        if pad:
            W_out = jnp.pad(W_out, ((0, 0), (0, pad)))
            b_out = jnp.pad(b_out, (0, pad))
        layers = tuple((put(W, P()), put(b, P())) for W, b in hidden) + (
            (put(W_out, P(None, axis_name)), put(b_out, P(axis_name))),)

        def pad1(x, v):
            return jnp.pad(x, (0, pad), constant_values=v) if pad else x

        new = copy.copy(self)
        new._state = {
            "layers": layers,
            "cnt_sensors": put(self._state["cnt_sensors"], P()),
            "scl_sensors": put(self._state["scl_sensors"], P()),
            "X_cnt": put(pad1(self._state["X_cnt"], 0.0), P(axis_name)),
            "X_scl": put(pad1(self._state["X_scl"], 1.0), P(axis_name)),
        }
        return new


# ---------------------------------------------------------------------- #
# Kalman-filtering soft sensor (reduced-coefficient dynamics)
# ---------------------------------------------------------------------- #

# effective measurement variance for a MISSING sensor reading (scaled
# space is O(1), so 1e12 drives the Kalman gain to ~1e-12 — numerically
# a pure prediction step — while keeping the SPD innovation solve
# well-conditioned in fp32)
_KF_MISSING_R = 1e12


def _kf_scale_inputs(state, Y_values, Y_sigma):
    """Scale a measurement series + build the per-step noise variances.

    Non-finite entries in ``Y_values`` or ``Y_sigma`` (NaN, or ±inf — an
    infinite uncertainty is the natural 'ignore me') mark MISSING
    readings (a dropped sensor or a pure-prediction frame): the value is
    replaced by zero and its variance by :data:`_KF_MISSING_R`, so the
    filter ignores it exactly (gain ~1e-12) instead of letting the
    NaN/inf poison the SPD solve and the whole filtered series."""
    miss = ~(jnp.isfinite(Y_values) & jnp.isfinite(Y_sigma))
    Yv = jnp.where(miss, jnp.zeros_like(Y_values), Y_values)
    Y0 = (Yv - state["cnt_sensors"][None, :]) \
        / state["scl_sensors"][None, :]
    R = jnp.square(jnp.where(miss, jnp.zeros_like(Y_sigma), Y_sigma)
                   / state["scl_sensors"][None, :])
    # variance floor: with more sensors than modes and sigma=0 the
    # innovation covariance Theta P Theta^T is rank-deficient (rank <= r
    # < s) — the floor keeps the SPD solve well-posed without visibly
    # weighting real measurements (scaled space is O(1))
    R = jnp.maximum(R, state["r_floor"])
    R = jnp.where(miss, jnp.full_like(R, _KF_MISSING_R), R)
    return Y0, R


def _kf_reconstruct(state, A_coef):
    hp = jax.lax.Precision.HIGHEST
    return jnp.matmul(A_coef, state["Ur"].T, precision=hp) \
        * state["X_scl"][None, :] + state["X_cnt"][None, :]


@jax.jit
def _kf_serve_series(state, Y_values, Y_sigma, a0, P0):
    """Scaled-space Kalman filtering of a measurement series + field
    reconstruction, as ONE device program (the scan over frames replaces
    K independent gappy solves).  ``state`` is a pytree ARGUMENT — the
    compile-sharing convention of every serving kernel in this module."""
    from .dynamics.kalman import kalman_filter
    Y0, R = _kf_scale_inputs(state, Y_values, Y_sigma)
    A_filt, var, carry, rej = kalman_filter(
        state["A"], state["Q"], state["Theta"], a0, P0, Y0, R,
        gate=state["gate"], return_rejected=True)
    return _kf_reconstruct(state, A_filt), A_filt, var, carry, rej


@jax.jit
def _kf_smooth_series(state, Y_values, Y_sigma, a0, P0):
    """RTS-smoothed variant of :func:`_kf_serve_series`: every frame
    conditions on the WHOLE series (offline reconstruction of a recorded
    run).  The returned carry is the forward filter's final state."""
    from .dynamics.kalman import kalman_smoother
    Y0, R = _kf_scale_inputs(state, Y_values, Y_sigma)
    A_sm, var, carry, rej = kalman_smoother(
        state["A"], state["Q"], state["Theta"], a0, P0, Y0, R,
        gate=state["gate"], return_rejected=True)
    return _kf_reconstruct(state, A_sm), A_sm, var, carry, rej


class DynamicSensor:
    """Kalman-filtering soft sensor over a TIME SERIES of measurements.

    Capability beyond the reference (its reconstruction is memoryless,
    ``sparse_sensing.py:806-895``): packages a trained, time-ordered
    :class:`openmeasure_tpu.SPR` together with reduced-coefficient dynamics
    ``a_{k+1} = A a_k + w`` identified from the training coefficients
    (:func:`openmeasure_tpu.dynamics.fit_reduced_operator`), and filters
    incoming noisy measurements against the same gappy model
    ``y0 = Theta a + v`` the static sensor solves per frame.  Under sensor
    noise the filtered reconstruction beats the memoryless solve (tested);
    with huge measurement noise it degrades gracefully to the prior
    dynamics instead of amplifying noise.

        sensor = DynamicSensor.from_spr(spr)       # or .load("ckpt.npz")
        fields, A, var = sensor.filter_batch(Y, Y_sigma)   # series (K, s)
        x_t, a_t, var_t = sensor.step(y_t, sigma_t)        # streaming

    :meth:`step` advances the internal (a, P) carry; :meth:`filter_batch`
    starts from the stored prior unless ``persist=True`` (then it both
    starts from and rolls forward the carry).  The filter runs in scaled
    space at HIGHEST precision with Joseph-form updates (fp32-stable).

    Robustness knobs: ``NaN`` measurement entries mark dropped sensors
    (masked to ~zero gain); ``gate=g`` enables innovation gating — an
    entry whose innovation exceeds ``g`` predicted standard deviations
    (3-5 is typical) is rejected as a gross outlier the same way, so a
    stuck/failed sensor cannot drag the state estimate.  The most recent
    call's rejection mask is ``last_rejected`` (see
    :meth:`rejected_fraction`).
    """

    def __init__(self, Ur, Theta, cnt_sensors, scl_sensors, X_cnt, X_scl,
                 A, Q, a0, P0, dtype=jnp.float32, r_floor: float = 1e-6,
                 gate: Optional[float] = None):
        self.Ur = jnp.asarray(Ur, dtype)
        self.Theta = jnp.asarray(Theta, dtype)
        self.r = int(self.Theta.shape[1])
        self.s = int(self.Theta.shape[0])
        self.n = int(self.Ur.shape[0])
        if gate is not None and not float(gate) > 0:
            raise ValueError(f"gate must be a positive number of predicted "
                             f"standard deviations; got {gate}.")
        self._state = {
            "Ur": self.Ur, "Theta": self.Theta,
            "cnt_sensors": jnp.asarray(cnt_sensors, dtype),
            "scl_sensors": jnp.asarray(scl_sensors, dtype),
            "X_cnt": jnp.asarray(X_cnt, dtype).reshape(-1),
            "X_scl": jnp.asarray(X_scl, dtype).reshape(-1),
            "A": jnp.asarray(A, dtype), "Q": jnp.asarray(Q, dtype),
            # squared: compared against variances
            "r_floor": jnp.asarray(float(r_floor) ** 2, dtype),
            # innovation-gating threshold (inf = disabled); a state LEAF,
            # so same-shape models with different gates share the compile
            "gate": jnp.asarray(jnp.inf if gate is None else float(gate),
                                dtype),
        }
        self._a0 = jnp.asarray(a0, dtype)
        self._P0 = jnp.asarray(P0, dtype)
        self._kf_kernel = _kf_serve_series
        self.last_rejected = None
        self._rebind()
        self.reset()

    def _rebind(self, n_serve=None) -> None:
        def bind(kernel):
            fn = functools.partial(kernel, self._state)
            if n_serve is not None and \
                    int(self._state["Ur"].shape[0]) != int(n_serve):
                n = int(n_serve)

                def fn(Yv, Ys, a0, P0,
                       _inner=functools.partial(kernel, self._state)):
                    X, Af, var, carry, rej = _inner(Yv, Ys, a0, P0)
                    return X[..., :n], Af, var, carry, rej
            return fn
        self._filter = bind(_kf_serve_series)
        self._smooth = bind(_kf_smooth_series)

    # ------------------------------------------------------------------ #

    @classmethod
    def from_spr(cls, spr, ridge: float = 0.0, q_floor: float = 1e-8,
                 feature_ids=None, dtype=jnp.float32,
                 r_floor: float = 1e-6,
                 gate: Optional[float] = None) -> "DynamicSensor":
        """Package a trained SPR whose snapshots were TIME-ORDERED with a
        uniform sampling interval (the dynamics are identified from the
        column order of the fitted ``Ar``).  The filter starts at the last
        training coefficient with the stationary covariance of the
        identified model (unstable dynamics fall back to a scaled Q)."""
        from .dynamics.kalman import (fit_reduced_operator,
                                      estimate_process_noise,
                                      stationary_covariance)
        if getattr(spr, "Theta", None) is None:
            raise ValueError(
                "DynamicSensor.from_spr needs a trained SPR: call "
                "spr.fit() and spr.train() first.")
        if not hasattr(spr, "Ar"):
            raise ValueError(
                "DynamicSensor.from_spr needs the fitted coefficients Ar "
                "(fit with the standard POD path).")
        A = fit_reduced_operator(spr.Ar, ridge=ridge)
        Q = estimate_process_noise(A, spr.Ar, floor_rel=q_floor)
        P0 = stationary_covariance(A, Q)
        a0 = np.asarray(spr.Ar, dtype=np.float64)[-1]
        X_cnt = np.asarray(spr.X_cnt)[:, 0]
        X_scl = np.asarray(spr.X_scl)[:, 0]
        cnt_sensors, scl_sensors = _measurement_scaling(
            spr.C, X_cnt, X_scl, spr.n_points, feature_ids)
        return cls(spr.Ur, spr.Theta, cnt_sensors, scl_sensors,
                   X_cnt, X_scl, A, Q, a0, P0, dtype=dtype,
                   r_floor=r_floor, gate=gate)

    @classmethod
    def load(cls, path: str, ridge: float = 0.0, q_floor: float = 1e-8,
             feature_ids=None, dtype=jnp.float32,
             r_floor: float = 1e-6,
             gate: Optional[float] = None) -> "DynamicSensor":
        """Build from a checkpoint written by
        :func:`openmeasure_tpu.utils.checkpoint.save_model` (the saved SPR
        carries ``Ar``, so the dynamics are re-identified on load)."""
        from .utils.checkpoint import load_model
        return cls.from_spr(load_model(path), ridge=ridge, q_floor=q_floor,
                            feature_ids=feature_ids, dtype=dtype,
                            r_floor=r_floor, gate=gate)

    # ------------------------------------------------------------------ #

    def _coerce(self, Y_values, Y_sigma):
        Y_values = jnp.asarray(Y_values, self.Ur.dtype)
        if Y_values.ndim != 2 or Y_values.shape[1] != self.s:
            raise ValueError(
                f"measurement series must be (frames, s={self.s}); got "
                f"{Y_values.shape}.")
        if Y_sigma is None:
            Y_sigma = jnp.zeros_like(Y_values)
        else:
            Y_sigma = jnp.broadcast_to(
                jnp.asarray(Y_sigma, self.Ur.dtype), Y_values.shape)
        return Y_values, Y_sigma

    def filter_batch(self, Y_values, Y_sigma=None, persist: bool = False
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Filter a (K, s) measurement series: returns (fields (K, n),
        coefficient means (K, r), coefficient variances (K, r)) in one
        device dispatch.  ``persist=True`` continues from — and advances —
        the internal streaming carry instead of the stored prior."""
        Y_values, Y_sigma = self._coerce(Y_values, Y_sigma)
        a, P = (self._a, self._P) if persist else (self._a0, self._P0)
        X, A_filt, var, carry, rej = self._filter(Y_values, Y_sigma, a, P)
        self.last_rejected = rej
        if persist:
            self._a, self._P = carry
        return X, A_filt, var

    def smooth_batch(self, Y_values, Y_sigma=None, persist: bool = False
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """RTS-smooth a RECORDED (K, s) series: every returned frame
        conditions on all K measurements (the filter conditions frame k on
        frames 0..k only) — the right offline reconstruction of a finished
        run; under noise it beats the causal filter (tested).  Same return
        contract as :meth:`filter_batch`; ``persist=True`` advances the
        streaming carry with the FORWARD filter's final state, so a later
        :meth:`step` continues exactly as if the series had been filtered."""
        Y_values, Y_sigma = self._coerce(Y_values, Y_sigma)
        a, P = (self._a, self._P) if persist else (self._a0, self._P0)
        X, A_sm, var, carry, rej = self._smooth(Y_values, Y_sigma, a, P)
        self.last_rejected = rej
        if persist:
            self._a, self._P = carry
        return X, A_sm, var

    def forecast(self, horizon: int, persist: bool = False,
                 from_carry: Optional[bool] = None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Predict the next ``horizon`` frames with NO measurements: pure
        rollout of the identified dynamics ``a_{k+1} = A a_k``, with the
        coefficient variances growing by ``P -> A P A^T + Q`` per step — a
        measurement-free gap-fill / lookahead with honest uncertainty.

        Start state: ``from_carry=True`` reads the LIVE streaming carry,
        ``from_carry=False`` the packaged prior; the default follows
        ``persist`` (so the two legacy calls keep their meaning).
        ``persist=True`` additionally writes the rolled-forward state back
        to the carry — i.e. the stream itself advances by ``horizon``
        measurement-free steps.  ``forecast(q, from_carry=True)`` is the
        non-mutating lookahead during streaming: it forecasts from the
        current state and leaves the carry untouched.

        Implemented as the filter over an all-missing series (NaN masking),
        so it shares the compiled kernel with :meth:`filter_batch`."""
        q = int(horizon)
        if q < 1:
            raise ValueError(f"horizon must be >= 1; got {horizon}.")
        if from_carry is None:
            from_carry = persist
        Y, Ys = self._coerce(jnp.full((q, self.s), jnp.nan, self.Ur.dtype),
                             None)
        a, P = (self._a, self._P) if from_carry else (self._a0, self._P0)
        X, A_f, var, carry, _rej = self._filter(Y, Ys, a, P)
        # NOT written to last_rejected: the synthetic all-missing series
        # never gates, and overwriting would blank the sensor-health
        # signal from the last real filter/smooth/step call
        if persist:
            self._a, self._P = carry
        return X, A_f, var

    def step(self, y_values, y_sigma=None
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One streaming frame: advances the internal carry and returns
        (field (n,), coefficients (r,), coefficient variances (r,))."""
        y_values = jnp.asarray(y_values, self.Ur.dtype)
        if y_values.shape != (self.s,):
            raise ValueError(
                f"y_values must be (s={self.s},); got {y_values.shape}.")
        sig = jnp.zeros((1, self.s), self.Ur.dtype) if y_sigma is None \
            else jnp.broadcast_to(jnp.asarray(y_sigma, self.Ur.dtype),
                                  (1, self.s))
        X, A_filt, var, carry, rej = self._filter(y_values[None, :], sig,
                                                  self._a, self._P)
        self.last_rejected = rej
        self._a, self._P = carry
        return X[0], A_filt[0], var[0]

    def reset(self) -> "DynamicSensor":
        """Reset the streaming carry to the packaged prior."""
        self._a, self._P = self._a0, self._P0
        return self

    def warmup(self, batch: int = 1) -> "DynamicSensor":
        """Force compilation of BOTH serving kernels (filter and RTS
        smoother) at the given series length."""
        Y = jnp.zeros((batch, self.s), self.Ur.dtype)
        X, *_ = self._filter(Y, Y, self._a0, self._P0)
        X2, *_ = self._smooth(Y, Y, self._a0, self._P0)
        jax.block_until_ready((X, X2))
        return self

    def rejected_fraction(self) -> float:
        """Fraction of measurement entries gated as outliers in the most
        recent filter/smooth/step call (0.0 when gating is disabled) — a
        cheap sensor-health signal; ``last_rejected`` holds the full
        (K, s) boolean mask."""
        if getattr(self, "last_rejected", None) is None:
            return 0.0
        return float(jnp.mean(self.last_rejected.astype(jnp.float32)))

    def shard(self, mesh, axis_name: str = "state") -> "DynamicSensor":
        """Multi-chip serving: copy with the n-row state (Ur and the
        unscaling vectors) row-sharded over ``mesh`` — the filter itself is
        (r, s)-sized and replicated; only the (K, n) reconstruct splits.
        Non-divisible n is padded with inert rows and the field output
        sliced back (identical results, parity tested)."""
        import copy
        new = copy.copy(self)
        new._state = shard_state_rows(self._state, mesh, axis_name,
                                      row_keys=("Ur", "X_cnt", "X_scl"))
        new.Ur = new._state["Ur"]
        new._rebind(n_serve=self.n)
        new.reset()
        return new
