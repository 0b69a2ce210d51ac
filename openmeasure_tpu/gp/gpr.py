"""GPR and PIGPR: Gaussian-process reduced-order models.

API-parity re-implementation of the reference ``GPR``/``PIGPR``
(``gpr.py:165-889``) on the JAX exact-GP engine:

* ``gpr_type='SingleTask'``: r independent exact GPs over the normalized POD
  coefficients Vr — trained as ONE vmapped Adam program with per-mode early
  stopping (the reference trains them serially with deep-copied priors,
  ``gpr.py:497-509``);
* ``gpr_type='MultiTask'``: batch-independent multitask GP with a shared
  multitask likelihood (global + per-task noise), reference C17;
* constrained prediction: the per-point Gaussian-MAP QP under physical box
  limits (``gpr.py:569-580``) solves with the on-device ADMM
  (``openmeasure_tpu.linalg.boxls``), vmapped over test points, instead of
  CVXPY;
* ``update``: online data assimilation (set_train_data semantics +
  fixed-noise retraining, ``gpr.py:603-675``);
* ``PIGPR``: physics-informed added-loss training (``gpr.py:677-889``) via a
  user callback that receives the differentiable posterior at the constraint
  points each iteration.

Defaults match the reference: ConstantMean, Matern-2.5 kernel, Gaussian /
multitask-Gaussian likelihood, Adam(lr=0.1), max_iter=1000, rel_error=1e-5.

Documented deviations (SURVEY §4 convention):

* the reference's class docstring lists an ``unscale_coefficients
  (scale_type)`` method that is never defined anywhere in the module
  (``gpr.py:194-196``) and has no documented signature or semantics —
  unlike ``SPR.fit_predict`` (also declared-but-undefined, which we
  implement from its documented signature), no behavior can be inferred,
  so it is intentionally not invented here;
* ``update`` persists the concatenated training data for MultiTask models
  too: the reference only calls ``set_train_data`` on the SingleTask
  branch (``gpr.py:652-667``), so its MultiTask posterior silently keeps
  conditioning on the ORIGINAL data after an update — here ``_train_X`` /
  ``_train_Y`` extend in both branches (intended assimilation semantics);
  relatedly, when no uncertainties are supplied we extend ``Vr_sigma``
  with the prior stddev at the new points instead of the reference's
  zeroed array (``gpr.py:654``), keeping a later fixed-noise retrain
  well-formed (see the inline comments in ``update``);
* SingleTask ``predict(..., limits=/bc=/constraints=)`` raises
  ``NotImplementedError`` where the reference silently IGNORES the
  constraints and returns the unconstrained posterior (its constrained
  branch is gated on ``gpr_type == 'MultiTask'`` only,
  ``gpr.py:569-580``) — silently dropping a physical constraint the
  caller asked for is treated as an error surface, not a behavior to
  preserve;
* ``Vr_sigma`` is evaluated at the POST-final-step trained
  hyperparameters; the reference reads the last training-mode
  ``output.stddev``, i.e. the params one Adam step EARLIER
  (``gpr.py:249`` there) — see
  :func:`openmeasure_tpu.gp.exact_gp.gp_prior_stddev` for the rationale.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..rom.rom import ROM, _as_device
from ..core import scaling as _scaling
from ..linalg import boxls as _boxls
from ..linalg import svd as _svd
from . import kernels as K
from . import exact_gp as E


class MultitaskPosterior(NamedTuple):
    """Posterior predictive handed to added-loss callbacks and returned by
    low-level prediction helpers."""
    mean: jax.Array     # (n_points, r)
    stddev: jax.Array   # (n_points, r)


def posterior_all_modes(mean, kernel, likelihood, gpr_type, params, X, Y,
                        Xs):
    """Noise-inclusive posterior over all modes — the ONE implementation of
    the SingleTask/MultiTask/FixedNoise branching, shared by the eager
    ``GPR._posterior_all`` and the compiled ``serving.GPRSensor`` kernel
    (a fix to e.g. the fixed-noise ``pred_noise`` quirk lands in both).
    Returns ``(means (r, q), variances (r, q))``."""
    if gpr_type == "MultiTask":
        noises = likelihood.noise(params["likelihood"])

        def post_one(tp, y, nz):
            return E.gp_posterior(mean, kernel, tp, nz, X, y, Xs,
                                  include_noise=True)
        return jax.vmap(post_one)(params["tasks"], Y.T, noises)

    def post_one(tp, y):
        if isinstance(likelihood, K.FixedNoiseGaussianLikelihood):
            nz_vec = likelihood.noise(tp["likelihood"])
            return E.gp_posterior(mean, kernel, tp, nz_vec, X, y, Xs,
                                  include_noise=True,
                                  pred_noise=jnp.mean(nz_vec))
        nz = likelihood.noise(tp["likelihood"])
        return E.gp_posterior(mean, kernel, tp, nz, X, y, Xs,
                              include_noise=True)
    return jax.vmap(post_one)(params, Y.T)


def _stack_params(params, r):
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (r,) + x.shape), params)


class GPR(ROM):
    """GPR-based ROM (reference ``gpr.py:165-209``)."""

    def __init__(self, X, n_features, xyz, P, gpr_type: str = "SingleTask"):
        super().__init__(X, n_features, xyz)
        self.P = P
        self.gpr_type = gpr_type
        if P.shape[0] != X.shape[1]:
            raise Exception(
                f"The number of parameters ({P.shape[0]}) is different"
                f" from the number of columns of X ({X.shape[1]})")

    # ------------------------------------------------------------------ #
    # Scaling + fit (reference gpr.py:253-402)
    # ------------------------------------------------------------------ #

    def scale_GPR_data(self, P, scale_type: str):
        P0, P_cnt, P_scl = _scaling.scale_parameters(_as_device(P),
                                                     scale_type)
        # same degenerate-scale guard as ROM.scale_data (documented
        # deviation): a constant parameter COLUMN zeroes its scale under
        # most scale types; the reference divides anyway (gpr.py:253-335)
        # and the NaN silently poisons every GP fit on that input.
        # Constancy is tested directly (ptp == 0) — the computed spread
        # statistic of a constant column can land at eps-level, not zero
        scl = np.asarray(P_scl)[0]
        bad = ~(np.isfinite(scl) & (scl != 0))
        if scale_type in ("std", "pareto", "range", "variance",
                          "vast", "vast_2", "vast_3", "vast_4"):
            bad |= np.ptp(np.asarray(P), axis=0) == 0
        bad = np.flatnonzero(bad)
        if bad.size:
            raise ValueError(
                f"scale_GPR_data(scale_type={scale_type!r}): parameter "
                f"column(s) {bad.tolist()} have a zero or non-finite "
                f"scale factor (values {scl[bad].tolist()}) — typically "
                "a constant design parameter. Drop the column or use "
                "scale_type='none'.")
        self.P_cnt = P_cnt
        self.P_scl = P_scl
        return P0

    def fit(self, scaleX_type: str = "std", scaleP_type: str = "std",
            axis_cnt: Optional[int] = 1, select_modes: str = "variance",
            n_modes=99, verbose: bool = False, basis=None, config=None,
            deflate=False):
        """``config`` (:class:`openmeasure_tpu.core.config.FitConfig`)
        overrides the individual kwargs (its ``scale_type`` applies to both
        X and P).

        ``deflate=True`` (or an explicit split index k) recomputes the
        selected basis with the two-block deflated Gram route
        (:func:`openmeasure_tpu.linalg.svd.svd_tall_deflated`) after rank
        selection — a TPU-native accuracy knob: the GP regresses each
        coefficient series separately, and on TPU the plain fp32 Gram
        route's deep-tail modes (σ/σ₁ ≲ √eps) are product-noise-limited
        (measured flagship: worst tail Σ rel err 4.5 → 0.54; see the
        deflated-SVD docstring).  Off by default (exact reference-flow
        parity; on CPU x64 both routes agree to round-off, tested)."""
        if config is not None:
            scaleX_type = config.scale_type
            scaleP_type = config.scale_type
            axis_cnt = config.axis_cnt
            select_modes = config.select_modes
            n_modes = config.n_modes
        self.scaleX_type = scaleX_type
        self.scaleP_type = scaleP_type
        self.select_modes = select_modes
        self.n_modes = n_modes
        self.verbose = verbose

        if deflate and basis is not None:
            raise ValueError(
                "deflate= has no effect with basis= (there is no "
                "decomposition to deflate); drop one of them.")
        self.X0 = self.scale_data(scaleX_type, axis_cnt)
        if basis is None:
            Ur, Ar, _ = self.decomposition(self.X0, select_modes, n_modes)
            if deflate:
                k = self.r // 2 if deflate is True else int(deflate)
                if not 0 < k < self.r:
                    raise ValueError(
                        f"deflate split must satisfy 0 < k < r={self.r} "
                        f"(got k={k}; deflate=True needs r >= 2) — the "
                        "requested tail-accuracy knob cannot silently "
                        "no-op.")
                U2, S2, Vt2 = _svd.svd_tall_deflated(
                    _as_device(self.X0), rank=self.r, deflate=k)
                U2, Vt2r = _svd._sign_canonicalize(U2, Vt2[:self.r])
                Ur = U2
                Ar = (S2[:self.r, None] * Vt2r).T
        else:
            Ur, Ar = _as_device(basis[0]), _as_device(basis[1])

        self.Ur = Ur
        self.Ar = Ar
        self.r = Ar.shape[1]
        self.d = self.P.shape[1]

        Sigma_r = jnp.linalg.norm(Ar, axis=0)
        self.Sigma_r = Sigma_r
        self.Vr = Ar / Sigma_r[None, :]
        self.P0 = self.scale_GPR_data(self.P, scaleP_type)
        self._invalidate_trained_state()

    def _invalidate_trained_state(self):
        """Refit hook (see :meth:`ROM.fit`): the trained hyperparameters
        and training set were built on the OLD basis's coefficients —
        drop them so predict demands train() again instead of silently
        conditioning on stale targets."""
        for a in ("params", "models", "likelihoods", "Vr_sigma",
                  "_final_loss", "_train_X", "_train_Y"):
            if hasattr(self, a):
                delattr(self, a)

    # ------------------------------------------------------------------ #
    # Train (reference gpr.py:404-515)
    # ------------------------------------------------------------------ #

    def _default_specs(self, mean, kernel, likelihood):
        if mean is None:
            mean = K.ConstantMean()
        if kernel is None:
            kernel = K.MaternKernel(2.5)
        if likelihood is None:
            if self.gpr_type == "MultiTask":
                likelihood = K.MultitaskGaussianLikelihood(num_tasks=self.r)
            else:
                likelihood = K.GaussianLikelihood()
        return mean, kernel, likelihood

    def _init_task_params(self, mean, kernel, likelihood):
        p = {"mean": mean.init_params(self.d),
             "kernel": kernel.init_params(self.d)}
        if isinstance(likelihood, K.GaussianLikelihood):
            p["likelihood"] = likelihood.init_params()
        return p

    def train(self, mean=None, kernel=None, likelihood=None,
              max_iter: int = 1000, rel_error: float = 1e-5, lr: float = 0.1,
              verbose: bool = False, config=None, engine: str = "device"):
        """``config`` (:class:`openmeasure_tpu.core.config.GPTrainConfig`)
        overrides max_iter/rel_error/lr/verbose when given.

        ``engine='host'`` runs the GP stage — hyperparameter training here
        and every later posterior/retrain — on the host CPU in float64
        (:mod:`openmeasure_tpu.core.host64`), on top of the device-fit
        basis.  This reproduces the reference's numerics (gpytorch trains
        in double, ``gpr.py:480-481,503-504``) where the ambient device
        path is fp32: the GP matrices are tiny ((p, p) ≈ (41, 41)), so the
        f64 pass is nearly free and removes the fp32-GP-arithmetic share
        of the accuracy gap (BASELINE.md round-4 decomposition).  The
        default ``'device'`` keeps the all-fp32 single-dispatch path.
        """
        if config is not None:
            max_iter = config.max_iter
            rel_error = config.rel_error
            lr = config.lr
            verbose = config.verbose
            engine = getattr(config, "engine", engine)
        if engine not in ("device", "host"):
            raise ValueError(
                f"engine must be 'device' or 'host'; got {engine!r}")
        self.engine = engine
        self.max_iter = max_iter
        self.rel_error = rel_error
        self.lr = lr
        self.verbose = verbose

        mean, kernel, likelihood = self._default_specs(mean, kernel,
                                                       likelihood)
        # fail at the API boundary, not with a KeyError/rank error deep in
        # tracing: each gpr_type supports exactly one likelihood family
        # (FixedNoiseGaussianLikelihood arises only via update(retrain))
        if self.gpr_type == "MultiTask":
            if not isinstance(likelihood, K.MultitaskGaussianLikelihood):
                raise TypeError(
                    "MultiTask training needs a MultitaskGaussian"
                    f"Likelihood; got {type(likelihood).__name__}.")
        elif not isinstance(likelihood, K.GaussianLikelihood):
            raise TypeError(
                "SingleTask training needs a GaussianLikelihood; got "
                f"{type(likelihood).__name__}.")
        self.mean = mean
        self.kernel = kernel
        self.likelihood = likelihood

        P0 = _as_device(self.P0)
        Vr = _as_device(self.Vr)
        self._train_X = P0
        self._train_Y = Vr

        if self.gpr_type == "MultiTask":
            params0 = {
                "tasks": _stack_params(
                    self._init_task_params(mean, kernel, likelihood), self.r),
                "likelihood": likelihood.init_params(),
            }
            self.params, res = self._multitask_adam(params0, P0, Vr,
                                                    verbose)
            self._final_loss = res.loss
            # train-mode output.stddev == prior stddev per task
            Vr_sigma = self._prior_stddev_all(self.params["tasks"], P0)
        else:
            task0 = self._init_task_params(mean, kernel, likelihood)
            params0 = _stack_params(task0, self.r)
            res = self._single_task_adam(params0, likelihood, P0, Vr,
                                         verbose)
            self.params = res.params
            self._final_loss = res.loss
            Vr_sigma = self._prior_stddev_all(self.params, P0)

        self.Vr_sigma = Vr_sigma
        if verbose:
            import numpy as _np
            print(f"GP training done - final loss per model: "
                  f"{_np.asarray(res.loss)}; iterations: "
                  f"{_np.asarray(res.iterations)}")
        # API-compat return: per-mode parameter pytrees + likelihood specs
        self._refresh_api_compat()
        return self.models, self.likelihoods

    def _run_gp_stage(self, fn, *args):
        """Run one GP compute stage under the model's engine.

        ``engine='device'`` (default): call through — ambient backend and
        dtype (the TPU fp32 path).  ``engine='host'``: the SAME program on
        the host CPU backend in float64 (:mod:`openmeasure_tpu.core.host64`;
        float leaves of every arg pytree cast to f64, outputs materialized
        as host numpy f64) — reference double-precision GP numerics
        (``gpr.py:480-481,503-504``) on top of the device-fit basis."""
        if getattr(self, "engine", "device") == "host":
            from ..core.host64 import host_f64, tree_f64, tree_host
            with host_f64():
                return tree_host(fn(*[tree_f64(a) for a in args]))
        return fn(*args)

    def _prior_stddev_all(self, task_params, P0):
        """(p, r) prior stddev at P0 under the engine — what the reference
        records as ``Vr_sigma`` (train-mode ``output.stddev``)."""
        def run(tp, X):
            return jax.vmap(
                lambda t: E.gp_prior_stddev(self.mean, self.kernel, t, X)
            )(tp).T
        return self._run_gp_stage(run, task_params, P0)

    def _single_task_adam(self, params0, likelihood, P0, Vr, verbose):
        """One vmapped single-task Adam/early-stop run under the engine —
        SINGLE SOURCE for train()/update() fixed-noise retrain/
        update_basis warm restart (loss builder + closed-form gradient
        oracle wiring; the oracle returns None → autodiff for
        non-standard specs)."""
        def run(params0, P0, Vr):
            loss_fn = E.make_single_task_loss(self.mean, self.kernel,
                                              likelihood, P0, Vr.T)
            vag = E.make_single_task_value_and_grad(
                self.mean, self.kernel, likelihood, P0, Vr.T)
            return E.adam_early_stop(loss_fn, params0, lr=self.lr,
                                     max_iter=self.max_iter,
                                     rel_error=self.rel_error,
                                     verbose=verbose, value_and_grad=vag)
        return self._run_gp_stage(run, params0, P0, Vr)

    def _multitask_adam(self, params, P0, Vr, verbose):
        """One MultiTask Adam/early-stop run from ``params`` on (P0, Vr):
        the [None]-batch wrap + closed-form-gradient-oracle boilerplate,
        SINGLE SOURCE for train()/update()/_assimilate (the retrain sites
        previously omitted the oracle and ran ~2x slower per iteration).
        Runs under the engine.  Returns (unbatched params, TrainResult)."""
        def run(params, P0, Vr):
            loss_raw = E.make_multitask_loss(self.mean, self.kernel,
                                             self.likelihood, P0, Vr)
            params_b = jax.tree_util.tree_map(lambda x: x[None], params)

            def loss_fn(pb):
                return loss_raw(jax.tree_util.tree_map(lambda x: x[0], pb))

            vag_raw = E.make_multitask_value_and_grad(
                self.mean, self.kernel, self.likelihood, P0, Vr)
            vag = None
            if vag_raw is not None:
                def vag(pb):
                    losses, grads = vag_raw(
                        jax.tree_util.tree_map(lambda x: x[0], pb))
                    return losses, jax.tree_util.tree_map(
                        lambda g: g[None], grads)
            res = E.adam_early_stop(loss_fn, params_b, lr=self.lr,
                                    max_iter=self.max_iter,
                                    rel_error=self.rel_error,
                                    verbose=verbose, value_and_grad=vag)
            return (jax.tree_util.tree_map(lambda x: x[0], res.params),
                    res)
        return self._run_gp_stage(run, params, P0, Vr)

    def _refresh_api_compat(self):
        """Rebuild the reference-parity ``models``/``likelihoods`` views
        from the CURRENT params/likelihood — every (re)training site must
        call this (the reference refreshes both, gpr.py:662,674-675)."""
        if self.gpr_type == "MultiTask":
            self.models = [self.params]
            self.likelihoods = [self.likelihood]
        else:
            self.models = [
                jax.tree_util.tree_map(lambda x: x[i], self.params)
                for i in range(self.r)]
            self.likelihoods = [self.likelihood] * self.r

    def _guard_pigpr_retrain(self, retrain):
        """The standard retrain loop would silently drop PIGPR's
        added-loss term — reject BEFORE any state mutation (shared by
        update/update_basis incl. the streaming classes)."""
        if retrain and isinstance(self, PIGPR):
            raise ValueError(
                "PIGPR cannot retrain with the standard loop (it would "
                "drop the added-loss term); update with retrain=False "
                "and call train() again.")

    def _guard_no_orphaned_updates(self):
        """update_basis re-derives the GP training set from the fitted
        coefficients only; (P, A) pairs previously assimilated via
        update() have no raw snapshots to rotate and would silently
        vanish — reject instead."""
        if hasattr(self, "_train_X") and int(self._train_X.shape[0]) >                 int(np.asarray(self.P0).shape[0]):
            raise ValueError(
                "update_basis would silently discard the extra (P, A) "
                "pairs previously assimilated via update() (their raw "
                "snapshots are not retained, so the basis rotation "
                "cannot re-derive their targets). Run update_basis "
                "first and update() after, or refit from the extended "
                "snapshot set.")

    # ------------------------------------------------------------------ #
    # Posterior helpers
    # ------------------------------------------------------------------ #

    def _posterior_all(self, P0_star) -> MultitaskPosterior:
        """Noise-inclusive posterior at scaled test points, all modes —
        under the engine (host-f64 posteriors for ``engine='host'``
        models, matching their f64-trained hyperparameters)."""
        def run(params, X, Y, Xs):
            means, variances = posterior_all_modes(
                self.mean, self.kernel, self.likelihood, self.gpr_type,
                params, X, Y, Xs)
            return means.T, jnp.sqrt(variances).T
        m, s = self._run_gp_stage(run, self.params, self._train_X,
                                  self._train_Y, P0_star)
        return MultitaskPosterior(mean=m, stddev=s)

    def _state_constraint_parts(self, limits, bc):
        """State-space constraint parts for the constrained MAP: the
        physical ``limits`` box on ``S = Ur·diag(Σ_r)`` and the ``bc``
        equality pins, scaled with the model's own stats.  SINGLE SOURCE
        shared by :meth:`predict` and ``serving.GPRSensor.from_gpr``
        (previously near-duplicated and already drifting).  ``bc`` values
        may be (n_bc,) fixed or (n_bc, n_p) per-point; callers validate
        shape policy (serving rejects batched pins).  The (n, r) ``S``
        product is only computed when a part needs it."""
        parts = []
        if limits is None and bc is None:
            return parts
        S = self.Ur * self.Sigma_r[None, :]
        if limits is not None:
            lo_b, hi_b = self.scale_limits(limits)
            parts.append(_boxls.LinearConstraints(S, lo_b, hi_b))
        if bc is not None:
            rows = np.asarray(bc[0], dtype=int)
            values = np.asarray(bc[1], dtype=float)
            cnt = np.asarray(self.X_cnt)[rows, 0]
            scl = np.asarray(self.X_scl)[rows, 0]
            if values.ndim == 1:
                v0 = jnp.asarray((values - cnt) / scl)
            else:
                v0 = jnp.asarray((values - cnt[:, None]) / scl[:, None]).T
            parts.append(_boxls.LinearConstraints(S[rows, :], v0, v0))
        return parts

    # ------------------------------------------------------------------ #
    # Predict (reference gpr.py:517-601)
    # ------------------------------------------------------------------ #

    def predict(self, P_star, problem_dict=None, limits=None, bc=None,
                constraints=None, **kwargs):
        """Posterior POD coefficients at new parameters.

        Returns (A_pred, A_sigma), each (n_p, r).

        Constrained prediction (MultiTask only, reference ``gpr.py:569-580``):
        each point's posterior mean is replaced by the MAP of the posterior
        Gaussian under the constraint set, solved by a whitened ADMM QP on
        device and vmapped over test points.  Constraints compose from:

        * ``limits=[min, max]`` — physical per-feature box on the
          reconstructed scaled field, fixed across points
          (``limits0 ≤ Ur diag(Σ_r) v ≤ limits0``);
        * ``bc=(rows, values)`` — per-point boundary-condition equality pins,
          the reference's ``bc0_limits`` pattern (``gpr.py:575-578``,
          ``tests/test_gpr_data.py:88-115``): ``rows`` (n_bc,) state-row
          indices, ``values`` (n_bc, n_p) physical values the reconstruction
          must take at those rows for each test point;
        * ``constraints`` — a
          :class:`openmeasure_tpu.linalg.boxls.LinearConstraints` acting on v
          in scaled coefficient space (lo/hi optionally batched over points),
          the fully general form of the reference's caller-built CVXPY
          problem.

        ``problem_dict={'limits':…, 'bc':…, 'constraints':…}`` is accepted
        for signature parity with the reference.
        """
        if not hasattr(self, "models"):
            raise AttributeError("The function fit has to be called "
                                 "before calling predict.")
        P_star = np.asarray(P_star)
        if P_star.ndim < 2:
            P_star = P_star[None, :]
        n_p = P_star.shape[0]

        P0_star = (jnp.asarray(P_star) - self.P_cnt[0][None, :]) \
            / self.P_scl[0][None, :]

        post = self._posterior_all(P0_star)
        V_pred, V_sigma = post.mean, post.stddev

        if problem_dict is not None:
            limits = limits if limits is not None else problem_dict.get(
                "limits")
            bc = bc if bc is not None else problem_dict.get("bc")
            constraints = constraints if constraints is not None else \
                problem_dict.get("constraints")
        if bc is not None:
            values = np.asarray(bc[1], dtype=float)
            if values.ndim == 1:
                values = values[:, None]
            if values.shape[1] != n_p:
                raise ValueError(
                    f"bc values must be (n_bc, n_p={n_p}); got "
                    f"{values.shape}")
            bc = (bc[0], values)
        parts = self._state_constraint_parts(limits, bc)
        if constraints is not None:
            # shared normalization (single contract with CPOD/SPR/serving)
            cs_user, _ = _boxls.build_constraint_set(constraints, None)
            parts.append(cs_user)

        if parts:
            if self.gpr_type != "MultiTask":
                raise NotImplementedError(
                    "Constrained prediction only works for MultiTask models.")
            cs = _boxls.concat_constraints(parts)
            A = cs.A
            AtA = jnp.matmul(A.T, A, precision=jax.lax.Precision.HIGHEST)

            def map_one(mu, sig, lo_i, hi_i):
                cov = jnp.diag(sig ** 2)
                v, _ = _boxls.box_constrained_map(
                    mu, cov, A, lo_i, hi_i, AtA=AtA,
                    max_iter=kwargs.get("max_iter", 4000),
                    tol=kwargs.get("tol", 1e-9))
                return v

            in_axes = (0, 0, 0 if jnp.ndim(cs.lo) == 2 else None,
                       0 if jnp.ndim(cs.hi) == 2 else None)
            V_pred = jax.vmap(map_one, in_axes=in_axes)(
                V_pred, V_sigma, cs.lo, cs.hi)

        # host engine: keep the Σ-rescale in f64 on the host (V_pred is a
        # host-f64 posterior there; a device multiply would round it to
        # fp32 before scaling).  The constrained branch above runs the
        # device ADMM either way — its accuracy is set by the iteration
        # budget, not the operand dtype.
        if getattr(self, "engine", "device") == "host":
            sig = np.asarray(self.Sigma_r, np.float64)[None, :]
        else:
            sig = self.Sigma_r[None, :]
        A_pred = V_pred * sig
        A_sigma = V_sigma * sig
        return A_pred, A_sigma

    # ------------------------------------------------------------------ #
    # Update (reference gpr.py:603-675)
    # ------------------------------------------------------------------ #

    def update(self, P_new, A_new, A_sigma_new=None, retrain: bool = False,
               verbose: bool = False):
        self._guard_pigpr_retrain(retrain)
        self.verbose = verbose

        P0_new = (jnp.asarray(P_new) - self.P_cnt[0][None, :]) \
            / self.P_scl[0][None, :]
        P0_tot = jnp.concatenate([self._train_X, P0_new], axis=0)

        Vr_new = jnp.asarray(A_new) / self.Sigma_r[None, :]
        Vr_tot = jnp.concatenate([self._train_Y, Vr_new], axis=0)

        # set_train_data(strict=False) equivalent
        self._train_X = P0_tot
        self._train_Y = Vr_tot

        if A_sigma_new is not None:
            Vr_sigma_new = jnp.asarray(A_sigma_new) / self.Sigma_r[None, :]
        else:
            # no uncertainties supplied: extend with the prior stddev at the
            # new points (the same quantity Vr_sigma holds for the original
            # training set), keeping Vr_sigma length-consistent with
            # _train_X so a later fixed-noise retrain remains well-formed
            if self.gpr_type == "MultiTask":
                task_params = self.params["tasks"]
            else:
                task_params = self.params
            Vr_sigma_new = self._prior_stddev_all(task_params, P0_new)
        if getattr(self, "engine", "device") == "host":
            # host-f64 bookkeeping (a jnp concat would round the stored
            # f64 sigmas back to fp32)
            Vr_sigma_tot = np.concatenate(
                [np.asarray(self.Vr_sigma, np.float64),
                 np.asarray(Vr_sigma_new, np.float64)], axis=0)
        else:
            Vr_sigma_tot = jnp.concatenate(
                [_as_device(self.Vr_sigma), Vr_sigma_new], axis=0)
        # (the reference zeroes these, gpr.py:654; we keep actual values)
        self.Vr_sigma = Vr_sigma_tot

        # an installed fixed-noise likelihood (from a prior fixed-noise
        # retrain) must stay length-consistent with the extended training
        # set, or the next posterior solve breaks on a (p_tot,p_tot) vs
        # (p_old,) broadcast — extend it with the new variances
        if self.gpr_type != "MultiTask" and \
                isinstance(self.likelihood, K.FixedNoiseGaussianLikelihood):
            params = dict(self.params)
            params["likelihood"] = {"fixed_noise": (Vr_sigma_tot ** 2).T}
            self.params = params

        if not retrain:
            return

        if self.gpr_type == "MultiTask":
            self.params, _ = self._multitask_adam(self.params, P0_tot,
                                                  Vr_tot, verbose)
            self.Vr_sigma = self._prior_stddev_all(self.params["tasks"],
                                                   P0_tot)
        else:
            # Reference swaps in FixedNoiseGaussianLikelihood(Vr_sigma²)
            # (gpr.py:671-672); requires the uncertainties.
            if A_sigma_new is None:
                raise ValueError(
                    "retrain=True for SingleTask requires A_sigma_new "
                    "(fixed-noise retraining uses the data uncertainties).")
            fixed = K.FixedNoiseGaussianLikelihood()
            params0 = dict(self.params)
            params0["likelihood"] = {
                "fixed_noise": (Vr_sigma_tot ** 2).T}  # (r, p_tot)
            res = self._single_task_adam(params0, fixed, P0_tot, Vr_tot,
                                         verbose)
            self.params = res.params
            self.likelihood = fixed
            self.Vr_sigma = self._prior_stddev_all(self.params, P0_tot)
        # the API-compat views (models/likelihoods) must track the
        # re-optimized params and the possibly-swapped likelihood, like
        # the reference does (gpr.py:662,674-675)
        self._refresh_api_compat()

    def update_basis(self, X_new, P_new, select_modes: str = "number",
                     n_modes=None, reorth: bool = True,
                     retrain: bool = False, verbose: bool = False):
        """Assimilate new (parameter, snapshot) pairs into BOTH the POD
        basis and the GP regression.

        Capability beyond the reference: its ``GPR.update``
        (``gpr.py:603-675``) extends only the GP training data against the
        FROZEN basis — a basis refresh means a full refit + retrain.  Here
        the basis absorbs the new snapshots via Brand's incremental update
        (:meth:`ROM.update_basis` — frozen X scaling stats), and because
        that update ROTATES every right factor, the GP targets for the
        ORIGINAL parameter points change too: unlike :meth:`update`, the
        whole training set is re-set (``P0_tot``, the updated ``Vr``).
        ``P_new`` is scaled with the frozen parameter stats (the
        :meth:`update` contract, reference ``gpr.py:630-632``).

        On a trained model a rank CHANGE invalidates the per-mode parameter
        stacks (shaped (r, ...)): the trained state is dropped, and
        ``retrain=True`` then trains FRESH with the saved
        mean/kernel/likelihood specs (a ``num_tasks``-bearing likelihood is
        rebuilt at the new rank); ``retrain=False`` leaves the model
        fitted-but-untrained — :meth:`train` must run before
        :meth:`predict`.  With the rank unchanged, ``retrain=True``
        re-runs the standard Adam/early-stop loop from the CURRENT
        hyperparameters (warm start — a basis update perturbs targets
        slightly, so convergence is typically a few iterations).
        """
        self._guard_pigpr_retrain(retrain)
        self._guard_no_orphaned_updates()
        X_arr = np.asarray(X_new)
        q = 1 if X_arr.ndim == 1 else X_arr.shape[1]
        P_new = self._validate_update_params(P_new, q)
        trained = hasattr(self, "params")
        r_old = self.r
        super().update_basis(X_new, select_modes=select_modes,
                             n_modes=n_modes, reorth=reorth)
        self._assimilate_params_after_update(P_new, trained, r_old,
                                             retrain, verbose)

    def _validate_update_params(self, P_new, q):
        """Shared (in-core + streaming) validation of the arriving
        parameter rows against the arriving snapshot count ``q``."""
        P_new = np.atleast_2d(np.asarray(P_new))
        if P_new.shape[0] != q:
            raise Exception(
                f"The number of parameters ({P_new.shape[0]}) is different"
                f" from the number of columns of X ({q})")
        if P_new.shape[1] != self.P.shape[1]:
            raise ValueError(
                f"P_new has {P_new.shape[1]} columns; expected "
                f"{self.P.shape[1]}.")
        return P_new

    def _assimilate_params_after_update(self, P_new, trained, r_old,
                                        retrain, verbose):
        """GP-side bookkeeping after the basis absorbed the new snapshots:
        extend P/P0 with frozen parameter stats, re-set the training set
        (the update rotated every right factor), optionally warm-start
        retrain.  Shared by :meth:`update_basis` and the streaming class."""
        rank_changed = trained and self.r != r_old
        if rank_changed:
            # rank change orphans the (r_old, ...) parameter stacks: drop
            # the trained state so the model is fitted-but-untrained again
            for a in ("params", "models", "likelihoods", "Vr_sigma",
                      "_final_loss", "_train_X", "_train_Y"):
                if hasattr(self, a):
                    delattr(self, a)
            trained = False

        self.P = np.concatenate([np.asarray(self.P), P_new], axis=0)
        P0_new = (jnp.asarray(P_new, dtype=jnp.asarray(self.P0).dtype)
                  - self.P_cnt[0][None, :]) / self.P_scl[0][None, :]
        self.P0 = jnp.concatenate([_as_device(self.P0), P0_new], axis=0)

        if not trained:
            if rank_changed and retrain:
                # no (r_old, ...) stacks to warm-start from — train FRESH
                # with the saved specs (a num_tasks-bearing likelihood is
                # rebuilt at the new rank)
                likelihood = self.likelihood
                if hasattr(likelihood, "num_tasks"):
                    likelihood = type(likelihood)(num_tasks=self.r)
                self.train(mean=self.mean, kernel=self.kernel,
                           likelihood=likelihood, max_iter=self.max_iter,
                           rel_error=self.rel_error, lr=self.lr,
                           verbose=verbose)
            elif retrain:
                # never-trained model: there are no hyperparameters (or
                # max_iter/lr) to warm-start from — refuse loudly instead
                # of returning an untrained model the caller believes is
                # trained
                raise ValueError(
                    "update_basis(retrain=True) needs a trained model — "
                    "call train() first, or retrain=False and train() "
                    "after the update.")
            return

        P0_tot = _as_device(self.P0)
        Vr_tot = _as_device(self.Vr)
        self._train_X = P0_tot
        self._train_Y = Vr_tot

        if retrain:
            self._guard_pigpr_retrain(retrain)   # streaming path defense
            if self.gpr_type == "MultiTask":
                self.params, _ = self._multitask_adam(self.params, P0_tot,
                                                      Vr_tot, verbose)
            else:
                res = self._single_task_adam(self.params, self.likelihood,
                                             P0_tot, Vr_tot, verbose)
                self.params = res.params

        # prior stddev at the full set with the (possibly re-optimized)
        # hyperparameters — same bookkeeping as update()
        if self.gpr_type == "MultiTask":
            task_params = self.params["tasks"]
        else:
            task_params = self.params
        self.Vr_sigma = self._prior_stddev_all(task_params, P0_tot)
        self._refresh_api_compat()


class PIGPR(GPR):
    """Physics-informed GPR (MultiTask-only, reference ``gpr.py:677-889``).

    ``added_loss(ctx) -> scalar`` receives
    ``ctx = {'output': MultitaskPosterior at [train + constraint points],
    'loss_ml': detached joint log-prob of the training data, 'verbose': ...,
    'loss_dict': ...}`` and returns a term *added to the log-likelihood*
    (so a penalty should come back negative), differentiable w.r.t. the
    posterior — the gpytorch AddedLossTerm contract.
    """

    def __init__(self, X, n_features, xyz, P, P_cstr,
                 AddedLoss: Callable):
        super().__init__(X, n_features, xyz, P, "MultiTask")
        self.P_cstr = P_cstr
        self.AddedLoss = AddedLoss

    def _scaled_constraint_points(self):
        P0_cstr = (jnp.asarray(self.P_cstr) - self.P_cnt[0][None, :]) \
            / self.P_scl[0][None, :]
        return jnp.concatenate([_as_device(self.P0), P0_cstr], axis=0)

    def update_basis(self, X_new, P_new, select_modes: str = "number",
                     n_modes=None, reorth: bool = True,
                     retrain: bool = False, verbose: bool = False):
        """Basis + training-set assimilation (see :meth:`GPR.update_basis`).
        ``retrain=True`` is rejected here: the standard warm-start loop
        would silently drop the physics-informed added-loss term — call
        :meth:`train` after the update instead."""
        if retrain:
            raise ValueError(
                "PIGPR.update_basis cannot retrain with the standard loop "
                "(it would drop the added-loss term); update with "
                "retrain=False and call train() again.")
        super().update_basis(X_new, P_new, select_modes=select_modes,
                             n_modes=n_modes, reorth=reorth,
                             retrain=False, verbose=verbose)

    def _posterior_with(self, params, P0_eval):
        """Noise-inclusive posterior at P0_eval under given params —
        differentiable (the added loss backpropagates through this)."""
        X, Y = _as_device(self.P0), _as_device(self.Vr)
        noises = self.likelihood.noise(params["likelihood"])

        def post_one(tp, y, nz):
            return E.gp_posterior(self.mean, self.kernel, tp, nz, X, y,
                                  P0_eval, include_noise=True)
        means, variances = jax.vmap(post_one)(params["tasks"], Y.T, noises)
        return MultitaskPosterior(mean=means.T, stddev=jnp.sqrt(variances).T)

    def train(self, mean=None, kernel=None, likelihood=None,
              max_iter: int = 1000, rel_error: float = 1e-5, lr: float = 0.1,
              verbose: bool = False, loss_dict=None):
        self.max_iter = max_iter
        self.rel_error = rel_error
        self.lr = lr
        self.verbose = verbose
        # PIGPR has no host-f64 engine: the added-loss callback is user
        # code differentiated inside the training loop, and the Pallas
        # chol-inverse JVP path it leans on is the device formulation —
        # pin the engine so a previous host-trained GPR state cannot leak
        # host semantics into the PIGPR posteriors
        self.engine = "device"

        mean, kernel, likelihood = self._default_specs(mean, kernel,
                                                       likelihood)
        self.mean, self.kernel, self.likelihood = mean, kernel, likelihood

        P0 = _as_device(self.P0)
        Vr = _as_device(self.Vr)
        self._train_X, self._train_Y = P0, Vr
        P0_tot = self._scaled_constraint_points()
        self.P0_tot = P0_tot

        def added_loss_fn(params):
            output = self._posterior_with(params, P0_tot)
            # detached joint log-prob of the training data (gpr.py:870)
            noises = self.likelihood.noise(params["likelihood"])

            def task_lp(tp, y, nz):
                return E.gp_log_prob(mean, kernel, tp, nz, P0, y)
            loss_ml = jax.lax.stop_gradient(
                jnp.sum(jax.vmap(task_lp)(params["tasks"], Vr.T, noises)))
            return self.AddedLoss({"output": output, "loss_ml": loss_ml,
                                   "verbose": verbose,
                                   "loss_dict": loss_dict})

        params0 = {
            "tasks": _stack_params(
                self._init_task_params(mean, kernel, likelihood), self.r),
            "likelihood": likelihood.init_params(),
        }
        loss_raw = E.make_multitask_loss(mean, kernel, likelihood, P0, Vr,
                                         added_loss_fn=added_loss_fn)
        params0_b = jax.tree_util.tree_map(lambda x: x[None], params0)

        def loss_fn(pb):
            return loss_raw(jax.tree_util.tree_map(lambda x: x[0], pb))

        res = E.adam_early_stop(loss_fn, params0_b, lr=lr, max_iter=max_iter,
                                rel_error=rel_error, verbose=verbose)
        self.params = jax.tree_util.tree_map(lambda x: x[0], res.params)
        self._final_loss = res.loss
        self.Vr_sigma = jax.vmap(
            lambda tp: E.gp_prior_stddev(mean, kernel, tp, P0)
        )(self.params["tasks"]).T
        self.models = [self.params]
        self.likelihoods = [likelihood]
        return self.models, self.likelihoods

    def compute_mll(self, mean=None, kernel=None, likelihood=None):
        """MLL of the training data and prediction at [train + constraint]
        points under *initial* (untrained) hyperparameters — used to
        calibrate added-loss coefficients (reference ``gpr.py:782-846``).
        Returns (loss_mll, Vr_pred_train)."""
        mean, kernel, likelihood = self._default_specs(mean, kernel,
                                                       likelihood)
        P0 = _as_device(self.P0)
        Vr = _as_device(self.Vr)
        P0_tot = self._scaled_constraint_points()

        params = {
            "tasks": _stack_params(
                self._init_task_params(mean, kernel, likelihood), self.r),
            "likelihood": likelihood.init_params(),
        }
        noises = likelihood.noise(params["likelihood"])

        def task_lp(tp, y, nz):
            return E.gp_log_prob(mean, kernel, tp, nz, P0, y)
        loss_mll = jnp.sum(jax.vmap(task_lp)(params["tasks"], Vr.T, noises))

        saved = (self.mean if hasattr(self, "mean") else None,
                 self.kernel if hasattr(self, "kernel") else None,
                 self.likelihood if hasattr(self, "likelihood") else None)
        self.mean, self.kernel, self.likelihood = mean, kernel, likelihood
        post = self._posterior_with(params, P0_tot)
        if saved[0] is not None:
            self.mean, self.kernel, self.likelihood = saved
        return np.asarray(loss_mll), post.mean
