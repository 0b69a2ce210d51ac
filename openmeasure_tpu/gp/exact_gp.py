"""Exact GP engine: Cholesky marginal likelihood, posteriors, and a vmapped
Adam hyperparameter trainer with per-model early stopping.

Replaces the gpytorch/libtorch training loop of the reference
(``gpr.py:220-251``): same objective (−ExactMarginalLogLikelihood), same
optimizer (Adam, lr/betas/eps matching torch defaults), same stopping rule
(|Δloss| < rel_error or max_iter) — but the r independent single-task models
train simultaneously as one vmapped XLA program with per-mode convergence
freezing, instead of a serial Python loop (``gpr.py:497-509``).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .kernels import MultitaskGaussianLikelihood
from ..linalg.chol_pallas import (chol_inv_logdet, chol_fits_vmem,
                                  kernel_path_wanted)


def _jitter(dtype) -> float:
    # gpytorch cholesky jitter: 1e-8 double, 1e-6 float
    return 1e-8 if dtype == jnp.float64 else 1e-6


def _chol_with_jitter(K: jax.Array) -> jax.Array:
    n = K.shape[0]
    return jnp.linalg.cholesky(
        K + _jitter(K.dtype) * jnp.eye(n, dtype=K.dtype))


def _use_kernel_path(n: int, dtype) -> bool:
    """Gate for the Pallas explicit-inverse formulation: backend/dtype
    want it AND the batched kernel actually accepts size n — otherwise
    the auto dispatcher would fall back to forming the full inverse via
    an n-RHS cho_solve where the plain single-RHS branch is strictly
    cheaper and better conditioned."""
    return kernel_path_wanted(dtype) and chol_fits_vmem(1, n)


def _lp_alpha_kinv(Kn: jax.Array, resid: jax.Array, need_kinv: bool):
    """Jittered Gaussian log-prob core — SINGLE SOURCE for the
    Pallas-inverse/cho_solve branch pair (previously triplicated across
    gp_log_prob / gp_posterior / the closed-form oracle).  Returns
    ``(lp, alpha, Kinv)`` with ``Kinv`` None when ``need_kinv`` is False
    on the cho_solve path."""
    n = Kn.shape[0]
    eye = jnp.eye(n, dtype=Kn.dtype)
    Kj = Kn + _jitter(Kn.dtype) * eye
    hp = jax.lax.Precision.HIGHEST
    if _use_kernel_path(n, Kn.dtype):
        Kinv, logdet = chol_inv_logdet(Kj)
        alpha = jnp.matmul(Kinv, resid, precision=hp)
        lp = (-0.5 * resid @ alpha - 0.5 * logdet
              - 0.5 * n * jnp.log(2.0 * jnp.pi))
        return lp, alpha, Kinv
    L = jnp.linalg.cholesky(Kj)
    alpha = jax.scipy.linalg.cho_solve((L, True), resid)
    lp = (-0.5 * resid @ alpha
          - jnp.sum(jnp.log(jnp.diagonal(L)))
          - 0.5 * n * jnp.log(2.0 * jnp.pi))
    Kinv = jax.scipy.linalg.cho_solve((L, True), eye) if need_kinv \
        else None
    return lp, alpha, Kinv


def gp_log_prob(mean_spec, kernel_spec, params: Dict, noise: jax.Array,
                X: jax.Array, y: jax.Array) -> jax.Array:
    """log N(y | μ(X), K(X,X) + diag(noise)).  ``noise`` is a scalar or a
    per-point vector (FixedNoise path)."""
    with jax.default_matmul_precision("highest"):
        n = X.shape[0]
        K = kernel_spec(params["kernel"], X, X)
        K = K + jnp.eye(n, dtype=K.dtype) * noise
        mu = mean_spec(params["mean"], X)
        resid = y - mu
        # Pallas batched inverse on the TPU path (chol_pallas.py): PIGPR's
        # added-loss iteration autodiffs through this log-prob every step
        # — the kernel's analytic JVP (dK⁻¹ = −K⁻¹ dK K⁻¹) replaces
        # autodiff through XLA's While-loop cholesky.  Measured on the
        # PIGPR loss+grad step (14 modes, p=41, 9 constraint pts, v5e,
        # slope-timed): 111.2 → 27.4 µs (4.1×), loss agreement 2e-6
        # (A/B via OMTPU_NO_CHOL_KERNEL=1).  CPU/f64 bit-identical via
        # the cho_solve branch.
        lp, _, _ = _lp_alpha_kinv(K, resid, need_kinv=False)
        return lp


def gp_posterior(mean_spec, kernel_spec, params: Dict, noise: jax.Array,
                 X: jax.Array, y: jax.Array, Xs: jax.Array,
                 include_noise: bool = True,
                 pred_noise: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
    """Posterior predictive mean and variance at Xs.

    ``include_noise=True`` reproduces ``likelihood(model(x))`` — the
    observation-noise-inclusive predictive the reference reads mean/stddev
    from (``gpr.py:565-567``).  ``pred_noise`` overrides the noise added at
    the test points (defaults to the training noise)."""
    with jax.default_matmul_precision("highest"):
        n = X.shape[0]
        Kxx = kernel_spec(params["kernel"], X, X)
        K = Kxx + jnp.eye(n, dtype=Kxx.dtype) * noise
        Ks = kernel_spec(params["kernel"], Xs, X)              # (s, n)
        # prior variance at each test point WITHOUT the (s, s) kernel
        # matrix — the full Gram was materialized only for its diagonal
        # (quadratic memory at large prediction grids)
        kss = jax.vmap(
            lambda x: kernel_spec(params["kernel"], x[None, :],
                                  x[None, :])[0, 0])(Xs)
        mu = mean_spec(params["mean"], X)
        mus = mean_spec(params["mean"], Xs)
        if _use_kernel_path(n, K.dtype):
            # Same Pallas inverse as gp_log_prob; var via Ks K⁻¹ Ksᵀ diag
            # (vs L⁻¹Ksᵀ columns) — f32 round-off only, guarded at 0.
            Kinv, _ = chol_inv_logdet(
                K + _jitter(K.dtype) * jnp.eye(n, dtype=K.dtype))
            alpha = jnp.matmul(Kinv, y - mu,
                               precision=jax.lax.Precision.HIGHEST)
            mean_s = mus + Ks @ alpha
            W = jnp.matmul(Ks, Kinv,
                           precision=jax.lax.Precision.HIGHEST)
            var_s = jnp.maximum(kss - jnp.sum(W * Ks, axis=1), 0.0)
        else:
            L = _chol_with_jitter(K)
            alpha = jax.scipy.linalg.cho_solve((L, True), y - mu)
            mean_s = mus + Ks @ alpha
            v = jax.scipy.linalg.solve_triangular(L, Ks.T, lower=True)
            var_s = jnp.maximum(kss - jnp.sum(v * v, axis=0), 0.0)
        if include_noise:
            if pred_noise is None:
                # a PER-TRAINING-POINT noise vector (FixedNoise path) has
                # no alignment with the test points — adding it raw would
                # broadcast-crash (s != n) or silently misalign (s == n);
                # default to its mean, the convention the GPR predict
                # paths use
                pred_noise = jnp.mean(noise) if jnp.ndim(noise) > 0 \
                    else noise
            var_s = var_s + pred_noise
        return mean_s, var_s


def gp_prior_stddev(mean_spec, kernel_spec, params: Dict, X: jax.Array
                    ) -> jax.Array:
    """Prior stddev at X — what the reference records as Vr_sigma: the
    train-mode ``output.stddev`` is the *prior* stddev at the training
    points (``gpr.py:249``).

    Documented deviation: the reference captures ``output.stddev`` from
    the last training-mode forward — i.e. at the hyperparameters BEFORE
    the final optimizer step — while every caller here evaluates at the
    post-final-step trained params.  At the |Δloss| < rel_error stopping
    point the difference is one Adam step of the kernel hyperparameters;
    the trained-parameter value is the self-consistent one (it is what a
    fixed-noise retrain actually observes)."""
    return jnp.sqrt(jnp.maximum(jax.vmap(
        lambda x: kernel_spec(params["kernel"], x[None, :],
                              x[None, :])[0, 0])(X), 0.0))


class TrainResult(NamedTuple):
    params: Dict          # trained (possibly stacked) parameter pytree
    loss: jax.Array       # final per-model loss
    iterations: jax.Array  # per-model iteration count


@functools.partial(jax.jit,
                   static_argnames=("loss_fn", "lr", "max_iter",
                                    "rel_error", "unroll", "value_and_grad"))
def adam_early_stop(loss_fn: Callable, params0: Dict, lr: float = 0.1,
                    max_iter: int = 1000, rel_error: float = 1e-5,
                    verbose: bool = False, unroll: int = 4,
                    value_and_grad: Optional[Callable] = None) -> TrainResult:
    """Minimize ``loss_fn(params) -> (B,) losses`` with Adam; per-model early
    stop when |Δloss_b| ≤ rel_error (reference stopping rule,
    ``gpr.py:230``).  Converged models are frozen in place while the rest
    keep stepping, all in one while_loop.  Matching the reference's loop
    exactly, the Adam step of the iteration on which convergence is
    detected IS applied and that iteration IS counted (the reference's
    while condition tests |Δloss| before the next iteration, after the
    unconditional ``optimizer.step()``) — pinned by the early-stop
    torch-differential test.

    ``unroll`` substeps run per while_loop iteration.  Honest measurement
    (tunneled v5e, 14-mode flame trainer, 400 iters): 107 ms at unroll=1,
    96 ms at unroll=4, no further gain at 8 — the ~175 µs/iter cost is
    per-op dispatch inside the body (≈200 tiny HLOs), not per-iteration
    fixed overhead, so unrolling buys only ~10%.  Kept at 4 since it is
    free.  Semantics are UNCHANGED: every substep applies the same
    per-model convergence check and freeze, and substeps past ``max_iter``
    or past convergence restore the old parameters, so trajectories,
    final losses, and iteration counts are bit-identical to ``unroll=1``
    (the torch-differential suite pins this).

    ``value_and_grad(params) -> (losses (B,), grads pytree)`` overrides the
    autodiff gradient: pass the closed-form oracle from
    :func:`make_single_task_value_and_grad` to shrink the while_loop body
    from ~200 autodiff HLOs to ~30 (the dispatch cost documented above is
    per-op, so fewer ops = proportionally faster iterations).  Semantics are
    identical — the oracle is pinned against autodiff in
    ``tests/test_gp_engine.py``.

    ``verbose`` is accepted for signature parity but per-iteration printing
    happens at the caller after training (device host-callbacks are
    unavailable on some TPU runtimes)."""
    del verbose
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)  # torch Adam defaults
    opt_state0 = opt.init(params0)

    def total_loss(params):
        losses = loss_fn(params)
        return jnp.sum(losses), losses

    big = jnp.asarray(1e10)

    def cond(state):
        _, _, _, conv, _, j = state
        return jnp.logical_and(j < max_iter, jnp.logical_not(jnp.all(conv)))

    def substep(state):
        params, opt_state, loss_old, conv, iters, j = state
        if value_and_grad is None:
            (_, losses), grads = jax.value_and_grad(
                total_loss, has_aux=True)(params)
        else:
            losses, grads = value_and_grad(params)
        e = jnp.abs(losses - loss_old)
        active = j < max_iter
        updates, opt_state_new = opt.update(grads, opt_state, params)
        params_new = optax.apply_updates(params, updates)

        # Reference semantics (gpr.py:230-251): the while condition checks
        # |Δloss| BEFORE an iteration, and the body always applies
        # optimizer.step() — so the Adam step of the iteration on which
        # convergence is DETECTED is still applied, and that iteration is
        # counted.  Freeze therefore uses the PREVIOUS convergence state;
        # conv_new only stops the NEXT substep.
        frozen = conv | jnp.logical_not(active)
        conv_new = jnp.where(active, conv | (e <= rel_error), conv)

        def freeze(new, old):
            mask = frozen.reshape(frozen.shape + (1,) * (new.ndim - 1))
            return jnp.where(mask, old, new)

        params_new = jax.tree_util.tree_map(freeze, params_new, params)
        loss_next = jnp.where(frozen, loss_old, losses)
        iters = jnp.where(frozen, iters, iters + 1)
        return (params_new, opt_state_new, loss_next, conv_new, iters, j + 1)

    def body(state):
        for _ in range(unroll):
            state = substep(state)
        return state

    B = loss_fn(params0).shape[0]
    state0 = (params0, opt_state0, jnp.full((B,), big),
              jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
              jnp.asarray(0, jnp.int32))
    params, _, losses, _, iters, _ = jax.lax.while_loop(cond, body, state0)
    return TrainResult(params, losses, iters)


# --------------------------------------------------------------------- #
# Loss builders
# --------------------------------------------------------------------- #

def make_single_task_loss(mean_spec, kernel_spec, likelihood_spec,
                          X: jax.Array, Y: jax.Array) -> Callable:
    """Batched −MLL for r independent single-task GPs.

    Y is (r, p) — one row per mode.  Params pytree is stacked with leading
    axis r.  Each loss is divided by p (gpytorch ExactMarginalLogLikelihood
    normalization)."""
    p = X.shape[0]

    def one(params, y):
        # both Gaussian and FixedNoise likelihoods expose .noise(params);
        # the fixed-noise variant returns a stop-gradiented per-point vector
        noise = likelihood_spec.noise(params["likelihood"])
        lp = gp_log_prob(mean_spec, kernel_spec, params, noise, X, y)
        return -lp / p

    def batched(params):
        return jax.vmap(one)(params, Y)

    return batched


def make_single_task_value_and_grad(mean_spec, kernel_spec, likelihood_spec,
                                    X: jax.Array, Y: jax.Array
                                    ) -> Optional[Callable]:
    """Closed-form (loss, gradient) oracle for the batched single-task −MLL.

    Returns a function with the same contract as
    ``jax.value_and_grad(sum ∘ make_single_task_loss)`` — ``params -> (losses
    (B,), grads pytree)`` — but computed from the analytic marginal-likelihood
    gradient ``∂lp/∂θ = ½ tr((ααᵀ − K⁻¹) ∂K/∂θ)`` instead of reverse-mode
    autodiff.  Why: the reference's training loop (``gpr.py:220-251``) is a
    per-iteration hot path; under ``adam_early_stop`` each iteration's cost on
    TPU is per-op dispatch (~200 tiny HLOs for the autodiff pullback through
    the Cholesky), and the closed form needs ~30 ops — the pairwise
    squared-distance stack is parameter-independent and precomputed once.

    Supported spec family (anything else returns ``None`` and the caller
    falls back to autodiff): ``ZeroMean``/``ConstantMean``/``LinearMean`` ×
    ``RBFKernel``/``MaternKernel``/``ScaleKernel(RBF|Matern)`` (ARD or
    scalar lengthscale) × ``GaussianLikelihood``/
    ``FixedNoiseGaussianLikelihood``.  Gradients match autodiff to fp
    round-off, including the Matérn diagonal guard (zero gradient where
    d² ≤ eps²) and the fixed-noise stop-gradient — pinned by
    ``tests/test_gp_engine.py``.
    """
    core = _ClosedFormCore.build(mean_spec, kernel_spec, X)
    from . import kernels as K
    if core is None or not isinstance(
            likelihood_spec, (K.GaussianLikelihood,
                              K.FixedNoiseGaussianLikelihood)):
        return None
    fixed_noise = isinstance(likelihood_spec, K.FixedNoiseGaussianLikelihood)
    p = X.shape[0]

    def one(params, y):
        with jax.default_matmul_precision("highest"):
            noise = likelihood_spec.noise(params["likelihood"])
            lp, lp_grads, trM = core.lp_and_grads(params, y, noise)
            coeff = -1.0 / p                            # loss = −lp/p
            if fixed_noise:
                lgrad = {"fixed_noise": jnp.zeros_like(
                    params["likelihood"]["fixed_noise"])}
            else:
                # ∂lp/∂noise = ½ tr(M) for scalar noise
                lgrad = {"raw_noise":
                         coeff * 0.5 * trM
                         * jax.nn.sigmoid(params["likelihood"]["raw_noise"])}
            grads = jax.tree_util.tree_map(lambda g: coeff * g, lp_grads)
            grads["likelihood"] = lgrad
            return -lp / p, grads

    def batched(params):
        return jax.vmap(one)(params, Y)

    return batched


class _ClosedFormCore:
    """Per-task closed-form lp + ∂lp/∂(mean, kernel params) — the shared
    engine behind the single-task and multitask gradient oracles.

    ``lp_and_grads(task_params, y, noise)`` returns ``(lp, grads, trM)``
    where ``grads = {"mean": ..., "kernel": ...}`` are UNNORMALIZED
    ∂lp/∂θ (callers apply their own −1/p or −1/(p·r) scaling and derive the
    noise gradient from ``trM = tr(ααᵀ − K⁻¹)``)."""

    def __init__(self, mean_spec, base, scaled, nu, D2, X):
        self.mean_spec = mean_spec
        self.base = base
        self.scaled = scaled
        self.nu = nu
        self.D2 = D2
        self.X = X
        self.p = X.shape[0]
        self.eye = jnp.eye(self.p)
        self.mean_kind = type(mean_spec).__name__
        self.has_bias = getattr(mean_spec, "bias", False)

    @classmethod
    def build(cls, mean_spec, kernel_spec, X):
        from . import kernels as K
        if isinstance(kernel_spec, K.ScaleKernel):
            base, scaled = kernel_spec.base, True
        else:
            base, scaled = kernel_spec, False
        if not isinstance(base, (K.RBFKernel, K.MaternKernel)):
            return None
        if not isinstance(mean_spec,
                          (K.ZeroMean, K.ConstantMean, K.LinearMean)):
            return None
        nls = base.ard_num_dims or 1
        diff = X[:, None, :] - X[None, :, :]
        if nls == 1:
            D2 = jnp.sum(diff * diff, axis=-1)[None]     # (1, p, p)
        else:
            D2 = jnp.moveaxis(diff * diff, -1, 0)        # (d, p, p)
        nu = getattr(base, "nu", None)                   # None → RBF
        return cls(mean_spec, base, scaled, nu, D2, X)

    def _g_and_gprime(self, d2):
        """Kernel profile g(d²) and its derivative dg/dd² — both smooth at
        d²=0 for ν ∈ {1.5, 2.5} and RBF; the ν=0.5 derivative is guarded to
        0 on the diagonal exactly as the autodiff path's where-guard is."""
        nu = self.nu
        if nu is None:
            g = jnp.exp(-0.5 * d2)
            return g, -0.5 * g
        eps = jnp.asarray(jnp.finfo(d2.dtype).eps, d2.dtype) ** 2
        safe = d2 > eps
        r = jnp.sqrt(jnp.where(safe, d2, 1.0))
        if nu == 0.5:
            e = jnp.exp(-r)
            g = jnp.where(safe, e, 1.0)
            gp = jnp.where(safe, -e / (2.0 * r), 0.0)
        elif nu == 1.5:
            c = jnp.sqrt(3.0) * r
            e = jnp.exp(-c)
            g = jnp.where(safe, (1.0 + c) * e, 1.0)
            gp = jnp.where(safe, -1.5 * e, 0.0)
        else:
            c = jnp.sqrt(5.0) * r
            e = jnp.exp(-c)
            g = jnp.where(safe, (1.0 + c + (5.0 / 3.0) * d2) * e, 1.0)
            gp = jnp.where(safe, -(5.0 / 6.0) * (1.0 + c) * e, 0.0)
        return g, gp

    def lp_and_grads(self, params, y, noise):
        X, p, eye = self.X, self.p, self.eye
        kp = params["kernel"]
        base_p = kp["base"] if self.scaled else kp
        raw_ls = base_p["raw_lengthscale"]              # (nls,)
        ls = jax.nn.softplus(raw_ls)
        inv_ls2 = 1.0 / (ls * ls)
        d2 = jnp.tensordot(inv_ls2, self.D2, axes=([0], [0]))  # (p, p)
        g, gp = self._g_and_gprime(d2)
        if self.scaled:
            s = jax.nn.softplus(kp["raw_outputscale"])
            Km = s * g
        else:
            Km = g
        Kn = Km + eye * noise                           # scalar or diag vec
        mu = self.mean_spec(params["mean"], X)
        resid = y - mu
        # Pallas batched inverse on TPU (one kernel for the whole mode
        # batch via the custom_vmap rule): 9.7 µs vs 107 µs for the XLA
        # cholesky+cho_solve at the (14, 41, 41) bench shape — see
        # linalg/chol_pallas.py for the measured variant log.  CPU/f64
        # callers keep the cho_solve path bit-identical.  The oracle
        # needs K⁻¹ either way (the ∂lp/∂K trace terms below).
        lp, alpha, Kinv = _lp_alpha_kinv(Kn, resid, need_kinv=True)
        M = jnp.outer(alpha, alpha) - Kinv              # ∂lp/∂K = ½M

        sgp = (s * gp) if self.scaled else gp
        t = jnp.tensordot(self.D2, M * sgp, axes=([1, 2], [0, 1]))  # (nls,)
        grad_ls = 0.5 * t * (-2.0 * inv_ls2 / ls) * jax.nn.sigmoid(raw_ls)
        kgrad = {"raw_lengthscale": grad_ls}
        if self.scaled:
            kgrad = {"raw_outputscale":
                     0.5 * jnp.sum(M * g)
                     * jax.nn.sigmoid(kp["raw_outputscale"]),
                     "base": kgrad}

        if self.mean_kind == "ZeroMean":
            mgrad = {}
        elif self.mean_kind == "ConstantMean":
            mgrad = {"constant": jnp.sum(alpha)}
        else:                                           # LinearMean
            mgrad = {"weights": jnp.matmul(
                X.T, alpha, precision=jax.lax.Precision.HIGHEST)}
            if self.has_bias:
                mgrad["bias"] = jnp.sum(alpha)
        return lp, {"mean": mgrad, "kernel": kgrad}, jnp.trace(M)


def make_multitask_value_and_grad(mean_spec, kernel_spec,
                                  likelihood_spec, X: jax.Array,
                                  Y: jax.Array, added_loss_fn=None
                                  ) -> Optional[Callable]:
    """Closed-form (loss, gradient) oracle for the multitask −MLL
    (:func:`make_multitask_loss` without an added-loss term): per-task
    ``∂lp/∂θ`` from :class:`_ClosedFormCore`, plus the shared
    global + per-task noise chain  ``noise_t = softplus(raw) + 1e-4 +
    softplus(raw_task_t)`` → ``∂(Σlp)/∂raw = ½ Σ_t tr(M_t) σ(raw)``,
    ``∂/∂raw_task_t = ½ tr(M_t) σ(raw_task_t)``.  Returns ``None`` for
    unsupported specs or when ``added_loss_fn`` is given (the PIGPR path
    differentiates through an arbitrary user callback — autodiff only).

    Honest measurement (400 iters, p=41, r=14 tasks): 648 vs 1132 µs/iter
    on CPU fp32 (where the conformance suite trains); 290 vs 297 µs/iter on
    tunneled TPU v5e — the multitask joint's per-iter time there is not
    dominated by the pullback the oracle removes.  Kept: strictly neutral-
    to-faster, and trajectory-identical (pinned in tests)."""
    if added_loss_fn is not None:
        return None
    if not isinstance(likelihood_spec, MultitaskGaussianLikelihood):
        return None
    core = _ClosedFormCore.build(mean_spec, kernel_spec, X)
    if core is None:
        return None
    p, r = X.shape[0], Y.shape[1]

    def joint(params):
        with jax.default_matmul_precision("highest"):
            noises = likelihood_spec.noise(params["likelihood"])  # (r,)
            lps, lp_grads, trMs = jax.vmap(
                lambda tp, y, nz: core.lp_and_grads(tp, y, nz)
            )(params["tasks"], Y.T, noises)
            coeff = -1.0 / (p * r)
            task_grads = jax.tree_util.tree_map(
                lambda g: coeff * g, lp_grads)
            lik = params["likelihood"]
            lgrad = {"raw_noise":
                     coeff * 0.5 * jnp.sum(trMs)
                     * jax.nn.sigmoid(lik["raw_noise"]),
                     "raw_task_noises":
                     coeff * 0.5 * trMs
                     * jax.nn.sigmoid(lik["raw_task_noises"])}
            loss = -jnp.sum(lps) / (p * r)
            return loss[None], {"tasks": task_grads, "likelihood": lgrad}

    return joint


def make_multitask_loss(mean_spec, kernel_spec,
                        likelihood_spec: MultitaskGaussianLikelihood,
                        X: jax.Array, Y: jax.Array,
                        added_loss_fn=None) -> Callable:
    """−MLL for a batch-independent multitask GP (reference C17): per-task
    mean/kernel params (stacked), one multitask likelihood (global + task
    noises).  Joint log-prob divided by p·r (event count).  Returns a
    (1,)-shaped loss for the shared trainer.

    ``added_loss_fn(params) -> scalar`` implements gpytorch's added-loss-term
    hook (added to the log-prob *before* normalization, as in
    ``mlls/exact_marginal_log_likelihood.py`` semantics) — the PIGPR path.
    """
    p, r = X.shape[0], Y.shape[1]

    def joint(params):
        noises = likelihood_spec.noise(params["likelihood"])  # (r,)

        def task_lp(task_params, y, noise):
            return gp_log_prob(mean_spec, kernel_spec, task_params, noise,
                               X, y)

        lp = jnp.sum(jax.vmap(task_lp)(params["tasks"], Y.T, noises))
        if added_loss_fn is not None:
            lp = lp + added_loss_fn(params)
        return -(lp) / (p * r)

    def batched(params):
        return joint(params)[None]

    return batched
