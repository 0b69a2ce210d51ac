"""Differential validation of the GP training dynamics against an
independent torch implementation.

gpytorch is not installed, but torch (CPU) is — so we re-state the exact
model the reference trains (Matern-2.5 kernel and constant mean with
softplus-constrained raw parameters, Gaussian likelihood with
softplus(raw)+1e-4 noise, −MLL/n loss, torch.optim.Adam(lr)) directly in
torch, run both trainers from identical initialization for a fixed number of
full-batch steps, and require the trajectories to coincide.

This pins down the semantics the reference gets from gpytorch+torch: same
loss surface, same optimizer update math.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from openmeasure_tpu.gp import kernels as K
from openmeasure_tpu.gp import exact_gp as E

# torch training differentials (trajectory-exact loops) are slow-lane
pytestmark = pytest.mark.slow


def torch_train(X, y, n_steps, lr=0.1):
    """Independent torch exact-GP trainer matching the reference model."""
    X = torch.tensor(X, dtype=torch.float64)
    y = torch.tensor(y, dtype=torch.float64)
    n = X.shape[0]

    raw_ls = torch.zeros(1, dtype=torch.float64, requires_grad=True)
    raw_noise = torch.zeros((), dtype=torch.float64, requires_grad=True)
    constant = torch.zeros((), dtype=torch.float64, requires_grad=True)

    opt = torch.optim.Adam([raw_ls, raw_noise, constant], lr=lr)
    losses = []
    for _ in range(n_steps):
        opt.zero_grad()
        ls = torch.nn.functional.softplus(raw_ls)
        noise = torch.nn.functional.softplus(raw_noise) + 1e-4
        diff = (X[:, None, :] - X[None, :, :]) / ls
        d2 = (diff * diff).sum(-1)
        # diagonal-safe sqrt (same guard as the JAX kernel)
        eps = torch.finfo(torch.float64).eps ** 2
        safe = d2 > eps
        r = torch.sqrt(torch.where(safe, d2, torch.ones_like(d2)))
        c = np.sqrt(5.0) * r
        k = (1 + c + 5.0 / 3.0 * d2) * torch.exp(-c)
        Kmat = torch.where(safe, k, torch.ones_like(k)) \
            + (noise + 1e-8) * torch.eye(n, dtype=torch.float64)
        L = torch.linalg.cholesky(Kmat)
        resid = y - constant
        alpha = torch.cholesky_solve(resid[:, None], L)[:, 0]
        logprob = (-0.5 * resid @ alpha
                   - torch.log(torch.diagonal(L)).sum()
                   - 0.5 * n * np.log(2 * np.pi))
        loss = -logprob / n
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return {
        "losses": np.array(losses),
        "lengthscale": float(torch.nn.functional.softplus(raw_ls).detach()),
        "noise": float((torch.nn.functional.softplus(raw_noise) + 1e-4).detach()),
        "constant": float(constant.detach()),
    }


class TestTorchDiff:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_training_trajectory_matches_torch(self, seed):
        rng = np.random.default_rng(seed)
        X = rng.standard_normal((25, 2))
        y = np.sin(1.5 * X[:, 0]) + 0.3 * X[:, 1] \
            + 0.05 * rng.standard_normal(25)
        n_steps = 120

        ref = torch_train(X, y, n_steps)

        mean, kern, lik = K.ConstantMean(), K.MaternKernel(2.5), \
            K.GaussianLikelihood()
        task0 = {"mean": mean.init_params(2), "kernel": kern.init_params(2),
                 "likelihood": lik.init_params()}
        import jax
        params0 = jax.tree_util.tree_map(lambda x: x[None], task0)
        loss_fn = E.make_single_task_loss(mean, kern, lik,
                                          jnp.asarray(X),
                                          jnp.asarray(y)[None, :])
        # rel_error=0 disables early stop so both run exactly n_steps
        res = E.adam_early_stop(loss_fn, params0, lr=0.1, max_iter=n_steps,
                                rel_error=0.0)

        ours_loss = float(res.loss[0])
        np.testing.assert_allclose(ours_loss, ref["losses"][-1], rtol=1e-6)

        ls = float(kern.lengthscale(
            jax.tree_util.tree_map(lambda x: x[0], res.params)["kernel"])[0])
        nz = float(lik.noise(
            jax.tree_util.tree_map(lambda x: x[0],
                                   res.params)["likelihood"]))
        cst = float(jax.tree_util.tree_map(
            lambda x: x[0], res.params)["mean"]["constant"])
        np.testing.assert_allclose(ls, ref["lengthscale"], rtol=1e-5)
        np.testing.assert_allclose(nz, ref["noise"], rtol=1e-5)
        np.testing.assert_allclose(cst, ref["constant"], atol=1e-5)


def torch_train_multitask(X, Y, n_steps, lr=0.1):
    """Independent torch multitask trainer: r per-task Matern-2.5+constant
    models, ONE likelihood with global + per-task softplus noises, joint
    loss −Σ_t lp_t / (p·r) — the reference's batch-independent multitask
    semantics (gpr.py:65-106, 466-483)."""
    p, r = X.shape[0], Y.shape[1]
    X = torch.tensor(X, dtype=torch.float64)
    Y = torch.tensor(Y, dtype=torch.float64)

    raw_ls = torch.zeros((r, 1), dtype=torch.float64, requires_grad=True)
    constant = torch.zeros(r, dtype=torch.float64, requires_grad=True)
    raw_noise = torch.zeros((), dtype=torch.float64, requires_grad=True)
    raw_task = torch.zeros(r, dtype=torch.float64, requires_grad=True)

    opt = torch.optim.Adam([raw_ls, constant, raw_noise, raw_task], lr=lr)
    sp = torch.nn.functional.softplus
    eye = torch.eye(p, dtype=torch.float64)
    eps = torch.finfo(torch.float64).eps ** 2
    loss_val = None
    for _ in range(n_steps):
        opt.zero_grad()
        noises = sp(raw_noise) + 1e-4 + sp(raw_task)          # (r,)
        lp_sum = 0.0
        for t in range(r):
            ls = sp(raw_ls[t])
            diff = (X[:, None, :] - X[None, :, :]) / ls
            d2 = (diff * diff).sum(-1)
            safe = d2 > eps
            rr = torch.sqrt(torch.where(safe, d2, torch.ones_like(d2)))
            c = np.sqrt(5.0) * rr
            k = (1 + c + 5.0 / 3.0 * d2) * torch.exp(-c)
            Kmat = torch.where(safe, k, torch.ones_like(k)) \
                + (noises[t] + 1e-8) * eye
            L = torch.linalg.cholesky(Kmat)
            resid = Y[:, t] - constant[t]
            alpha = torch.cholesky_solve(resid[:, None], L)[:, 0]
            lp_sum = lp_sum + (-0.5 * resid @ alpha
                               - torch.log(torch.diagonal(L)).sum()
                               - 0.5 * p * np.log(2 * np.pi))
        loss = -lp_sum / (p * r)
        loss.backward()
        opt.step()
        loss_val = float(loss.detach())
    sp_ = torch.nn.functional.softplus
    return {
        "loss": loss_val,
        "lengthscales": sp_(raw_ls).detach().numpy()[:, 0],
        "noises": (sp_(raw_noise) + 1e-4 + sp_(raw_task)).detach().numpy(),
        "constants": constant.detach().numpy(),
    }


class TestTorchDiffMultitask:
    def test_multitask_trajectory_matches_torch(self):
        import jax
        rng = np.random.default_rng(5)
        p, d, r = 20, 2, 3
        X = rng.standard_normal((p, d))
        Y = np.stack([np.sin(1.5 * X[:, 0]) + 0.2 * t * X[:, 1]
                      + 0.05 * rng.standard_normal(p)
                      for t in range(r)], axis=1)
        n_steps = 80

        ref = torch_train_multitask(X, Y, n_steps)

        mean, kern = K.ConstantMean(), K.MaternKernel(2.5)
        lik = K.MultitaskGaussianLikelihood(num_tasks=r)
        task = {"mean": mean.init_params(d), "kernel": kern.init_params(d)}
        params0 = {
            "tasks": jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (r,) + x.shape), task),
            "likelihood": lik.init_params(),
        }
        params0_b = jax.tree_util.tree_map(lambda x: x[None], params0)
        loss_raw = E.make_multitask_loss(mean, kern, lik, jnp.asarray(X),
                                         jnp.asarray(Y))

        def loss_fn(pb):
            return loss_raw(jax.tree_util.tree_map(lambda x: x[0], pb))

        vag_raw = E.make_multitask_value_and_grad(mean, kern, lik,
                                                  jnp.asarray(X),
                                                  jnp.asarray(Y))

        def vag(pb):
            losses, grads = vag_raw(
                jax.tree_util.tree_map(lambda x: x[0], pb))
            return losses, jax.tree_util.tree_map(lambda g: g[None], grads)

        res = E.adam_early_stop(loss_fn, params0_b, lr=0.1,
                                max_iter=n_steps, rel_error=0.0,
                                value_and_grad=vag)
        final = jax.tree_util.tree_map(lambda x: x[0], res.params)
        np.testing.assert_allclose(float(res.loss[0]), ref["loss"],
                                   rtol=1e-6)
        ls = np.asarray(
            K.MaternKernel(2.5).lengthscale(final["tasks"]["kernel"]))[:, 0]
        np.testing.assert_allclose(ls, ref["lengthscales"], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(lik.noise(final["likelihood"])),
                                   ref["noises"], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(final["tasks"]["mean"]["constant"]),
            ref["constants"], atol=1e-5)


def torch_train_early_stop(X, y, max_iter, rel_error, lr=0.1):
    """Reference loop semantics verbatim (gpr.py:225-251): check |Δloss|
    BEFORE each iteration, always apply optimizer.step() — so the step of
    the detection iteration lands in the final parameters, and that
    iteration is counted."""
    X = torch.tensor(X, dtype=torch.float64)
    y = torch.tensor(y, dtype=torch.float64)
    n = X.shape[0]
    raw_ls = torch.zeros(1, dtype=torch.float64, requires_grad=True)
    raw_noise = torch.zeros((), dtype=torch.float64, requires_grad=True)
    constant = torch.zeros((), dtype=torch.float64, requires_grad=True)
    opt = torch.optim.Adam([raw_ls, raw_noise, constant], lr=lr)
    eps = torch.finfo(torch.float64).eps ** 2
    loss_old, e, j = 1e10, 1e10, 0
    while (e > rel_error) and (j < max_iter):
        opt.zero_grad()
        ls = torch.nn.functional.softplus(raw_ls)
        noise = torch.nn.functional.softplus(raw_noise) + 1e-4
        diff = (X[:, None, :] - X[None, :, :]) / ls
        d2 = (diff * diff).sum(-1)
        safe = d2 > eps
        r = torch.sqrt(torch.where(safe, d2, torch.ones_like(d2)))
        c = np.sqrt(5.0) * r
        k = (1 + c + 5.0 / 3.0 * d2) * torch.exp(-c)
        Kmat = torch.where(safe, k, torch.ones_like(k)) \
            + (noise + 1e-8) * torch.eye(n, dtype=torch.float64)
        L = torch.linalg.cholesky(Kmat)
        resid = y - constant
        alpha = torch.cholesky_solve(resid[:, None], L)[:, 0]
        loss = -(-0.5 * resid @ alpha
                 - torch.log(torch.diagonal(L)).sum()
                 - 0.5 * n * np.log(2 * np.pi)) / n
        loss.backward()
        e = abs(float(loss.detach()) - (loss_old if j else 1e10))
        loss_old = float(loss.detach())
        opt.step()
        j += 1
    return {
        "iters": j,
        "loss": loss_old,
        "lengthscale": float(torch.nn.functional.softplus(raw_ls).detach()),
        "noise": float((torch.nn.functional.softplus(raw_noise)
                        + 1e-4).detach()),
        "constant": float(constant.detach()),
    }


class TestTorchDiffEarlyStop:
    @pytest.mark.parametrize("rel_error", [1e-4, 1e-5])
    def test_early_stop_semantics_match_reference_loop(self, rel_error):
        """With rel_error > 0 the trainer must stop at the SAME iteration as
        the reference loop AND carry the detection iteration's Adam step in
        the final hyperparameters (a freeze one step early is a systematic
        one-Adam-step parity error the rel_error=0 tests cannot see)."""
        import jax
        rng = np.random.default_rng(3)
        X = rng.standard_normal((25, 2))
        y = np.sin(1.5 * X[:, 0]) + 0.3 * X[:, 1] \
            + 0.05 * rng.standard_normal(25)
        max_iter = 500

        ref = torch_train_early_stop(X, y, max_iter, rel_error)
        assert 0 < ref["iters"] < max_iter   # early stop actually fires

        mean, kern, lik = K.ConstantMean(), K.MaternKernel(2.5), \
            K.GaussianLikelihood()
        task0 = {"mean": mean.init_params(2), "kernel": kern.init_params(2),
                 "likelihood": lik.init_params()}
        import jax as _jax
        params0 = _jax.tree_util.tree_map(lambda x: x[None], task0)
        loss_fn = E.make_single_task_loss(mean, kern, lik, jnp.asarray(X),
                                          jnp.asarray(y)[None, :])
        res = E.adam_early_stop(loss_fn, params0, lr=0.1, max_iter=max_iter,
                                rel_error=rel_error)
        final = _jax.tree_util.tree_map(lambda x: x[0], res.params)
        assert int(res.iterations[0]) == ref["iters"]
        np.testing.assert_allclose(float(res.loss[0]), ref["loss"],
                                   rtol=1e-6)
        np.testing.assert_allclose(
            float(kern.lengthscale(final["kernel"])[0]),
            ref["lengthscale"], rtol=1e-6)
        np.testing.assert_allclose(float(lik.noise(final["likelihood"])),
                                   ref["noise"], rtol=1e-6)
        np.testing.assert_allclose(float(final["mean"]["constant"]),
                                   ref["constant"], atol=1e-7)


def torch_train_pigpr(X, Y, X_tot, n_steps, added_kind, lr=0.1):
    """Independent torch implementation of the reference PIGPR added-loss
    multitask loop (gpr.py:848-889): each iteration computes the EVAL-mode
    (noise-inclusive, conditioned-on-train) posterior at [train + constraint]
    points from the CURRENT parameters with gradients flowing through it
    (the eval/train mode flips at gpr.py:862-868), a DETACHED train-mode
    joint log-prob ``loss_ml`` (gpr.py:870), feeds both to the added-loss
    term, and minimizes −(Σ_t lp_t + added)/(p·r) with Adam."""
    p, r = X.shape[0], Y.shape[1]
    X = torch.tensor(X, dtype=torch.float64)
    Y = torch.tensor(Y, dtype=torch.float64)
    Xt = torch.tensor(X_tot, dtype=torch.float64)
    s = Xt.shape[0]

    raw_ls = torch.zeros((r, 1), dtype=torch.float64, requires_grad=True)
    constant = torch.zeros(r, dtype=torch.float64, requires_grad=True)
    raw_noise = torch.zeros((), dtype=torch.float64, requires_grad=True)
    raw_task = torch.zeros(r, dtype=torch.float64, requires_grad=True)

    opt = torch.optim.Adam([raw_ls, constant, raw_noise, raw_task], lr=lr)
    sp = torch.nn.functional.softplus
    eye = torch.eye(p, dtype=torch.float64)
    eps = torch.finfo(torch.float64).eps ** 2

    def matern(A, B, ls):
        diff = (A[:, None, :] - B[None, :, :]) / ls
        d2 = (diff * diff).sum(-1)
        safe = d2 > eps
        rr = torch.sqrt(torch.where(safe, d2, torch.ones_like(d2)))
        c = np.sqrt(5.0) * rr
        k = (1 + c + 5.0 / 3.0 * d2) * torch.exp(-c)
        return torch.where(safe, k, torch.ones_like(k))

    losses = []
    for _ in range(n_steps):
        opt.zero_grad()
        noises = sp(raw_noise) + 1e-4 + sp(raw_task)          # (r,)
        lp_sum = 0.0
        means, stds = [], []
        for t in range(r):
            ls = sp(raw_ls[t])
            Kmat = matern(X, X, ls) + (noises[t] + 1e-8) * eye
            L = torch.linalg.cholesky(Kmat)
            resid = Y[:, t] - constant[t]
            alpha = torch.cholesky_solve(resid[:, None], L)[:, 0]
            lp_sum = lp_sum + (-0.5 * resid @ alpha
                               - torch.log(torch.diagonal(L)).sum()
                               - 0.5 * p * np.log(2 * np.pi))
            # eval-mode predictive at X_tot under CURRENT params (NOT
            # detached: added-loss gradients flow through the posterior)
            Ks = matern(Xt, X, ls)                             # (s, p)
            kss = torch.diagonal(matern(Xt, Xt, ls))
            mean_t = constant[t] + Ks @ alpha
            v = torch.linalg.solve_triangular(L, Ks.T, upper=False)
            var_t = torch.clamp(kss - (v * v).sum(0), min=0.0) + noises[t]
            means.append(mean_t)
            stds.append(torch.sqrt(var_t))
        mean = torch.stack(means, dim=1)                       # (s, r)
        std = torch.stack(stds, dim=1)
        loss_ml = lp_sum.detach()
        if added_kind == "positivity":
            added = -2.0 * (sp(-mean) ** 2).sum()
        else:  # "calibrated": detached loss_ml scales a stddev term
            added = -0.1 * loss_ml.abs() * std.mean()
        loss = -(lp_sum + added) / (p * r)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    sp_ = torch.nn.functional.softplus
    return {
        "losses": np.array(losses),
        "lengthscales": sp_(raw_ls).detach().numpy()[:, 0],
        "noises": (sp_(raw_noise) + 1e-4 + sp_(raw_task)).detach().numpy(),
        "constants": constant.detach().numpy(),
    }


class TestTorchDiffPIGPR:
    """Trajectory differential for the PIGPR added-loss loop (VERDICT r2
    item 4) — the reference's most intricate component (gpr.py:677-889):
    per-iteration eval/train mode flips, a constraint-point posterior the
    added loss differentiates through, and a detached loss_ml."""

    def _make_pigpr(self, added_loss, seed=7):
        import jax
        from openmeasure_tpu import PIGPR
        rng = np.random.default_rng(seed)
        n_points, n_features, m, d = 30, 2, 20, 2
        xyz = np.zeros((n_points, 3))
        xyz[:, 0] = np.linspace(0, 1, n_points)
        P = rng.random((m, d)) * 2.0
        X = np.zeros((n_points * n_features, m))
        for j in range(m):
            base = np.sin(2 * np.pi * xyz[:, 0] * (1 + P[j, 0])) \
                + P[j, 1] * xyz[:, 0]
            X[:, j] = np.concatenate([base + 1.5, 0.5 * base ** 2])
        P_cstr = rng.random((6, d)) * 2.0
        pig = PIGPR(X, n_features, xyz, P, P_cstr, added_loss)
        pig.fit(select_modes="number", n_modes=3)
        return pig

    @pytest.mark.parametrize("kind,n_steps",
                             [("positivity", 60), ("positivity", 30),
                              ("calibrated", 60)])
    def test_pigpr_trajectory_matches_torch(self, kind, n_steps):
        import jax
        import jax.nn as jnn

        if kind == "positivity":
            def added_loss(ctx):
                return -2.0 * jnp.sum(jnn.softplus(-ctx["output"].mean) ** 2)
        else:
            def added_loss(ctx):
                return -0.1 * jnp.abs(ctx["loss_ml"]) \
                    * jnp.mean(ctx["output"].stddev)

        pig = self._make_pigpr(added_loss)
        # rel_error=0 disables early stop so both run exactly n_steps
        pig.train(max_iter=n_steps, rel_error=0.0)

        P0 = np.asarray(pig.P0)
        Vr = np.asarray(pig.Vr)
        P0_tot = np.asarray(pig.P0_tot)
        r = Vr.shape[1]
        ref = torch_train_pigpr(P0, Vr, P0_tot, n_steps, kind)

        np.testing.assert_allclose(float(pig._final_loss[0]),
                                   ref["losses"][-1], rtol=1e-6)
        ls = np.asarray(
            K.MaternKernel(2.5).lengthscale(pig.params["tasks"]["kernel"])
        )[:, 0]
        np.testing.assert_allclose(ls, ref["lengthscales"], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pig.likelihood.noise(pig.params["likelihood"])),
            ref["noises"], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pig.params["tasks"]["mean"]["constant"]),
            ref["constants"], atol=1e-5)
        assert r == 3
