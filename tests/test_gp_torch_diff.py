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
