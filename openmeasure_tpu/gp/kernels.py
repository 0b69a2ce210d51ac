"""GP kernels, means, and likelihoods — JAX-native, gpytorch-compatible
semantics.

The reference delegates GP modelling to gpytorch/libtorch (``gpr.py:24-163``,
defaults at ``gpr.py:466-504``).  Here each kernel/mean/likelihood is a
lightweight *spec* (frozen dataclass, static under jit) plus a parameter
pytree, so the r independent per-mode models of the reference's SingleTask
path train as ONE vmapped program (stacked parameter pytrees) instead of a
serial Python loop (``gpr.py:497-509``).

Positivity constraints follow gpytorch: ``value = softplus(raw) + lower``
with raw parameters initialized to 0 (so lengthscale ≈ 0.6931, noise ≈
0.6932 at init, matching gpytorch's defaults).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def softplus(x):
    return jax.nn.softplus(x)


# --------------------------------------------------------------------- #
# Means
# --------------------------------------------------------------------- #

@dataclasses.dataclass(frozen=True)
class ZeroMean:
    def init_params(self, d: int) -> Dict:
        return {}

    def __call__(self, params: Dict, X: jax.Array) -> jax.Array:
        return jnp.zeros(X.shape[:-1], dtype=X.dtype)


@dataclasses.dataclass(frozen=True)
class ConstantMean:
    """gpytorch.means.ConstantMean — one learned constant, init 0."""

    def init_params(self, d: int) -> Dict:
        return {"constant": jnp.zeros(())}

    def __call__(self, params: Dict, X: jax.Array) -> jax.Array:
        return jnp.broadcast_to(params["constant"], X.shape[:-1])


@dataclasses.dataclass(frozen=True)
class LinearMean:
    """gpytorch.means.LinearMean — w·x + b."""
    bias: bool = True

    def init_params(self, d: int) -> Dict:
        p = {"weights": jnp.zeros((d,))}
        if self.bias:
            p["bias"] = jnp.zeros(())
        return p

    def __call__(self, params: Dict, X: jax.Array) -> jax.Array:
        out = X @ params["weights"]
        if self.bias:
            out = out + params["bias"]
        return out


# --------------------------------------------------------------------- #
# Kernels
# --------------------------------------------------------------------- #

def _scaled_sqdist(X1, X2, lengthscale):
    # Explicit pairwise differences (VPU, full fp32) rather than the
    # norm+matmul identity: on TPU the default matmul precision is bf16,
    # whose ~1e-2 error makes nearby points exactly coincident and the
    # kernel matrix singular.  GP point counts are small, so O(n² d)
    # elementwise work is free.
    x1 = X1 / lengthscale
    x2 = X2 / lengthscale
    diff = x1[:, None, :] - x2[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


@dataclasses.dataclass(frozen=True)
class RBFKernel:
    """k(r) = exp(-r²/2) with r the lengthscale-scaled distance."""
    ard_num_dims: Optional[int] = None

    def init_params(self, d: int) -> Dict:
        nls = self.ard_num_dims or 1
        return {"raw_lengthscale": jnp.zeros((nls,))}

    def lengthscale(self, params):
        return softplus(params["raw_lengthscale"])

    def __call__(self, params: Dict, X1: jax.Array, X2: jax.Array) -> jax.Array:
        d2 = _scaled_sqdist(X1, X2, self.lengthscale(params))
        return jnp.exp(-0.5 * d2)


@dataclasses.dataclass(frozen=True)
class MaternKernel:
    """Matern kernel, nu ∈ {0.5, 1.5, 2.5} (gpytorch.kernels.MaternKernel;
    reference default nu=2.5, ``gpr.py:490``)."""
    nu: float = 2.5
    ard_num_dims: Optional[int] = None

    def __post_init__(self):
        if self.nu not in (0.5, 1.5, 2.5):
            raise ValueError("nu must be one of 0.5, 1.5, 2.5")

    def init_params(self, d: int) -> Dict:
        nls = self.ard_num_dims or 1
        return {"raw_lengthscale": jnp.zeros((nls,))}

    def lengthscale(self, params):
        return softplus(params["raw_lengthscale"])

    def __call__(self, params: Dict, X1: jax.Array, X2: jax.Array) -> jax.Array:
        d2 = _scaled_sqdist(X1, X2, self.lengthscale(params))
        # sqrt has an unbounded derivative at 0: on the diagonal (d2 == 0)
        # autodiff produces inf·0 → NaN gradients, catastrophically in fp32.
        # Guard with a where-branch — k(0) = 1 with zero local gradient,
        # which is the correct limit since d2 is identically 0 there.
        eps = jnp.asarray(jnp.finfo(d2.dtype).eps, d2.dtype) ** 2
        safe = d2 > eps
        r = jnp.sqrt(jnp.where(safe, d2, 1.0))
        if self.nu == 0.5:
            k = jnp.exp(-r)
        elif self.nu == 1.5:
            c = jnp.sqrt(3.0) * r
            k = (1.0 + c) * jnp.exp(-c)
        else:
            c = jnp.sqrt(5.0) * r
            k = (1.0 + c + (5.0 / 3.0) * d2) * jnp.exp(-c)
        return jnp.where(safe, k, 1.0)


@dataclasses.dataclass(frozen=True)
class ScaleKernel:
    """gpytorch.kernels.ScaleKernel — outputscale * base(·,·)."""
    base: object = dataclasses.field(default_factory=MaternKernel)

    def init_params(self, d: int) -> Dict:
        return {"raw_outputscale": jnp.zeros(()),
                "base": self.base.init_params(d)}

    def __call__(self, params: Dict, X1: jax.Array, X2: jax.Array) -> jax.Array:
        return softplus(params["raw_outputscale"]) * self.base(
            params["base"], X1, X2)


@dataclasses.dataclass(frozen=True)
class LinearKernel:
    """gpytorch.kernels.LinearKernel — v * (x1 · x2)."""

    def init_params(self, d: int) -> Dict:
        return {"raw_variance": jnp.zeros(())}

    def __call__(self, params: Dict, X1: jax.Array, X2: jax.Array) -> jax.Array:
        # Gram fidelity needs full fp32 products (kernel matrices go through
        # Cholesky) regardless of the ambient matmul-precision default.
        return softplus(params["raw_variance"]) * jnp.matmul(
            X1, X2.T, precision=jax.lax.Precision.HIGHEST)


# --------------------------------------------------------------------- #
# Likelihoods
# --------------------------------------------------------------------- #

NOISE_LOWER = 1e-4  # gpytorch GreaterThan(1e-4) default constraint


@dataclasses.dataclass(frozen=True)
class GaussianLikelihood:
    """Homoskedastic noise; value = softplus(raw) + 1e-4."""

    def init_params(self) -> Dict:
        return {"raw_noise": jnp.zeros(())}

    def noise(self, params) -> jax.Array:
        return softplus(params["raw_noise"]) + NOISE_LOWER


@dataclasses.dataclass(frozen=True)
class FixedNoiseGaussianLikelihood:
    """gpytorch FixedNoiseGaussianLikelihood — per-point observed noise
    variances, not learned (used by GPR.update retrain, ``gpr.py:671``).
    The noise vector travels in the params pytree but is stop-gradiented."""

    def init_params(self, noise_var: jax.Array) -> Dict:
        return {"fixed_noise": jnp.asarray(noise_var)}

    def noise(self, params) -> jax.Array:
        return jax.lax.stop_gradient(params["fixed_noise"])


@dataclasses.dataclass(frozen=True)
class MultitaskGaussianLikelihood:
    """gpytorch MultitaskGaussianLikelihood(num_tasks=r), rank 0: global
    noise + per-task noises, both softplus(+1e-4 for the global)."""
    num_tasks: int = 1

    def init_params(self) -> Dict:
        return {"raw_noise": jnp.zeros(()),
                "raw_task_noises": jnp.zeros((self.num_tasks,))}

    def noise(self, params) -> jax.Array:
        """Per-task total noise, shape (num_tasks,)."""
        return (softplus(params["raw_noise"]) + NOISE_LOWER
                + softplus(params["raw_task_noises"]))
