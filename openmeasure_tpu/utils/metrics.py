"""Error metrics.

The reference computes no error metric anywhere (SURVEY §5) — the BASELINE
reconstruction-quality metric (NRMSE) is defined here, plus the common
companions used by the soft-sensing literature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def rmse(x_pred: jax.Array, x_true: jax.Array) -> jax.Array:
    e = jnp.asarray(x_pred) - jnp.asarray(x_true)
    return jnp.sqrt(jnp.mean(e * e))


@jax.jit
def nrmse(x_pred: jax.Array, x_true: jax.Array) -> jax.Array:
    """RMSE normalized by the range of the true field (the BASELINE metric)."""
    x_true = jnp.asarray(x_true)
    return rmse(x_pred, x_true) / (jnp.max(x_true) - jnp.min(x_true))


@jax.jit
def mae(x_pred: jax.Array, x_true: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(jnp.asarray(x_pred) - jnp.asarray(x_true)))


@jax.jit
def r2(x_pred: jax.Array, x_true: jax.Array) -> jax.Array:
    """Coefficient of determination."""
    x_true = jnp.asarray(x_true)
    ss_res = jnp.sum((x_true - jnp.asarray(x_pred)) ** 2)
    ss_tot = jnp.sum((x_true - jnp.mean(x_true)) ** 2)
    return 1.0 - ss_res / ss_tot


def nrmse_per_feature(x_pred, x_true, n_features: int):
    """Per-feature-block NRMSE, shape (n_features,) — useful for the flame
    dataset where temperature and species live on very different scales."""
    import numpy as np
    x_pred = np.asarray(x_pred)
    x_true = np.asarray(x_true)
    n_points = x_true.shape[0] // n_features
    out = np.zeros(n_features)
    for f in range(n_features):
        blk = slice(f * n_points, (f + 1) * n_points)
        rng = x_true[blk].max() - x_true[blk].min()
        out[f] = np.sqrt(np.mean((x_pred[blk] - x_true[blk]) ** 2)) / rng
    return out
