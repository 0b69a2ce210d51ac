"""Feature-block data scaling.

TPU-native re-implementation of the scaling layer of the reference
soft-sensing library (reference: ``sparse_sensing.py:83-240`` —
``ROM.scale_data`` / ``scale_limits`` / ``unscale_data`` and
``gpr.py:253-335`` — ``GPR.scale_GPR_data``).

The snapshot matrix ``X`` has shape ``(n, m)`` with ``n = n_features *
n_points`` rows laid out in contiguous feature blocks.  The reference loops
over the feature blocks in Python; here every statistic is computed with a
single reshape to ``(n_features, n_points, m)`` and vectorized reductions, so
the whole scaling pass is one fused XLA program that keeps the matrix resident
in HBM.

Scale types (14, matching ``sparse_sensing.py:114-165``): ``std``, ``none``,
``pareto``, ``vast``, ``range``, ``level``, ``max``, ``variance``, ``median``,
``poisson``, ``vast_2``, ``vast_3``, ``vast_4``, ``l2-norm``.

Note on ``vast_2/3/4``: the reference calls ``scipy.stats.kurtosis(x)`` with
the default ``axis=0`` on a 2-D block (``sparse_sensing.py:148``), which only
broadcasts when ``m == n_points`` (latent shape bug).  We compute the Fisher
excess kurtosis over the *flattened* block, which is the behaviour the
parameter-scaling path uses explicitly (``gpr.py:313`` — ``kurtosis(x,
None)``) and the only shape-safe interpretation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

SCALE_TYPES = (
    "std", "none", "pareto", "vast", "range", "level", "max",
    "variance", "median", "poisson", "vast_2", "vast_3", "vast_4",
    "l2-norm",
)


def _excess_kurtosis(x: jax.Array) -> jax.Array:
    """Fisher (excess) kurtosis of the flattened array, biased (like
    ``scipy.stats.kurtosis(x, axis=None)``)."""
    x = x.reshape(-1)
    mu = jnp.mean(x)
    d = x - mu
    m2 = jnp.mean(d * d)
    m4 = jnp.mean((d * d) ** 2)
    return m4 / (m2 * m2) - 3.0


def _block_scale_factor(x: jax.Array, scale_type: str) -> jax.Array:
    """Scalar scale factor for one feature block ``x`` of shape
    ``(n_points, m)``.  Mirrors the per-block branches of
    ``sparse_sensing.py:114-165``."""
    if scale_type == "std":
        return jnp.std(x)
    if scale_type == "none":
        return jnp.asarray(1.0, dtype=x.dtype)
    if scale_type == "pareto":
        return jnp.sqrt(jnp.std(x))
    if scale_type == "vast":
        return jnp.std(x) ** 2 / jnp.mean(x)
    if scale_type == "range":
        return jnp.max(x) - jnp.min(x)
    if scale_type == "level":
        return jnp.mean(x)
    if scale_type == "max":
        return jnp.max(x)
    if scale_type == "variance":
        return jnp.var(x)
    if scale_type == "median":
        return jnp.median(x)
    if scale_type == "poisson":
        return jnp.sqrt(jnp.mean(x))
    if scale_type == "vast_2":
        return jnp.std(x) ** 2 * _excess_kurtosis(x) ** 2 / jnp.mean(x)
    if scale_type == "vast_3":
        return jnp.std(x) ** 2 * _excess_kurtosis(x) ** 2 / jnp.max(x)
    if scale_type == "vast_4":
        return (jnp.std(x) ** 2 * _excess_kurtosis(x) ** 2
                / (jnp.max(x) - jnp.min(x)))
    if scale_type == "l2-norm":
        return jnp.linalg.norm(x.reshape(-1))
    raise NotImplementedError(
        "The scaling method selected has not been implemented yet")


@functools.partial(jax.jit, static_argnames=("n_features", "scale_type",
                                             "axis_cnt"))
def scale_data(
    X: jax.Array,
    n_features: int,
    scale_type: str = "std",
    axis_cnt: Optional[int] = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Center and scale the snapshot matrix.

    Returns ``(X0, X_cnt, X_scl)`` where ``X_cnt`` / ``X_scl`` have shape
    ``(n, 1)`` and ``X0 = (X - X_cnt) / X_scl`` — reference semantics of
    ``ROM.scale_data`` (``sparse_sensing.py:83-171``).

    ``axis_cnt=1`` centers each row by its own mean; ``axis_cnt=None``
    centers every row of a feature block by the block-wide scalar mean.
    """
    if scale_type not in SCALE_TYPES:
        raise NotImplementedError(
            "The scaling method selected has not been implemented yet")
    n, m = X.shape
    n_points = n // n_features
    Xb = X.reshape(n_features, n_points, m)

    if axis_cnt == 1:
        X_cnt = jnp.mean(X, axis=1, keepdims=True)
    elif axis_cnt is None:
        blk_mean = jnp.mean(Xb, axis=(1, 2))  # (n_features,)
        X_cnt = jnp.repeat(blk_mean, n_points)[:, None]
    else:
        raise ValueError("axis_cnt must be 1 or None")

    scl = jax.vmap(lambda b: _block_scale_factor(b, scale_type))(Xb)
    X_scl = jnp.repeat(scl, n_points)[:, None]

    X0 = (X - X_cnt) / X_scl
    return X0, X_cnt, X_scl


@functools.partial(jax.jit, static_argnames=("n_features",))
def scale_limits(
    limits_min: jax.Array,
    limits_max: jax.Array,
    X_cnt: jax.Array,
    X_scl: jax.Array,
    n_features: int,
) -> Tuple[jax.Array, jax.Array]:
    """Map per-feature physical bounds to scaled n-vectors.

    Mirrors ``ROM.scale_limits`` (``sparse_sensing.py:173-210``) including its
    conditioning quirk: if a scaled block exceeds ±1000 anywhere, the whole
    block is replaced by the scalar ∓1000.
    """
    n = X_cnt.shape[0]
    n_points = n // n_features
    cnt_b = X_cnt[:, 0].reshape(n_features, n_points)
    scl_b = X_scl[:, 0].reshape(n_features, n_points)

    def one_limit(limit):
        # limit: (n_features,)
        temp = (limit[:, None] - cnt_b) / scl_b  # (n_features, n_points)
        lo_bad = jnp.min(temp, axis=1, keepdims=True) < -1000.0
        hi_bad = jnp.max(temp, axis=1, keepdims=True) > 1000.0
        temp = jnp.where(lo_bad, -1000.0, jnp.where(hi_bad, 1000.0, temp))
        return temp.reshape(-1)

    return one_limit(jnp.asarray(limits_min)), one_limit(jnp.asarray(limits_max))


@jax.jit
def unscale_data(x0: jax.Array, X_cnt: jax.Array, X_scl: jax.Array) -> jax.Array:
    """``x = X_scl ⊙ x0 + X_cnt`` (``sparse_sensing.py:212-240``).

    ``x0`` may be ``(n,)`` or ``(n, k)`` (column-wise unscaling is fused
    instead of the reference's per-column Python loop).
    """
    scl = X_scl[:, 0]
    cnt = X_cnt[:, 0]
    if x0.ndim == 1:
        return scl * x0 + cnt
    return scl[:, None] * x0 + cnt[:, None]


@functools.partial(jax.jit, static_argnames=("scale_type",))
def scale_parameters(P: jax.Array, scale_type: str = "std"
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-column parameter scaling — ``GPR.scale_GPR_data``
    (``gpr.py:253-335``).  Returns ``(P0, P_cnt, P_scl)`` with the
    reference's full-shape ``(p, d)`` broadcast stats."""
    if scale_type not in SCALE_TYPES:
        raise NotImplementedError(
            "The scaling method selected has not been implemented yet")
    cols = P.T[:, :, None]  # (d, p, 1) — treat each column as a block
    cnt = jnp.mean(cols, axis=(1, 2))
    scl = jax.vmap(lambda b: _block_scale_factor(b, scale_type))(cols)
    P_cnt = jnp.broadcast_to(cnt[None, :], P.shape)
    P_scl = jnp.broadcast_to(scl[None, :], P.shape)
    P0 = (P - P_cnt) / P_scl
    return P0, P_cnt, P_scl
