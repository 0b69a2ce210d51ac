"""Greedy entropy maximization (GEM) sensor placement.

Re-implementation of ``SPR.gem`` (``sparse_sensing.py:586-698``) with the
per-candidate Python loop (``:670-678``) replaced by one batched einsum over
all surviving candidates per step — the conditional variance
``σ²_y − Σ_yA Σ_AA⁻¹ Σ_Ay`` for every candidate is a single (n, s) matmul.

Determinism: the reference adds *random* 1e-5 Gaussian noise to Σ_AA before
inverting (``sparse_sensing.py:667``), making placements nondeterministic.
We use a deterministic 1e-5 diagonal jitter, which serves the same
conditioning purpose (flagged in SURVEY §4 as a quirk not to replicate).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp


def gem_select(
    Ur,
    xyz_tiled,
    n_sensors: int,
    mask=None,
    d_min: float = 0.0,
    verbose: bool = False,
) -> np.ndarray:
    """Select sensor rows of Ur by greedy conditional-entropy maximization.

    Parameters
    ----------
    Ur : (n, r) truncated basis.
    xyz_tiled : (n, 3) positions, feature-tiled to match Ur rows.
    mask : optional (n,) bool — restrict the search region.
    d_min : minimum inter-sensor distance.

    Returns global row indices, shape (n_sensors,).
    """
    Ur = jnp.asarray(Ur)
    n = Ur.shape[0]
    if mask is None:
        mask_np = np.ones((n,), dtype=bool)
    else:
        mask_np = np.asarray(mask, dtype=bool)

    # Scale so the covariance determinant stays > 1 (reference :622-625).
    r = Ur.shape[1]
    var_masked = jnp.var(Ur[jnp.asarray(mask_np)], ddof=1, axis=1)
    coef = 2.0 / jnp.sqrt(jnp.max(var_masked))
    Ur_scl = Ur * coef

    xyz = jnp.asarray(xyz_tiled)

    # `alive` tracks candidates still eligible (region mask ∧ distance masks).
    alive = jnp.asarray(mask_np)
    sigma_coef = jnp.var(Ur_scl, ddof=1, axis=1)

    neg_inf = -jnp.inf
    selected: list[int] = []
    H_tot = 0.0

    # Row-centered copies used by the covariance formulas (np.cov centers
    # each row by its own mean, ddof=1 over the r mode-columns).
    row_mean = jnp.mean(Ur_scl, axis=1, keepdims=True)
    Uc = Ur_scl - row_mean  # (n, r)
    sigma2y_all = jnp.sum(Uc * Uc, axis=1) / (r - 1)

    if verbose:
        header = ["# sensors", "sigma^2 y", "sigma^2 y|a", "Htot"]
        print(f"{'-'*70} \n {header[0]:^10} {header[1]:^10} "
              f"{header[2]:^10} {header[3]:^10} \n ")

    for s in range(n_sensors):
        if s == 0:
            scores = jnp.where(alive, sigma_coef, neg_inf)
            i_sensor = int(jnp.argmax(scores))
            if verbose:
                print(f"{s+1:^10} {float(sigma_coef[i_sensor]):^10.2e} "
                      f"{'  -':^10} {'  -':^10}")
        else:
            sel = jnp.asarray(selected)
            Cs = Uc[sel]                       # (s, r) centered selected rows
            Sigma_aa = (Cs @ Cs.T) / (r - 1)   # (s, s)
            if s == 1:
                Sigma_aa_inv = 1.0 / Sigma_aa
            else:
                jitter = 1e-5 * jnp.eye(s, dtype=Ur.dtype)
                Sigma_aa_inv = jnp.linalg.inv(Sigma_aa + jitter)

            Sigma_ya = (Uc @ Cs.T) / (r - 1)   # (n, s) — all candidates at once
            cond_var = sigma2y_all - jnp.einsum(
                "ns,st,nt->n", Sigma_ya, Sigma_aa_inv, Sigma_ya)

            scores = jnp.where(alive, cond_var, neg_inf)
            i_sensor = int(jnp.argmax(scores))
            H_tot += 0.5 * float(jnp.log(scores[i_sensor])) \
                + 0.5 * (np.log(2 * np.pi) + 1)
            if verbose:
                print(f"{s+1:^10} {float(sigma_coef[i_sensor]):^10.2e} "
                      f"{float(scores[i_sensor]):^10.2e} {H_tot:^10.2e}")

        selected.append(i_sensor)
        d = jnp.linalg.norm(xyz - xyz[i_sensor][None, :], axis=1)
        alive = alive & (d >= d_min)

    return np.asarray(selected, dtype=np.int64)
