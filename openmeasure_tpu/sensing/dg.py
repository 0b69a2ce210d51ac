"""Determinant-based greedy (D-optimal) sensor selection.

Capability extension beyond the reference: QRCP placement yields exactly
s = r sensors, and the reference's GEM degenerates once the selected set
exceeds the mode count.  The determinant-based greedy algorithm (Saito et
al., "Determinant-based fast greedy sensor selection algorithm",
arXiv:1911.08757 — see PAPERS.md) maximizes the D-optimality of Θ = C Ur for
ANY sensor budget:

* s ≤ r: greedily maximize det(Θ Θᵀ); the increment for candidate row u is
  its squared residual after projection onto the span of the selected rows —
  identical to greedy column-pivoted QR, so phase 1 reuses the QRCP pivots.
* s > r: greedily maximize det(Θᵀ Θ); the increment is
  1 + uᵀ(ΘᵀΘ)⁻¹u, tracked with Sherman–Morrison rank-1 updates of
  W = (ΘᵀΘ)⁻¹ — one batched (n, r) einsum per step, all on device.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..linalg.qrcp import qrcp_pivots


@functools.partial(jax.jit, static_argnames=("n_extra",))
def _dg_phase2(Ur: jax.Array, selected0: jax.Array, alive0: jax.Array,
               n_extra: int) -> jax.Array:
    """Greedy det(ΘᵀΘ) maximization for sensors beyond the mode count.

    selected0: (r,) int32 pivots from phase 1; alive0: (n,) candidate mask.
    Returns (n_extra,) additional row indices."""
    n, r = Ur.shape
    hp = jax.lax.Precision.HIGHEST
    Theta0 = Ur[selected0]                                # (r, r)
    G = jnp.matmul(Theta0.T, Theta0, precision=hp)
    W = jnp.linalg.inv(G + 1e-12 * jnp.eye(r, dtype=Ur.dtype))

    def step(i, carry):
        W, alive, extra = carry
        UW = jnp.matmul(Ur, W, precision=hp)              # (n, r)
        scores = jnp.sum(UW * Ur, axis=1)                 # uᵀ W u per row
        scores = jnp.where(alive, scores, -jnp.inf)
        j = jnp.argmax(scores)
        u = Ur[j]
        Wu = jnp.matmul(W, u, precision=hp)
        denom = 1.0 + jnp.dot(u, Wu, precision=hp)
        W = W - jnp.outer(Wu, Wu) / denom                 # Sherman–Morrison
        alive = alive.at[j].set(False)
        extra = extra.at[i].set(j.astype(jnp.int32))
        return W, alive, extra

    extra0 = jnp.zeros((n_extra,), jnp.int32)
    _, _, extra = jax.lax.fori_loop(0, n_extra, step, (W, alive0, extra0))
    return extra


def dg_select(Ur, n_sensors: int, mask=None) -> np.ndarray:
    """D-optimal greedy selection of ``n_sensors`` rows of Ur (n, r).

    Supports any budget: the first min(n_sensors, r) sensors coincide with
    QRCP pivots (det(ΘΘᵀ) greedy ≡ residual-norm pivoting); additional
    sensors maximize det(ΘᵀΘ) via Sherman–Morrison.  ``mask`` restricts the
    searchable rows."""
    Ur = jnp.asarray(Ur)
    n, r = Ur.shape
    if mask is not None:
        keep = jnp.asarray(np.asarray(mask, dtype=bool))
        Ur_m = jnp.where(keep[:, None], Ur, 0.0)
    else:
        keep = jnp.ones((n,), bool)
        Ur_m = Ur

    k1 = min(n_sensors, r)
    piv = qrcp_pivots(Ur_m.T, k1)
    if n_sensors <= r:
        out = np.asarray(piv[:n_sensors], dtype=np.int64)
        if len(set(out.tolist())) != n_sensors:
            raise ValueError(
                f"dg placement ran out of candidates: {n_sensors} sensors "
                "requested but the masked basis has fewer independent rows.")
        return out

    alive = keep.at[piv].set(False)
    extra = _dg_phase2(Ur_m, piv, alive, n_sensors - r)
    out = np.asarray(jnp.concatenate([piv, extra]), dtype=np.int64)
    if len(set(out.tolist())) != n_sensors:
        n_avail = int(np.asarray(keep).sum()) + r
        raise ValueError(
            f"dg placement ran out of candidates: {n_sensors} sensors "
            f"requested but only {n_avail} rows are selectable (mask/size). "
            "Request fewer sensors or enlarge the mask.")
    return out
