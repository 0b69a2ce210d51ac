"""Vector-measurement sensor selection (beyond-reference capability).

A physical probe at spatial point j measures ALL ``n_features`` quantities
at that point at once — p = n_features rows of the snapshot matrix (rows
``f * n_points + j`` for f = 0..p-1).  The reference has no placement for
such sensors: its QRCP/GEM pick scalar rows independently
(``sparse_sensing.py:700-756``), so one physical location's features can be
scattered across many points.  This module implements the vector-measurement
greedy algorithm of Saito et al., "Data-driven vector-measurement-sensor
selection based on greedy algorithm" (arXiv:1906.00778 — see PAPERS.md):
greedy D-optimal selection of *locations*, where each selection appends the
whole p-row feature block U_j ∈ R^{p×r} to Θ = C Ur.

Formulation (TPU-native, one jitted fixed-shape program): instead of the
paper's two-phase det(ΘΘᵀ)/det(ΘᵀΘ) split — whose hand-off step is ill
posed when p does not divide r (the straddling block makes both Grams
singular) — we run the single-phase *regularized* (Bayesian) D-optimal
greedy, scoring every candidate block by

    score_j = logdet(I_p + U_j (ΘᵀΘ + δI)⁻¹ U_jᵀ),

selecting the argmax.  As δ → 0 this reproduces the paper's behavior in
both regimes — while s·p < r, (ΘᵀΘ+δI)⁻¹ ≈ P_⊥/δ on the unexplored
subspace, so score_j is dominated by the residual-volume term
det(B_j B_jᵀ)/δ^p (phase-1 objective), with the already-explained
directions acting as an O(1) tie-break; once s·p ≥ r it is exactly the
det(ΘᵀΘ) increment (phase-2 objective).

Numerical structure (fp32-safe): the selected-block Gram G = ΘᵀΘ is
ACCUMULATED (pure PSD additions), and each step takes a fresh Cholesky
A = δI + G = LLᵀ, forms R_j = U_j L⁻ᵀ with one batched (n_points, p, r)
einsum, and scores chol-logdet(I_p + R_j R_jᵀ) — PSD by construction.
The earlier formulation carried W = A⁻¹ via rank-p Woodbury *downdates*;
at the δ → 0 scales involved (‖W‖ ≈ 1/δ) the fp32 cancellation made W
indefinite within a few steps and the Cholesky went NaN on TPU (the
measured failure: NaN scores at step 3 of the flame-scale decoder
example).  δ is additionally floored at 64·p·eps·max_j‖U_j‖² so that
eigenvalue-rounding in the batched Gram stays a small fraction of the
identity shift (in float64 the floor is ~1e-13 relative and the ``ridge``
knob dominates; in float32 it caps κ(A) at ~s/(64·p·eps), far from
Cholesky breakdown).  Every step is a batched einsum against an (r, r)
triangular inverse plus a batched p×p Cholesky logdet — no data-dependent
shapes, no host round-trips.

The candidate ``mask`` restricts the searchable points WITHOUT zeroing the
basis (deviation from the 'qr'/'dg' contract, where the reference zeroes
masked Ur rows destructively, ``sparse_sensing.py:737-738``): a vector
sensor measures real physical values wherever it is placed, so restricting
the search must not alter the reconstruction basis.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_sensors",))
def _vdg_select_jit(blocks: jax.Array, alive0: jax.Array, ridge: jax.Array,
                    xyz: jax.Array, d_min: jax.Array, n_sensors: int):
    """Greedy regularized-D-optimal selection over per-point blocks.

    blocks: (n_points, p, r); alive0: (n_points,) candidate mask;
    xyz: (n_points, 3) probe coordinates; d_min: minimum inter-probe
    distance (the GEM contract, reference ``sparse_sensing.py:627,697``).
    Returns (points (n_sensors,) int32, step_scores (n_sensors,)).
    """
    n_points, p, r = blocks.shape
    hp = jax.lax.Precision.HIGHEST
    eye_p = jnp.eye(p, dtype=blocks.dtype)
    eye_r = jnp.eye(r, dtype=blocks.dtype)
    G0 = jnp.zeros((r, r), dtype=blocks.dtype)

    def step(i, carry):
        G, alive, points, scores = carry
        # fresh factorization of A = δI + G (G accumulates PSD blocks only —
        # no cancellation; the Woodbury-downdate carry this replaces went
        # indefinite in fp32, see module docstring)
        La = jnp.linalg.cholesky(ridge * eye_r + G)
        Linv = jax.scipy.linalg.solve_triangular(La, eye_r, lower=True)
        # batched score: logdet(I_p + U_j A⁻¹ U_jᵀ) with R_j = U_j L⁻ᵀ,
        # M_j = R_j R_jᵀ — PSD by construction
        T = jnp.einsum("npr,sr->nps", blocks, Linv, precision=hp)
        M = jnp.einsum("nps,nqs->npq", T, T, precision=hp)
        M = 0.5 * (M + jnp.swapaxes(M, 1, 2))        # exact symmetry for chol
        L = jnp.linalg.cholesky(eye_p[None] + M)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=1, axis2=2)), axis=1)
        logdet = jnp.where(alive, logdet, -jnp.inf)
        j = jnp.argmax(logdet)
        G = G + jnp.matmul(blocks[j].T, blocks[j], precision=hp)
        G = 0.5 * (G + G.T)
        alive = alive.at[j].set(False)
        # minimum inter-probe distance: kill every point within d_min of
        # the new probe (selected point included — its distance is 0 only
        # when d_min == 0, and it is already dead above)
        dist = jnp.linalg.norm(xyz - xyz[j][None, :], axis=1)
        alive = alive & (dist >= d_min)
        points = points.at[i].set(j.astype(jnp.int32))
        scores = scores.at[i].set(logdet[j])
        return G, alive, points, scores

    points0 = jnp.zeros((n_sensors,), jnp.int32)
    scores0 = jnp.zeros((n_sensors,), blocks.dtype)
    _, _, points, scores = jax.lax.fori_loop(
        0, n_sensors, step, (G0, alive0, points0, scores0))
    return points, scores


def vector_dg_select(Ur, n_features: int, n_sensors: int, mask=None,
                     ridge: float = 1e-6, xyz=None,
                     d_min: float = 0.0) -> np.ndarray:
    """Select ``n_sensors`` spatial POINTS for vector sensors measuring all
    ``n_features`` features at once.

    Ur is the (n, r) POD basis with feature-blocked rows (row f·n_points+j =
    feature f at point j, the reference's layout, ``sparse_sensing.py:57``).
    ``mask``: boolean candidate restriction, length n_points (per point) or
    length n (per row; a point stays selectable only if ALL its feature rows
    are).  ``ridge`` is the relative Bayesian regularization δ (scaled by
    the mean block energy).  ``xyz`` (n_points, 3) + ``d_min`` enforce a
    minimum inter-probe distance (the GEM placement contract, reference
    ``sparse_sensing.py:627,697``).  Returns (n_sensors,) int64 point
    indices; raises when the mask/d_min exhaust the candidates.
    """
    Ur = jnp.asarray(Ur)
    n, r = Ur.shape
    if n % n_features != 0:
        raise ValueError("Ur rows are not divisible by n_features.")
    n_points = n // n_features
    # (n_points, p, r): block j stacks the p feature rows of point j
    blocks = jnp.swapaxes(Ur.reshape(n_features, n_points, r), 0, 1)

    if mask is not None:
        m = np.asarray(mask, dtype=bool)
        if m.shape[0] == n:
            m = m.reshape(n_features, n_points).all(axis=0)
        elif m.shape[0] != n_points:
            raise ValueError(
                f"mask must have length n_points={n_points} or n={n}.")
        alive = jnp.asarray(m)
    else:
        alive = jnp.ones((n_points,), bool)

    n_avail = int(np.asarray(alive).sum())
    if n_sensors > n_avail:
        raise ValueError(
            f"vector placement ran out of candidates: {n_sensors} sensors "
            f"requested but only {n_avail} points are selectable "
            "(mask/size). Request fewer sensors or enlarge the mask.")
    if d_min > 0.0:
        if xyz is None:
            raise ValueError("d_min > 0 requires xyz (n_points, 3).")
        xyz_j = jnp.asarray(np.asarray(xyz, dtype=np.float32))
        if xyz_j.shape[0] != n_points:
            raise ValueError(
                f"xyz must have n_points={n_points} rows; got "
                f"{xyz_j.shape[0]}.")
    else:
        xyz_j = jnp.zeros((n_points, 3), jnp.float32)

    # δ relative to the data scale: mean per-block energy / p, floored so
    # Gram-rounding noise stays well below the identity shift (fp32 safety;
    # see module docstring)
    block_e = jnp.sum(blocks * blocks, axis=(1, 2))
    energy = float(jnp.mean(block_e)) / n_features
    eps = float(jnp.finfo(blocks.dtype).eps)
    floor = 64.0 * n_features * eps * float(jnp.max(block_e))
    delta = jnp.asarray(max(ridge * energy, floor,
                            np.finfo(np.float32).tiny), blocks.dtype)
    points, scores = _vdg_select_jit(blocks, alive, delta, xyz_j,
                                     jnp.asarray(d_min, jnp.float32),
                                     n_sensors)
    out = np.asarray(points, dtype=np.int64)
    # Exhaustion guard: when mask/d_min kills every candidate mid-run, the
    # masked argmax scans all -inf and falls back to index 0 — which may
    # not duplicate an earlier pick, so the step SCORE (-inf exactly on an
    # exhausted step) is the reliable signal, with the duplicate check kept
    # as a belt-and-suspenders backstop.
    if not np.isfinite(np.asarray(scores)).all() \
            or len(set(out.tolist())) != n_sensors:
        raise ValueError(
            "vector placement ran out of candidates: the mask/d_min "
            "exclusions leave fewer selectable points than sensors "
            "requested.")
    return out


def vector_onehot(points, n_features: int, n_points: int,
                  dtype=np.float32) -> jax.Array:
    """Build the one-hot measurement matrix C (n_sensors·p, n) for vector
    sensors at ``points``.

    Row ordering is sensor-major: row s·p + f measures feature f at
    points[s] (global row f·n_points + points[s]) — so the feature-id
    column of the matching measurement vector y (s,3) is
    :func:`vector_feature_ids`.
    """
    points = np.asarray(points, dtype=np.int64)
    s = points.shape[0]
    rows = (np.arange(n_features)[None, :] * n_points
            + points[:, None]).reshape(-1)           # (s*p,)
    C = np.zeros((s * n_features, n_features * n_points), dtype=dtype)
    C[np.arange(s * n_features), rows] = 1.0
    return jnp.asarray(C)


def vector_feature_ids(n_sensors: int, n_features: int) -> np.ndarray:
    """Feature-id column (s·p,) matching :func:`vector_onehot` row order."""
    return np.tile(np.arange(n_features), n_sensors).astype(np.float64)
