"""Tall-skinny SVD for snapshot matrices, TPU-first.

The reference computes a thin LAPACK SVD of the scaled snapshot matrix
(``sparse_sensing.py:272``, ``cokriging.py:62-63``) — an ``(n, m)`` panel with
``n`` up to millions of rows and ``m`` tens of columns.  On TPU the right
decomposition is the Gram route: ``G = X0ᵀ X0`` is a tiny ``(m, m)`` matrix
whose computation is one MXU-bound pass over the HBM-resident panel; its
eigendecomposition is replicated, and the left singular vectors are recovered
with a second panel pass ``U = X0 V Σ⁻¹``.  Total cost ≈ 2 HBM reads of X0 —
bandwidth-bound, no host transfer, and it shards row-wise across a device
mesh with a single ``psum`` of the ``(m, m)`` Gram (see
``openmeasure_tpu.parallel``).

In float32 the Gram squares the condition number, so orthogonal-iteration
refinement passes re-diagonalize the Gram of ``B = X0 V``.  The default
refine depth is backend-aware (measured on the synthetic flame set,
165258×41, cond ≈ 7e4): on TPU one pass already reaches the data's 1e-6
noise floor (XLA's TPU eigh is the high-accuracy QDWH algorithm) and a
second pass costs +0.25 ms for no gain, so ``refine=1``; on CPU fp32
(LAPACK ssyev) one pass leaves a 1.2e-4 reconstruction-NRMSE floor while
two passes reach 8.4e-7 — indistinguishable from an all-fp64 pipeline — so
``refine=2``.

Evaluated and rejected on measurement (TPU v5e, 165k×41 fp32): a Pallas
fused scale+Gram kernel (grid-accumulated per-tile ``X0bᵀX0b``, never
materializing X0) ran ~4× SLOWER than XLA's scale-then-matmul and only
reached bf16-level accuracy — Mosaic schedules the small-output
reduction-shaped matmul poorly, while XLA's HIGH-precision pipeline is
already near the bandwidth floor.  The kernel tier earns its keep only
where on-chip residency changes the algorithm (see qrcp_pallas).

Also evaluated and rejected: a FULLY-truncated refine for the ``rank``
path (HIGHEST first Gram, ``B = X0 V[:, :r]``, one re-diagonalization of
the (r, r) Gram — avoiding every full-width n-row product).  Measured
jitted on v5e: 3D (1.7M×45, r=14) 8.7 vs 9.5 ms but NRMSE 6.2e-6 vs
2.8e-6 (2× worse — the truncated span cannot correct the first Gram's
mode-mixing error, exactly as the full-width refine exists to do), and
no speed change at flagship scale (dispatch-bound).  8% speed is not
worth 2× accuracy; the shipped ``rank`` path narrows only the FINAL
rotation's output, which is top-r-exact.

Also evaluated and rejected (precision downgrades of the width-refine
passes, 3D 1.7M×45 r=14 w=28, v5e, slope-timed; control 9.14 ms /
NRMSE 2.4e-6): ``B = X0 V[:, :w]`` at HIGH instead of HIGHEST — 8.61 ms
but NRMSE 2.1e-4 (the 3-pass product's elementwise error lands directly
in U's columns; nothing downstream can remove out-of-span noise); the
refine Gram ``G2 = BᵀB`` at HIGH — 9.86 ms (SLOWER: the mixed-precision
pair broke XLA's fusion around the refine region) and NRMSE 5.3e-6
(the guard-column gap does not absorb a 3-pass Gram error either).  Both
stay HIGHEST.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def canonical_signs(U, xp=jnp):
    """Per-column canonical sign flips: the largest-|.| entry of each
    column made positive (zero sign → +1).  SINGLE SOURCE for the sign
    convention — the streaming/sharded finalizers share it so the
    exact-parity contracts between paths cannot drift.  ``xp`` is numpy
    for host-side callers."""
    idx = xp.argmax(xp.abs(U), axis=0)
    signs = xp.sign(U[idx, xp.arange(U.shape[1])])
    return xp.where(signs == 0, 1.0, signs).astype(U.dtype)


def _sign_canonicalize(U: jax.Array, Vt: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Deterministic sign convention: the largest-|.| entry of each left
    singular vector is made positive.  LAPACK's sign choice is arbitrary;
    conformance tests compare up to per-mode sign."""
    signs = canonical_signs(U)
    return U * signs[None, :], Vt * signs[:, None]


def default_refine() -> int:
    """Backend-aware refinement depth (see module docstring): 1 on TPU,
    2 elsewhere."""
    return 1 if jax.default_backend() == "tpu" else 2


def floored_norms(colnorm: jax.Array, n: int, dtype) -> jax.Array:
    """The eps·max·√n rank-deficiency norm floor used by every
    normalization in this module (see the in-function comment in
    :func:`svd_tall` for the √n rationale) — exported so callers that
    DEFER normalization (``normalize=False``) fold the identical safe
    norms into their small factors."""
    eps = jnp.finfo(dtype).eps
    tiny = jnp.finfo(dtype).tiny
    return jnp.maximum(
        jnp.maximum(colnorm, eps * float(n) ** 0.5 * jnp.max(colnorm)),
        tiny)


@functools.partial(jax.jit, static_argnames=("refine", "canonicalize",
                                             "rank", "width", "normalize"))
def svd_tall(
    X0: jax.Array, refine: Optional[int] = None, canonicalize: bool = True,
    rank: Optional[int] = None, width: Optional[int] = None,
    normalize: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Thin SVD of a tall matrix via the Gram route.

    Returns ``(U, S, Vt)`` with shapes matching
    ``np.linalg.svd(X0, full_matrices=False)`` for ``n >= m``.

    ``rank=r`` truncates ONLY the final n-row products: the Gram,
    eigendecompositions, and every rotation of ``V`` stay full-width (so the
    top-r accuracy is identical to the untruncated path), but the last
    ``B @ V2`` writes r columns instead of m and the normalization touches
    an (n, r) panel — at 1.7M rows × 45 cols this saves ~3 full-width HBM
    panel passes.  ``S`` still has all m values (from the final Gram's
    eigenvalues, == the column norms to fp round-off), so explained-variance
    truncation works unchanged; ``U`` has r columns.  Requires
    ``canonicalize=False`` (sign canonicalization needs full U).

    ``normalize=False`` (requires ``rank``) returns the UNNORMALIZED
    panel ``B = X0 V_r`` in U's place (``S[:rank]`` still carries the true
    column norms): consumers that only need the column space — or that can
    fold the (r,)-sized ``1/`` :func:`floored_norms` ``(S[:rank])`` into
    their small factors (the fused SPR pipeline's QRCP/solve/reconstruct)
    — skip one full (n, r) elementwise+rewrite pass.

    ``width=w`` (requires ``rank``; r ≤ w ≤ m) additionally narrows the
    REFINE passes to the leading-w subspace: ``B = X0 V[:, :w]`` and the
    re-diagonalization act on an (n, w) panel instead of (n, m).  Unlike the
    measured-and-rejected FULLY-truncated refine (module docstring), the
    w−r guard columns absorb the first Gram's mode-mixing leakage out of
    the top-r span: the leading-r error after one refine is
    O((δ/gap_w)²) with δ the HIGH-precision Gram error and gap_w the
    σ²_r−σ²_w spectral gap, instead of O(δ/gap) for w=r.  Top-r results
    are no longer bit-identical to the full-width path — measured on the
    3D benchmark (1.7M×45, r=14, w=28): NRMSE 2.9e-6 vs 2.8e-6 full /
    6.2e-6 truncated, for 2 × (m−w) fewer HBM column-passes.
    """
    if refine is None:
        refine = default_refine()
    if rank is not None and canonicalize:
        raise ValueError("rank truncation requires canonicalize=False")
    if not normalize and rank is None:
        raise ValueError("normalize=False requires rank truncation")
    if width is not None:
        if rank is None:
            raise ValueError("width requires rank truncation")
        if not rank <= width <= X0.shape[1]:
            raise ValueError("need rank <= width <= m")
        if width == X0.shape[1]:
            width = None
    n, m = X0.shape
    # TPU matmul precision: the first Gram runs at HIGH (3-pass bf16 —
    # ~8e-6 relative error, 1.3x faster than HIGHEST's 6-pass) because the
    # orthogonal-iteration refinement below re-diagonalizes at HIGHEST and
    # sets the final accuracy.  The reduction-shaped Gram (tiny output) is
    # the pipeline's single most expensive matmul, so this matters.
    hp = jax.lax.Precision.HIGHEST
    first = jax.lax.Precision.HIGH if refine > 0 else hp
    G = jnp.matmul(X0.T, X0, precision=first)  # (m, m) — one panel pass
    evals, V = jnp.linalg.eigh(G)  # ascending
    V = V[:, ::-1]
    S2 = evals[::-1]

    if refine == 0 and rank is not None:
        B = jnp.matmul(X0, V[:, :rank], precision=hp)
    elif width is not None and refine > 0:
        B = jnp.matmul(X0, V[:, :width], precision=hp)   # (n, w) panel
    else:
        B = jnp.matmul(X0, V, precision=hp)  # (n, m) — second panel pass
    for i in range(refine):
        # One orthogonal-iteration step: re-diagonalize B's Gram.  Recovers
        # float32 accuracy lost to condition-number squaring.
        G2 = jnp.matmul(B.T, B, precision=hp)
        e2, V2 = jnp.linalg.eigh(G2)
        V2 = V2[:, ::-1]
        if width is not None:
            # refined eigenvalues cover the leading-w subspace only; the
            # tail keeps the first Gram's estimates
            S2 = S2.at[:width].set(e2[::-1])
            V = V.at[:, :width].set(
                jnp.matmul(V[:, :width], V2, precision=hp))
        else:
            S2 = e2[::-1]
            V = jnp.matmul(V, V2, precision=hp)
        if rank is not None and i == refine - 1:
            V2 = V2[:, :rank]                # narrow only the final write
        B = jnp.matmul(B, V2, precision=hp)

    eps = jnp.finfo(X0.dtype).eps
    # Rank-deficiency floor: junk null-space columns must not be divided by
    # their junk tiny norms.  The scale is eps·max·SQRT(n) — the rounding
    # error of an n-entry column norm grows like √n, NOT n: with an n-
    # proportional floor, fp32 at n=1.7M rows gives eps·n ≈ 0.2, flooring
    # every REAL mode with σ_k < 0.2·σ_1 and silently de-normalizing U
    # (measured on the 3D set: modes 5-9 shrunk up to 4×, max|U| error
    # 3.1e-3 vs 2e-10 after the √n fix; reconstruction NRMSE hid it because
    # the gappy solve's pinv(C Ur) cancels column scaling).
    floor_scale = eps * float(n) ** 0.5
    # tiny absolute floor: an ALL-ZERO panel (e.g. a single-snapshot fit,
    # where per-row centering zeroes X0 exactly) must yield U = 0, finite —
    # LAPACK returns finite vectors there; a purely relative floor is 0/0
    tiny = jnp.finfo(X0.dtype).tiny
    if rank is None:
        S = jnp.linalg.norm(B, axis=0)
        safe = jnp.maximum(jnp.maximum(S, floor_scale * jnp.max(S)), tiny)
        U = B / safe[None, :]
    else:
        # Normalize with the TRUE column norms of the truncated panel, not
        # sqrt(eigenvalue): fp32 eigenvalues spread over cond² of X0, so a
        # trailing mode's eigenvalue can be several % off while its column
        # norm is exact to eps — normalizing by the former de-normalizes U
        # (measured: flagship NRMSE 1e-6 → 6e-6).  The (n, rank) norm is one
        # cheap narrow-panel reduction that XLA fuses with the divide.
        colnorm = jnp.linalg.norm(B, axis=0)            # (rank,), exact
        S = jnp.sqrt(jnp.maximum(S2, 0.0)).at[:rank].set(colnorm)
        if not normalize:
            return B, S, V.T
        safe = jnp.maximum(
            jnp.maximum(colnorm, floor_scale * jnp.max(colnorm)), tiny)
        U = B / safe[None, :]
    Vt = V.T
    if canonicalize:
        U, Vt = _sign_canonicalize(U, Vt)
    return U, S, Vt


@functools.partial(jax.jit, static_argnames=("rank", "deflate", "refine"))
def svd_tall_deflated(
    X0: jax.Array, rank: int, deflate: int, refine: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Two-block DEFLATED Gram-route SVD — accurate deep-tail modes on TPU.

    The plain Gram route cannot resolve modes with ``σ_j/σ_1`` below
    ~``√eps_fp32`` on TPU: their Gram eigenvalues sit under the fp32
    floor, AND the panel product ``B = X0 V`` carries elementwise noise
    relative to the LARGE columns that drowns the tiny ones — refine
    depth does not help (measured on the flagship flame set, σ₁₄/σ₁ =
    1.4e-5: tail Σ relative error 4.5 at refine 1, 2, and 3, while CPU
    fp32 reaches 4.8e-5).  Subspace-insensitive consumers (gappy SPR
    reconstruction) don't care; per-mode consumers (the GP ROM, which
    regresses each coefficient series separately) lose accuracy — this
    was the bench's 0.0151-vs-0.0144 ``gpr_nrmse`` gap.

    Fix: compute the leading ``deflate`` modes normally, subtract their
    represented part, and recompute modes ``deflate..rank`` from the
    deflated panel — where they are LEADING, so both the Gram eigenvalues
    and the panel product are relatively accurate again.  Costs ~3 extra
    narrow/panel passes (sub-ms at flagship scale).

    Measured on TPU (flagship flame, r=14, deflate=7): worst tail Σ
    relative error 4.5 → 0.54, with modes ≤ 10 at ≤1.5e-5 and per-mode
    alignment |⟨u, u_f64⟩| = 1.000 through mode 10 — the remaining error
    is CONFINED to the near-degenerate cluster σ₁₂..σ₁₅ (four modes
    within 7e-3 of each other, whose individual split is ill-conditioned
    at any precision; the kept 2-of-4 cluster directions still align at
    principal cosines 0.996/0.991 for the first two).  The full
    ``gpr_nrmse`` decomposition (all measured): f64 0.014428 → fp32 GP
    stage 0.014724 (CPU) → TPU GP arithmetic 0.014808 (exact basis) →
    cluster rotation 0.015089 (deflated) vs 0.015108 (plain) — i.e. the
    once-unexplained 0.0151-vs-0.0144 bench gap is fp32 GP training +
    the fp32-unresolvable cluster, NOT an algorithm defect; deflation
    ships for the per-mode Σ/energy-spectrum accuracy.

    Returns ``(U (n, rank), S (m,), Vt (m, m))`` like
    ``svd_tall(rank=...)``; ``deflate`` ∈ [1, rank) (0 falls back to the
    plain path).  Like the ``rank`` path, requires no sign
    canonicalization (callers canonicalize downstream if needed).
    """
    if not 0 < deflate < rank:
        return svd_tall(X0, refine=refine, canonicalize=False, rank=rank)
    k = deflate
    hp = jax.lax.Precision.HIGHEST
    U1, S1, Vt1 = svd_tall(X0, refine=refine, canonicalize=False, rank=k)
    Xd = X0 - jnp.matmul(U1 * S1[:k][None, :], Vt1[:k], precision=hp)
    U2, S2, Vt2 = svd_tall(Xd, refine=refine, canonicalize=False,
                           rank=rank - k)
    U = jnp.concatenate([U1, U2], axis=1)
    S = S1.at[k:rank].set(S2[: rank - k])
    Vt = Vt1.at[k:rank].set(Vt2[: rank - k])
    return U, S, Vt


def svd_tall_safe(
    X0: jax.Array, refine: Optional[int] = None, canonicalize: bool = True
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`svd_tall` with a rank-deficiency fixup.

    When X0 is numerically rank-deficient (e.g. a row-centered snapshot
    matrix has rank ≤ m−1), the Gram route's null-space columns of U are
    meaningless non-orthonormal junk, while LAPACK returns an orthonormal
    completion.  This eager wrapper detects the case (one host sync on the
    tiny S vector) and re-orthonormalizes U with a thin QR, preserving the
    well-conditioned leading columns.  Use this at the API layer; use
    :func:`svd_tall` with a truncated rank inside fully-jitted pipelines.
    """
    U, S, Vt = svd_tall(X0, refine=refine, canonicalize=canonicalize)
    n, m = X0.shape
    eps = jnp.finfo(X0.dtype).eps
    # √n threshold, matching svd_tall's normalization floor (junk null-space
    # column norms are O(eps·‖X0‖_F) — far below eps·max(S)·√n, so genuine
    # deficiency still triggers with a wide margin)
    if bool(jnp.min(S) <= eps * jnp.max(S) * float(n) ** 0.5):
        Q, R = jnp.linalg.qr(U)
        d = jnp.diagonal(R)
        sgn = jnp.where(d < 0, -1.0, 1.0).astype(U.dtype)
        U = Q * sgn[None, :]
    return U, S, Vt


@jax.jit
def explained_variance(S: jax.Array) -> jax.Array:
    """``100 * cumsum(S²) / sum(S²)`` (``sparse_sensing.py:274-275``)."""
    L = S * S
    return 100.0 * jnp.cumsum(L) / jnp.sum(L)


def select_rank(
    exp_variance, select_modes: str, n_modes, max_rank: int
) -> int:
    """Host-side truncation-rank selection — ``ROM.reduction``
    (``sparse_sensing.py:281-340``).  The rank must be a static Python int
    because it fixes downstream array shapes under jit."""
    import numpy as np

    if select_modes == "variance":
        if not 0 <= n_modes <= 100:
            # message matches the reference byte-for-byte, including its
            # missing space (sparse_sensing.py:309) — error-surface parity
            raise ValueError(
                "The parameter n_modes is outside the[0-100] range.")
        if n_modes == 100:
            return max_rank
        ev = np.asarray(exp_variance)
        # The reference's loop (sparse_sensing.py:300-303) is unguarded; in
        # float32 the cumulative variance can round to e.g. 99.99999 < a
        # requested 99.999995, which would index past the array.  Clamp at
        # max_rank (full rank is the correct answer in that case).
        r = 1
        while r < max_rank and ev[r - 1] < n_modes:
            r += 1
        return r
    if select_modes == "number":
        # `type(...) is int` like the reference (sparse_sensing.py:325):
        # bool must NOT pass as a mode count
        if type(n_modes) is not int:
            raise TypeError("The parameter n_modes is not an integer.")
        if not 1 <= n_modes <= max_rank:
            raise ValueError("The parameter n_modes is outside the [1-m] range.")
        return n_modes
    raise ValueError("The select_mode value is wrong.")


@functools.partial(jax.jit, static_argnames=("k", "n_iter"))
def randomized_svd(
    X0: jax.Array, k: int, key: Optional[jax.Array] = None, n_iter: int = 4
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Randomized truncated SVD (Halko–Martinsson–Tropp) for wide snapshot
    sets where the exact m×m Gram is no longer cheap.  Oversampling 10,
    ``n_iter`` power iterations with Gram-route orthogonalization."""
    n, m = X0.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    p = min(m, k + 10)
    Omega = jax.random.normal(key, (m, p), dtype=X0.dtype)
    with jax.default_matmul_precision("highest"):
        Y = X0 @ Omega
        for _ in range(n_iter):
            Y, _ = jnp.linalg.qr(Y)
            Y = X0 @ (X0.T @ Y)
        Q, _ = jnp.linalg.qr(Y)
        B = Q.T @ X0  # (p, m)
        Ub, S, Vt = jnp.linalg.svd(B, full_matrices=False)
        U = Q @ Ub
    U, Vt = _sign_canonicalize(U[:, :k], Vt[:k])
    return U, S[:k], Vt
