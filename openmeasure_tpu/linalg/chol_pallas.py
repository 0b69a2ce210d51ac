"""Pallas batched small-SPD Cholesky inverse + log-determinant.

Why this kernel exists: the GP training loop (``gp/exact_gp.py``, the
reference's per-iteration hot path ``gpr.py:220-251``) factorizes a batch of
TINY kernel matrices — (r≈14 modes, p≈41 training points) — every Adam
iteration.  XLA's TPU ``cholesky`` lowers to a While loop of dynamic-slice
steps whose per-iteration overhead dwarfs the arithmetic at this size:
measured on the bench shape (14, 41, 41) f32, v5e, chained-slope timing with
all outputs live:

* ``jnp.linalg.cholesky`` + two ``cho_solve`` (α and K⁻¹): **107–112 µs**
* cholesky + ONE ``triangular_solve`` (L⁻¹) + MXU Gram: 100 µs — rejected:
  the cholesky itself dominates, restructuring the solves buys <10%
* ``jnp.linalg.inv`` (LU) + ``slogdet``: 242 µs — rejected
* fully-unrolled sweep-operator inverse in plain jnp: 402 µs — rejected:
  41 steps of masked row/column fixes do not fuse, per-op overhead ×41
* **this kernel: 9.7 µs** (~11×): the whole factorization runs as ONE
  Mosaic program — p fully-unrolled Cholesky steps (static p), then p
  forward-substitution steps for L⁻¹, then one MXU Gram for K⁻¹ = L⁻ᵀL⁻¹.
  An interleaved single-loop variant (chol+FS fused per step, O(1) column
  storage) measured 12.1 µs — the separate loops pipeline better; kept the
  two-loop form and gated its per-column VMEM on the batch shape instead.
* sweep-operator (symmetric Gauss-Jordan) IN-PALLAS: p steps of one
  full-width rank-1 + a fused two-level row/col/diag select — half the
  sequential steps and no stored columns, but measured **20.3 µs vs 7.7**
  (2.6× SLOWER, parity at f32 round-off): the per-step nested full-width
  selects cost more on the VPU than the chol loop's narrow masked scale
  vectors, and Mosaic pipelines the two light loops better than one heavy
  one.  Same conclusion as the jnp sweep (402 µs), different mechanism.

Layout notes: the batch stays a leading dim — every step op is a (B, 1, pp)
row / (B, pp, 1) column fetch (symmetric trailing matrix, so the pivot
column is read BOTH ways, avoiding lane↔sublane transposes) plus one
(B, pp, pp) rank-1 update.  The pivot recurrence is the sequential floor of
the math; everything around it is full-width VPU work.

Numerics: identical pivot sequence to Cholesky (Schur-complement diagonal),
K⁻¹ via L⁻ᵀL⁻¹ at HIGHEST precision.  vs the cho_solve formulation, f32
round-off only: K⁻¹ ~1e-6 relative, logdet ~1e-3 absolute (p log-adds vs
2·Σ log diag) — pinned by ``tests/test_tpu_kernels.py``; CPU/f64 callers
always take the jnp fallback, so host paths are bit-identical to before.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def kernel_path_wanted(dtype) -> bool:
    """Trace-time gate used by the GP/MFK hot paths: TPU backend, f32, and
    not disabled via ``OMTPU_NO_CHOL_KERNEL`` (the env knob exists for
    honest A/B timing of the kernel vs the XLA cholesky formulation)."""
    return (dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and not os.environ.get("OMTPU_NO_CHOL_KERNEL"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_P_CAP = 128          # unroll cap: 2p steps are compiled inline
_VMEM_BUDGET_BYTES = 96 * 1024 * 1024


def _kernel_vmem_request(B: int, p: int, itemsize: int = 4) -> int:
    """A, Y, K⁻¹, eye at (B, pp, 128-padded) plus p stored pivot columns
    (each padded to a full lane tile) and margin."""
    pp = _round_up(max(p, 8), 8)
    per_mat = B * pp * 128 * itemsize
    return (4 + p) * per_mat + (8 << 20)


def chol_fits_vmem(B: int, p: int, itemsize: int = 4) -> bool:
    return p <= _P_CAP and _kernel_vmem_request(B, p, itemsize) < \
        _VMEM_BUDGET_BYTES


def _chol_kernel(K_ref, kinv_ref, ld_ref, *, p: int, pp: int):
    A = K_ref[:]                                   # (B, pp, pp)
    Bn, dt = A.shape[0], A.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pp), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, pp, 1), 1)

    rstds, scols = [], []
    ld = jnp.zeros((Bn, 1, 1), dt)
    for j in range(p):
        d = A[:, j:j + 1, j:j + 1]                 # pivot (B,1,1)
        ld = ld + jnp.log(d)
        rstd = jax.lax.rsqrt(d)
        rstds.append(rstd)
        # trailing matrix stays symmetric: column j is ALSO row j — fetch
        # both orientations directly instead of transposing one
        srow = jnp.where(lane > j, A[:, j:j + 1, :] * rstd, 0.0)
        scol = jnp.where(sub > j, A[:, :, j:j + 1] * rstd, 0.0)
        scols.append(scol)
        A = A - scol * srow                        # Schur complement

    eye = (sub == lane).astype(dt)                 # (1, pp, pp)
    Y = jnp.zeros((Bn, pp, pp), dt) + eye
    for j in range(p):                             # solve L Y = I
        yrow = Y[:, j:j + 1, :] * rstds[j]
        Y = jnp.where(sub == j, yrow, Y - scols[j] * yrow)

    kinv_ref[:] = jax.lax.dot_general(             # K⁻¹ = L⁻ᵀ L⁻¹ (MXU)
        Y, Y, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    ld_ref[:] = jnp.broadcast_to(ld[:, 0, :], (Bn, 128))


def chol_inv_logdet_pallas(Kn: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched (B, p, p) f32 SPD → (K⁻¹ (B, p, p), logdet (B,)).  The pad
    block (p..pp) is identity, so its factor is identity and the result
    slice is exact."""
    B, p, _ = Kn.shape
    pp = _round_up(max(p, 8), 8)
    Kp = jnp.zeros((B, pp, pp), Kn.dtype)
    Kp = jax.lax.dynamic_update_slice(Kp, Kn, (0, 0, 0))
    if pp > p:
        idx = jnp.arange(pp)
        pad_eye = jnp.where(
            (idx[:, None] == idx[None, :]) & (idx[:, None] >= p),
            1.0, 0.0).astype(Kn.dtype)
        Kp = Kp + pad_eye[None]
    kinv, ld = pl.pallas_call(
        functools.partial(_chol_kernel, p=p, pp=pp),
        out_shape=(jax.ShapeDtypeStruct((B, pp, pp), Kn.dtype),
                   jax.ShapeDtypeStruct((B, 128), Kn.dtype)),
    )(Kp)
    return kinv[:, :p, :p], ld[:, 0]


def chol_inv_logdet_jnp(Kn: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched XLA fallback: cholesky + cho_solve(eye) + 2·Σ log diag."""
    p = Kn.shape[-1]
    L = jnp.linalg.cholesky(Kn)
    eye = jnp.eye(p, dtype=Kn.dtype)
    kinv = jax.vmap(
        lambda l: jax.scipy.linalg.cho_solve((l, True), eye))(L)
    ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                       axis=-1)
    return kinv, ld


def chol_inv_logdet_auto(Kn: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Best available batched inverse+logdet: the Pallas kernel for TPU f32
    batches within the unroll/VMEM gate, the jnp formulation otherwise."""
    lead = Kn.shape[:-2]
    p = Kn.shape[-1]
    K3 = Kn.reshape((-1,) + Kn.shape[-2:])
    B = K3.shape[0]
    if kernel_path_wanted(Kn.dtype) and chol_fits_vmem(B, p):
        kinv, ld = chol_inv_logdet_pallas(K3)
    else:
        kinv, ld = chol_inv_logdet_jnp(K3)
    return kinv.reshape(Kn.shape), ld.reshape(lead)


@jax.custom_batching.custom_vmap
def _chol_inv_logdet_nodiff(K: jax.Array) -> Tuple[jax.Array, jax.Array]:
    kinv, ld = chol_inv_logdet_auto(K[None])
    return kinv[0], ld[0]


@_chol_inv_logdet_nodiff.def_vmap
def _chol_inv_logdet_vmap(axis_size, in_batched, K):
    del axis_size, in_batched
    return chol_inv_logdet_auto(K), (True, True)


@jax.custom_jvp
def chol_inv_logdet(K: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Single (p, p) SPD → (K⁻¹, logdet).  Under ``vmap`` the whole batch
    is dispatched as ONE kernel call (the per-iteration win above comes
    from this — a vmapped ``pallas_call`` would serialize grid steps).

    Differentiable to arbitrary order through the analytic rules
    d K⁻¹ = −K⁻¹ dK K⁻¹ and d logdet = Σ K⁻¹ ∘ dK (tangents are plain
    matmuls, so reverse mode comes from JVP transposition and Hessians
    re-enter the rule) — this is what lets the MFK concentrated-NLL
    Newton search run its value/gradient/Hessian passes through the
    kernel instead of autodiff through XLA's cholesky."""
    return _chol_inv_logdet_nodiff(K)


@chol_inv_logdet.defjvp
def _chol_inv_logdet_jvp(primals, tangents):
    (K,), (dK,) = primals, tangents
    kinv, ld = chol_inv_logdet(K)
    with jax.default_matmul_precision("highest"):
        dkinv = -kinv @ dK @ kinv
    dld = jnp.sum(kinv * dK)          # tr(K⁻¹ dK); K⁻¹ symmetric
    return (kinv, ld), (dkinv, dld)
