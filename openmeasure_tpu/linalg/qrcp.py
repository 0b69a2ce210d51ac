"""Column-pivoted QR on device.

The reference selects sensor locations with LAPACK's ``geqp3``
(``scipy.linalg.qr(Ur.T, pivoting=True, mode='economic')`` at
``sparse_sensing.py:739``).  Only the first ``r`` *pivot indices* are consumed
(they become the one-hot rows of the measurement matrix C) — the Q/R factors
are discarded.  So the TPU-native primitive is *greedy norm pivoting*: r
sequential steps, each an on-device argmax over the ~n column norms followed
by a rank-1 Gram-Schmidt downdate.  Each step is one fused VPU pass over the
(r, n) panel; the whole selection is r·O(r·n) FLOPs and never leaves the
device.  Ties are broken deterministically (lowest index, matching LAPACK's
first-max scan).

Under a row-sharded mesh the argmax reduces per-shard maxima with a single
``psum``-style collective (see ``openmeasure_tpu.parallel``).

Alternatives evaluated and rejected on measurement (TPU v5e, 1.7M columns):
a cached-projection Gram–Schmidt variant (read-only passes over A, CGS2
column reorthogonalization) produced LAPACK-identical pivots but ran ~1.7×
SLOWER — the (k, n) projection-cache row update copies the whole cache per
step under XLA; and a pallas_call-per-step streamed kernel ran ~35× slower
(aliased full-array outputs defeat donation).  The in-place downdate below
is what XLA pipelines best; the in-VMEM Pallas kernel
(``qrcp_pallas.qrcp_pivots_pallas``) wins ~20× when the panel fits on-chip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def qrcp_pivots(A: jax.Array, k: int) -> jax.Array:
    """First ``k`` column pivots of A (r, n), LAPACK-geqp3-equivalent.

    Returns int32 pivot indices, shape (k,).  Matches ``scipy.linalg.qr(A,
    pivoting=True)[2][:k]`` up to floating-point ties.
    """
    r, n = A.shape
    hp = jax.lax.Precision.HIGHEST  # pivot fidelity needs full fp32
    norms2 = jnp.sum(A * A, axis=0)
    neg_inf = jnp.asarray(-jnp.inf, dtype=norms2.dtype)

    def step(i, carry):
        Aw, norms2, pivots = carry
        j = jnp.argmax(norms2)
        col = jax.lax.dynamic_slice(Aw, (0, j), (r, 1))  # (r, 1)
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(col * col), jnp.finfo(Aw.dtype).tiny))
        q = col / nrm
        proj = jnp.matmul(q.T, Aw, precision=hp)[0]  # (n,) — one pass
        Aw = Aw - jnp.matmul(q, proj[None, :], precision=hp)
        norms2 = norms2 - proj * proj
        norms2 = norms2.at[j].set(neg_inf)  # never re-pick
        pivots = pivots.at[i].set(j.astype(jnp.int32))
        return Aw, norms2, pivots

    pivots = jnp.zeros((k,), dtype=jnp.int32)
    _, _, pivots = jax.lax.fori_loop(0, k, step, (A, norms2, pivots))
    return pivots


@functools.partial(jax.jit, static_argnames=("n",))
def pivots_to_onehot(pivots: jax.Array, n: int) -> jax.Array:
    """Build the one-hot measurement matrix C (s, n) from pivot indices
    (``sparse_sensing.py:741-743``)."""
    s = pivots.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, n), 1)
    return (cols == pivots[:, None]).astype(jnp.float32)
