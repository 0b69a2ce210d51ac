"""Pallas QRCP kernel: the entire pivot selection in VMEM.

The jnp greedy QRCP (``openmeasure_tpu.linalg.qrcp``) round-trips the (r, n)
panel through HBM on every pivot step — ~20 MB of traffic and a dozen small
dispatched ops per iteration, which dominates the flagship pipeline (~2 ms of
a 2.6 ms total).  This kernel loads the panel into VMEM ONCE and runs all k
greedy steps on-chip: column extraction, projection, rank-1 downdate and the
norm bookkeeping are VPU passes over VMEM at on-chip bandwidth; only the k
pivot indices leave the core.

Applicability: the panel must fit in VMEM (r_pad × n_pad × 4 bytes ≲ the
``vmem_limit_bytes`` budget).  ``qrcp_pivots_auto`` picks this kernel when it
fits and falls back to the HBM-streaming jnp version otherwise.

Lane-alignment notes: dynamic indexing along the lane (last) dimension is
avoided — the pivot column is extracted with a one-hot mask reduction, and
the "never re-pick" update is a masked where, both full-width VPU ops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qrcp import qrcp_pivots as _qrcp_pivots_jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_vmem_request(r: int, n: int, itemsize: int = 4) -> int:
    """Scoped-VMEM bytes the in-VMEM kernel requests (aliased in+out panel
    counted twice, norm rows, Mosaic temporaries) — also the dispatch gate."""
    r_pad = _round_up(max(r, 8), 8)
    n_pad = _round_up(n, 128)
    return 2 * r_pad * n_pad * itemsize + 16 * n_pad * itemsize + (4 << 20)


def _qrcp_kernel(A_ref, piv_ref, Aw_ref, norms_ref, *, k: int, n: int):
    # A_ref is donated to Aw_ref (input_output_aliases) — the panel is
    # mutated in place, halving the VMEM footprint.
    del A_ref
    n_pad = Aw_ref.shape[1]
    dtype = Aw_ref.dtype

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    norms_ref[:] = jnp.where(
        col_ids < n,
        jnp.sum(Aw_ref[:] * Aw_ref[:], axis=0, keepdims=True),
        jnp.asarray(-jnp.inf, dtype))

    def step(i, _):
        Aw = Aw_ref[:]
        norms = norms_ref[:]
        j = jnp.argmax(norms[0, :]).astype(jnp.int32)
        onehot = (col_ids == j).astype(dtype)           # (1, n_pad)
        col = jnp.sum(Aw * onehot, axis=1, keepdims=True)  # (r_pad, 1)
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(col * col),
                                   jnp.finfo(dtype).tiny))
        q = col / nrm
        proj = jnp.sum(q * Aw, axis=0, keepdims=True)   # (1, n_pad)
        Aw_ref[:] = Aw - q * proj
        norms_ref[:] = jnp.where(
            col_ids == j, jnp.asarray(-jnp.inf, dtype),
            norms - proj * proj)
        piv_ref[i] = j
        return 0

    jax.lax.fori_loop(0, k, step, 0)


@functools.partial(jax.jit, static_argnames=("k",))
def qrcp_pivots_pallas(A: jax.Array, k: int) -> jax.Array:
    """First k column pivots of A (r, n) with the whole panel in VMEM."""
    r, n = A.shape
    r_pad = _round_up(max(r, 8), 8)
    n_pad = _round_up(n, 128)
    A_pad = jnp.zeros((r_pad, n_pad), dtype=A.dtype)
    A_pad = jax.lax.dynamic_update_slice(A_pad, A, (0, 0))

    # Scoped-VMEM accounting counts the aliased input and output buffers
    # separately — single source of truth shared with the dispatch gate.
    vmem_bytes = _kernel_vmem_request(r, n)

    pivots, _ = pl.pallas_call(
        functools.partial(_qrcp_kernel, k=k, n=n),
        out_shape=(jax.ShapeDtypeStruct((k,), jnp.int32),
                   jax.ShapeDtypeStruct((r_pad, n_pad), A.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((1, n_pad), A.dtype),
        ],
        input_output_aliases={0: 1},  # panel mutated in place
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes)),
    )(A_pad)
    return pivots


# VMEM budget for auto-dispatch, gated on the kernel's ACTUAL request
# (scoped accounting counts the aliased in/out panel twice).  96 MB leaves
# headroom under the 128 MB physical VMEM; a 68 MB request is known-good on
# v5e.
_VMEM_BUDGET_BYTES = 96 * 1024 * 1024


def qrcp_fits_vmem(r: int, n: int, itemsize: int = 4) -> bool:
    return _kernel_vmem_request(r, n, itemsize) < _VMEM_BUDGET_BYTES


def qrcp_pivots_auto(A: jax.Array, k: int) -> jax.Array:
    """Pallas in-VMEM QRCP when the panel fits, jnp streaming otherwise.

    (An HBM-streamed Pallas variant with aliased in-place downdates was
    evaluated and REMOVED: on this runtime XLA's op-by-op pipeline moves the
    >VMEM panel ~35x faster than the pallas_call-per-step formulation, whose
    aliased full-array outputs defeat donation.  The in-VMEM kernel remains
    a ~20x win when the panel fits.)"""
    r, n = A.shape
    if (A.dtype == jnp.float32 and qrcp_fits_vmem(r, n)
            and jax.default_backend() == "tpu"):
        return qrcp_pivots_pallas(A, k)
    return _qrcp_pivots_jnp(A, k)
