"""Pallas QRCP kernels: in-VMEM and HBM-streamed, both read-only.

Both kernels implement the read-only left-looking CGS2 greedy pivoting of
``openmeasure_tpu.linalg.qrcp`` (the panel is never downdated — see that
module's docstring for the algebra and the measured evaluation of rejected
alternatives):

* :func:`qrcp_pivots_pallas` loads the whole (r, n) panel into VMEM once and
  runs all k steps on-chip; the read-only formulation needs NO aliased
  output copy, halving the footprint of the previous downdating kernel and
  doubling the panel size that fits.
* :func:`qrcp_pivots_streamed` covers panels larger than VMEM: the norm
  vector (≈ n·4 B) stays resident in VMEM while the panel is re-streamed
  from HBM once per pivot step through a double-buffered manual DMA
  pipeline.  Per-step traffic is ONE read of the panel — the bandwidth floor
  for exact greedy pivoting — versus the read+write(+MXU-padded matmul)
  passes of the jnp formulations.

Lane-alignment notes: the pivot column is fetched as its aligned 128-column
window (one small DMA in the streamed kernel; a dynamic-slice load in-VMEM)
and extracted with a one-hot mask reduction; the "never re-pick" update is a
masked where; all full-width VPU ops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qrcp import qrcp_pivots as _qrcp_pivots_jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_K_PAD = 128  # lane-padded width of the accepted-directions block Q


def _kernel_vmem_request(r: int, n: int, itemsize: int = 4) -> int:
    """Scoped-VMEM bytes the in-VMEM kernel requests (read-only panel plus
    one panel-sized Mosaic temporary for the fused A∘A/q∘A products, norm
    row, Q block) — also the dispatch gate."""
    r_pad = _round_up(max(r, 8), 8)
    n_pad = _round_up(n, 128)
    return (2 * r_pad * n_pad * itemsize      # panel + elementwise temp
            + 16 * n_pad * itemsize           # norm rows + temporaries
            + r_pad * _K_PAD * itemsize
            + (4 << 20))


def _cgs2(col, Q):
    """Two Gram-Schmidt passes of (r_pad, 1) col against (r_pad, K_PAD) Q;
    unused columns of Q are zero, so they are no-ops."""
    for _ in range(2):
        coef = jnp.sum(Q * col, axis=0, keepdims=True)       # (1, K_PAD)
        col = col - jnp.sum(Q * coef, axis=1, keepdims=True)
    return col


def _qrcp_kernel(A_ref, piv_ref, norms_ref, q_ref, *, k: int, n: int):
    n_pad = A_ref.shape[1]
    dtype = A_ref.dtype

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    q_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _K_PAD), 1)
    norms_ref[:] = jnp.where(
        col_ids < n,
        jnp.sum(A_ref[:] * A_ref[:], axis=0, keepdims=True),
        jnp.asarray(-jnp.inf, dtype))
    q_ref[:] = jnp.zeros_like(q_ref)

    def step(i, _):
        A = A_ref[:]
        norms = norms_ref[:]
        j = jnp.argmax(norms[0, :]).astype(jnp.int32)
        onehot = (col_ids == j).astype(dtype)              # (1, n_pad)
        col = jnp.sum(A * onehot, axis=1, keepdims=True)   # (r_pad, 1)
        Q = q_ref[:]
        col = _cgs2(col, Q)
        q = col / jnp.sqrt(jnp.maximum(jnp.sum(col * col),
                                       jnp.finfo(dtype).tiny))
        proj = jnp.sum(q * A, axis=0, keepdims=True)       # (1, n_pad)
        norms_ref[:] = jnp.where(
            col_ids == j, jnp.asarray(-jnp.inf, dtype),
            norms - proj * proj)
        q_ref[:] = jnp.where(q_ids == i, q, Q)
        piv_ref[i] = j
        return 0

    jax.lax.fori_loop(0, k, step, 0)


@functools.partial(jax.jit, static_argnames=("k",))
def qrcp_pivots_pallas(A: jax.Array, k: int) -> jax.Array:
    """First k column pivots of A (r, n) with the whole panel in VMEM.

    ``k`` is capped at ``_K_PAD`` (= 128): the accepted-directions block Q is
    lane-padded to that width, so a larger k would silently stop deflating
    past column 127.  Raises instead; use the jnp sweep for k > 128."""
    if k > _K_PAD:
        raise ValueError(
            f"qrcp_pivots_pallas supports k <= {_K_PAD} (got k={k}); "
            "use linalg.qrcp.qrcp_pivots for larger pivot counts.")
    r, n = A.shape
    r_pad = _round_up(max(r, 8), 8)
    n_pad = _round_up(n, 128)
    A_pad = jnp.zeros((r_pad, n_pad), dtype=A.dtype)
    A_pad = jax.lax.dynamic_update_slice(A_pad, A, (0, 0))

    vmem_bytes = _kernel_vmem_request(r, n)

    pivots = pl.pallas_call(
        functools.partial(_qrcp_kernel, k=k, n=n),
        out_shape=jax.ShapeDtypeStruct((k,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((1, n_pad), A.dtype),
            pltpu.VMEM((r_pad, _K_PAD), A.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes)),
    )(A_pad)
    return pivots


# ---------------------------------------------------------------------- #
# HBM-streamed kernel for panels larger than VMEM
# ---------------------------------------------------------------------- #

def _qrcp_streamed_kernel(a_hbm, dinv_ref, piv_ref, buf, norms_ref, q_ref,
                          colw_ref, blk_sems, col_sem, *, k: int, n: int,
                          bn: int, nb: int, scaled: bool):
    r_pad = buf.shape[1]
    dtype = norms_ref.dtype
    n_pad = norms_ref.shape[1]
    blk_ids = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)
    win_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    q_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _K_PAD), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    def rscale(data):
        # optional per-row scaling of the streamed panel — folds the
        # basis normalization U = B·diag(1/‖b_i‖) into the DMA'd blocks
        # (a VPU multiply fully hidden under the DMA), so pivoting the
        # NORMALIZED panel never needs it materialized in HBM
        return data * dinv_ref[:, :1] if scaled else data

    def blk_dma(slot, b):
        return pltpu.make_async_copy(
            a_hbm.at[:, pl.ds(b * bn, bn)], buf.at[slot],
            blk_sems.at[slot])

    def stream(process_block):
        """Double-buffered pass over all nb blocks; process_block(b, data)."""
        blk_dma(0, 0).start()

        def body(b, _):
            slot = b % 2

            @pl.when(b + 1 < nb)
            def _():
                blk_dma((b + 1) % 2, b + 1).start()

            blk_dma(slot, b).wait()
            process_block(b, rscale(buf[slot]))
            return 0

        jax.lax.fori_loop(0, nb, body, 0)

    # phase A: initial column norms (one streamed pass)
    def init_block(b, data):
        g_ids = blk_ids + b * bn
        norms_ref[:, pl.ds(b * bn, bn)] = jnp.where(
            g_ids < n, jnp.sum(data * data, axis=0, keepdims=True),
            jnp.asarray(-jnp.inf, dtype))

    stream(init_block)
    q_ref[:] = jnp.zeros_like(q_ref)

    # phase B: k greedy steps, each ONE streamed read of the panel
    def step(i, _):
        j = jnp.argmax(norms_ref[0, :]).astype(jnp.int32)
        win = (j // 128) * 128
        cdma = pltpu.make_async_copy(
            a_hbm.at[:, pl.ds(win, 128)], colw_ref, col_sem)
        cdma.start()
        cdma.wait()
        onehot = (win_ids == (j - win)).astype(dtype)
        col = jnp.sum(rscale(colw_ref[:]) * onehot, axis=1, keepdims=True)
        Q = q_ref[:]
        col = _cgs2(col, Q)
        q = col / jnp.sqrt(jnp.maximum(jnp.sum(col * col),
                                       jnp.finfo(dtype).tiny))
        q_ref[:] = jnp.where(q_ids == i, q, Q)
        piv_ref[i] = j

        def deflate_block(b, data):
            proj = jnp.sum(q * data, axis=0, keepdims=True)   # (1, bn)
            norms_ref[:, pl.ds(b * bn, bn)] = (
                norms_ref[:, pl.ds(b * bn, bn)] - proj * proj)

        stream(deflate_block)
        norms_ref[:] = jnp.where(col_ids == j,
                                 jnp.asarray(-jnp.inf, dtype),
                                 norms_ref[:])
        return 0

    jax.lax.fori_loop(0, k, step, 0)


@functools.partial(jax.jit, static_argnames=("k", "block_cols"))
def qrcp_pivots_streamed(A: jax.Array, k: int,
                         block_cols: int = 65536,
                         row_scale=None) -> jax.Array:
    """Greedy QRCP for panels larger than VMEM: norms resident on-chip, the
    panel re-streamed from HBM once per pivot step (double-buffered DMA).

    Measured on TPU v5e at (14 × 1.7M) fp32: 3.2 ms vs 19.5 ms for the jnp
    read-only sweep and 57 ms for the in-place-downdate sweep (the
    single-read-per-step traffic floor is ~2 ms; block size 32-64k columns
    is the measured plateau, ≥128k exceeds VMEM).  Pivots match
    ``scipy.linalg.qr(pivoting=True)`` up to fp ties, same as the other
    formulations.  ``k`` is capped at ``_K_PAD`` (= 128) like the in-VMEM
    kernel.

    ``row_scale`` (r,) multiplies each panel row INSIDE the kernel as
    blocks land in VMEM (a VPU multiply hidden under the DMA): pivoting
    ``diag(row_scale) @ A`` without ever materializing it in HBM.  This
    folds the SPR pipeline's basis normalization into the placement —
    measured end-to-end on the 3D bench (1.7M × 45, r=14): 9.3 → 8.7 ms
    (the eliminated (n, r) normalize+rewrite pass), identical NRMSE."""
    if k > _K_PAD:
        raise ValueError(
            f"qrcp_pivots_streamed supports k <= {_K_PAD} (got k={k}); "
            "use linalg.qrcp.qrcp_pivots for larger pivot counts.")
    r, n = A.shape
    r_pad = _round_up(max(r, 8), 8)
    bn = int(block_cols)
    n_pad = _round_up(n, bn)
    nb = n_pad // bn
    A_pad = jnp.zeros((r_pad, n_pad), dtype=A.dtype)
    A_pad = jax.lax.dynamic_update_slice(A_pad, A, (0, 0))
    scaled = row_scale is not None
    dinv = jnp.zeros((r_pad, 1), dtype=A.dtype)
    if scaled:
        dinv = jax.lax.dynamic_update_slice(
            dinv, jnp.asarray(row_scale, A.dtype).reshape(r, 1), (0, 0))

    vmem_bytes = (2 * r_pad * bn * 4      # double buffer
                  + 24 * n_pad * 4        # norm row + full-width temporaries
                  + r_pad * _K_PAD * 4 + r_pad * 128 * 4
                  + (8 << 20))

    pivots = pl.pallas_call(
        functools.partial(_qrcp_streamed_kernel, k=k, n=n, bn=bn, nb=nb,
                          scaled=scaled),
        out_shape=jax.ShapeDtypeStruct((k,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((2, r_pad, bn), A.dtype),    # block double-buffer
            pltpu.VMEM((1, n_pad), A.dtype),        # resident norms
            pltpu.VMEM((r_pad, _K_PAD), A.dtype),   # accepted directions
            pltpu.VMEM((r_pad, 128), A.dtype),      # pivot-column window
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes)),
    )(A_pad, dinv)
    return pivots


# VMEM budget for auto-dispatch, gated on the kernel's ACTUAL request.
# 96 MB leaves headroom under the 128 MB physical VMEM; a 68 MB request is
# known-good on v5e.
_VMEM_BUDGET_BYTES = 96 * 1024 * 1024


def qrcp_fits_vmem(r: int, n: int, itemsize: int = 4) -> bool:
    return _kernel_vmem_request(r, n, itemsize) < _VMEM_BUDGET_BYTES


def qrcp_pivots_auto(A: jax.Array, k: int, row_scale=None) -> jax.Array:
    """Best available QRCP for the backend and panel size: TPU fp32 panels
    use the in-VMEM kernel when they fit and the HBM-streamed kernel
    otherwise; anything else (including k > the kernels' 128-direction
    cap) uses the jnp read-only sweep.

    ``row_scale`` pivots ``diag(row_scale) @ A``.  On the streamed path
    the scaling happens IN the kernel (no materialization); on the other
    paths it fuses into the panel copy/read XLA makes anyway (the panel
    fits on-chip or the sweep re-reads it regardless).

    Operands committed ACROSS a multi-device mesh (e.g. the row-sharded
    basis of a ``StreamingROM.fit(mesh=...)`` / ``parallel.sharded``
    pipeline) take the jnp sweep: Pallas custom calls are not
    SPMD-partitionable, while the sweep's per-step column-norm argmax
    lowers to shard-local partials + an argmax-allreduce — the layout
    SURVEY §5 prescribes."""
    r, n = A.shape
    multi_device = (not isinstance(A, jax.core.Tracer)
                    and hasattr(A, "sharding")
                    and len(getattr(A.sharding, "device_set", ())) > 1)
    if (A.dtype == jnp.float32 and k <= _K_PAD and not multi_device
            and jax.default_backend() == "tpu"):
        if qrcp_fits_vmem(r, n):
            if row_scale is not None:
                A = A * jnp.asarray(row_scale, A.dtype)[:, None]
            return qrcp_pivots_pallas(A, k)
        return qrcp_pivots_streamed(A, k, row_scale=row_scale)
    if row_scale is not None:
        A = A * jnp.asarray(row_scale, A.dtype)[:, None]
    return _qrcp_pivots_jnp(A, k)
