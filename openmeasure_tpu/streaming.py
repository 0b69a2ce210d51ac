"""Out-of-core snapshot ingestion and streaming POD fit.

The reference assembles its snapshot matrices dense in RAM — the 3D workflow
reads one ``.npy`` field file per simulation and column-stacks them
(``docs/pyvista_doc.ipynb`` cell 4); every algorithm then assumes an in-core
``(n, m)`` array.  Nothing in the reference runs out-of-core.  This module is
the TPU-native answer for snapshot sets larger than host RAM / device HBM:
the Gram-route SVD (``linalg/svd.py``) only ever needs *streamed row-chunk
passes* over the tall panel, so the full POD/ROM fit runs with a fixed-size
host buffer and the tiny ``(m, m)`` spectral problem on host float64.

Components
----------
* :class:`NpyMatrixStore` / :class:`NpyColumnStore` — row-chunk readers over
  the two on-disk layouts (one C-order ``(n, m)`` matrix file, or the
  reference's m per-snapshot column files).  Reads go through the native
  loader (``native/npyloader.cpp`` — OpenMP scatter-transpose, GIL released)
  with a numpy-memmap fallback.
* :func:`iter_chunks` — double-buffered prefetch: a background thread reads
  chunk k+1 from disk while chunk k is on the device.  Because the native
  loader releases the GIL for the whole ``pread`` + transpose, disk IO
  genuinely overlaps device compute.
* :class:`StreamingROM` / :class:`StreamingSPR` — drop-in ``ROM``/``SPR``
  whose :meth:`StreamingROM.fit` runs the streaming decomposition; every
  post-fit method that only touches the reduced quantities (``Ur`` ``(n, r)``,
  ``Ar``, ``Vr``, ``Sigma_r``, ``X_cnt``, ``X_scl`` — all memory-resident)
  works unchanged: placement, train, predict, reconstruct, CPOD (via the
  ``UrᵀX0 == Arᵀ`` identity), serving export.

Streaming fit algorithm (disk passes)
-------------------------------------
1. **Stats + raw Grams** (host float64): per-row means (``axis_cnt=1``
   centering), per-feature-block power sums / extrema → ``X_cnt``,
   ``X_scl`` — and, fused into the same pass on the host engine, the raw
   per-block Grams ``G_f = X_fᵀX_f``.  The scaled-centered Gram of the
   whole panel is then derived *algebraically* (per block:
   ``G_f − (G_f11ᵀ + 11ᵀG_f)/m + (1ᵀG_f1/m²)11ᵀ``, scaled ``1/scl_f²`` —
   all (m, m) host f64, :func:`_gram_from_block_stats`), so no Gram disk
   pass is needed; ``eigh`` → full-width ``V``, explained variance → rank
   ``r`` (same :func:`linalg.svd.select_rank` as in-core).  A cancellation
   check guards the raw-minus-correction algebra: offset-dominated blocks
   (|mean| ≫ spread, >6 digits lost) fall back to a streamed centered
   Gram pass.  All 14 scale types of ``core/scaling.py``; ``median`` is
   not a moment statistic and adds its own exact histogram-refinement
   selection passes (usually 2 — see :func:`_block_medians`), though its
   raw Grams stay fused (they are scale-independent).
2. **U**: ``U[rows] = x0_chunk @ V[:, :r]``; final column norms give
   ``Sigma_r`` (the true-column-norm normalization of the in-core ``rank``
   path), then sign canonicalization matching
   :func:`linalg.svd._sign_canonicalize`.  Moment-based scale types
   therefore fit in **two** disk passes total (pass-count tested).

Two ENGINES run the spectral work (``fit(engine=...)``):

* ``'host'`` (default): both products in host float64 BLAS while chunks
  stream — ~18 flops/byte, far below host-BLAS throughput at disk
  bandwidth, so the fit is disk-bound; the f64 Gram needs no fp32 refine
  pass, and the DEVICE sees only one ``(n, r)`` upload (9.6× fewer bytes
  than the device engine at the 3D shape; measured 13.5-21 s vs 46-59 s
  through the TPU tunnel at 1.7M × 45).  Needs an ``(n, r)`` fp32 host
  buffer — the same size as the device engine's HBM buffer.
* ``'device'``: per-chunk products on the accelerator at HIGHEST
  precision, plus one orthogonal-iteration **refine** pass on the
  leading-``width`` subspace — ``G2 += (x0 W)ᵀ (x0 W)`` — exactly the
  width-limited refine of :func:`linalg.svd.svd_tall` (its guard-column
  analysis applies unchanged; default ``width = min(m, 2r)``) to recover
  fp32-Gram accuracy.  ``refine=0`` makes the fit 3 disk passes.

Both engines share the rank rule, norm floor, and sign canonicalization
(:func:`_finalize_basis`) and are cross-parity-tested.  The spectral
problems are ``(m, m)`` host float64 either way — *more* accurate than the
in-core float32 device path, so streaming-vs-in-core parity holds to
float32 round-off (tested).

Rank-deficiency note: like :func:`linalg.svd.svd_tall` (and unlike the eager
``svd_tall_safe`` wrapper), the streamed route does not orthonormalize the
null-space columns a LAPACK SVD would return for a rank-deficient panel —
requesting ``r == m`` of a row-centered matrix (rank ≤ m−1) leaves the last
mode meaningless.  Variance-based selection never does this.

Reference behaviors re-implemented here: ``ROM.fit`` semantics
(``sparse_sensing.py:83-340``) on the streamed substrate; the per-snapshot
file layout of the 3D dataset ingest (``docs/pyvista_doc.ipynb``).
"""

from __future__ import annotations

import functools
import os
import queue
import threading
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from . import native as _native
from .core import scaling as _scaling
from .linalg import svd as _svd
from .linalg import boxls as _boxls
from .rom.rom import ROM
from .sensing.spr import SPR
from .gp.gpr import GPR, PIGPR
from .dynamics.dmd import DMD as _DMD_base

__all__ = [
    "SnapshotStore", "NpyMatrixStore", "NpyColumnStore", "ArrayStore",
    "open_store", "iter_chunks", "StreamingROM", "StreamingSPR",
    "StreamingGPR", "StreamingPIGPR",
]


# --------------------------------------------------------------------- #
# Stores
# --------------------------------------------------------------------- #

class SnapshotStore:
    """Row-chunk access to an on-disk ``(n, m)`` snapshot matrix.

    Subclasses provide ``shape`` and :meth:`read_rows`.  ``ndim`` makes the
    store duck-type as an array for shape validation in ``SPR.train``."""

    shape: Tuple[int, int]
    ndim = 2

    def read_rows(self, row0: int, nrows: int,
                  dtype=np.float32) -> np.ndarray:
        raise NotImplementedError


def _probe_npy(path: str) -> Tuple[int, Tuple[int, int]]:
    """(itemsize, (n, m)) of a .npy file — native probe with numpy fallback."""
    if _native.available():
        try:
            item, shape, _ = _native.npy_probe(path)
            return item, shape
        except RuntimeError:
            pass  # unsupported subset (dtype/order) → numpy fallback below
    arr = np.load(path, mmap_mode="r")
    if arr.ndim == 1:
        return arr.dtype.itemsize, (arr.shape[0], 1)
    if arr.ndim != 2:
        raise ValueError(f"{path}: expected a 1-D or 2-D .npy, got "
                         f"{arr.ndim}-D")
    return arr.dtype.itemsize, arr.shape


class NpyMatrixStore(SnapshotStore):
    """One C-order ``(n, m)`` .npy matrix file; a row chunk is a single
    contiguous ``pread``."""

    def __init__(self, path: str):
        self.path = path
        _, self.shape = _probe_npy(path)

    def read_rows(self, row0, nrows, dtype=np.float32):
        if _native.available():
            try:
                return _native.read_rows_matrix(
                    self.path, row0, nrows, self.shape[1], dtype)
            except RuntimeError:
                pass
        arr = np.load(self.path, mmap_mode="r")
        return np.asarray(arr[row0:row0 + nrows], dtype=dtype)


class NpyColumnStore(SnapshotStore):
    """m per-snapshot column files (each ``(n,)`` or ``(n, 1)``) — the
    reference 3D dataset's on-disk layout.  A row chunk gathers one strided
    slice from every file (native: OpenMP-parallel scatter transpose)."""

    def __init__(self, paths: Sequence[str]):
        self.paths = [os.fspath(p) for p in paths]
        if not self.paths:
            raise ValueError("NpyColumnStore needs at least one file")
        n = None
        for p in self.paths:
            _, (ni, mi) = _probe_npy(p)
            if mi != 1:
                raise ValueError(f"{p}: column files must be (n,) or (n, 1); "
                                 f"got {ni}x{mi}")
            if n is None:
                n = ni
            elif ni != n:
                raise ValueError(f"{p}: inconsistent length {ni} != {n}")
        self.shape = (n, len(self.paths))

    def read_rows(self, row0, nrows, dtype=np.float32):
        if _native.available():
            try:
                return _native.read_rows_files(self.paths, row0, nrows, dtype)
            except RuntimeError:
                pass
        out = np.empty((nrows, len(self.paths)), dtype=dtype)
        for j, p in enumerate(self.paths):
            col = np.load(p, mmap_mode="r")
            out[:, j] = np.asarray(col[row0:row0 + nrows],
                                   dtype=dtype).reshape(-1)
        return out


class ArrayStore(SnapshotStore):
    """In-RAM adapter: lets the streaming fit (and its tests) run over an
    existing array through the identical chunked code path."""

    def __init__(self, X: np.ndarray):
        self.X = np.asarray(X)
        if self.X.ndim != 2:
            raise ValueError("ArrayStore needs a 2-D array")
        self.shape = self.X.shape

    def read_rows(self, row0, nrows, dtype=np.float32):
        return np.asarray(self.X[row0:row0 + nrows], dtype=dtype)


def open_store(source) -> SnapshotStore:
    """Sniff a snapshot source: path → :class:`NpyMatrixStore`, list of
    paths → :class:`NpyColumnStore`, array → :class:`ArrayStore`, store →
    itself."""
    if isinstance(source, SnapshotStore):
        return source
    if isinstance(source, (str, os.PathLike)):
        return NpyMatrixStore(os.fspath(source))
    if isinstance(source, (list, tuple)) and source and \
            isinstance(source[0], (str, os.PathLike)):
        return NpyColumnStore(source)
    return ArrayStore(source)


# --------------------------------------------------------------------- #
# Prefetching chunk iterator
# --------------------------------------------------------------------- #

def default_chunk_rows(m: int, dtype=np.float32,
                       budget_bytes: int = 64 << 20) -> int:
    """Rows per chunk for a ~64 MiB host buffer."""
    return max(1, budget_bytes // (max(m, 1) * np.dtype(dtype).itemsize))


def iter_chunks(store: SnapshotStore, chunk_rows: Optional[int] = None,
                dtype=np.float32, prefetch: int = 2):
    """Yield ``(row0, chunk)`` covering all rows, with a background reader
    thread keeping up to ``prefetch`` chunks ahead.  The native loader
    releases the GIL, so the next chunk's disk read overlaps the caller's
    device compute on the current one.  Closing the generator early stops
    the reader promptly."""
    n, m = store.shape
    if chunk_rows is None:
        chunk_rows = default_chunk_rows(m, dtype)
    chunk_rows = min(chunk_rows, n)
    if prefetch < 1:                      # synchronous fallback
        for row0 in range(0, n, chunk_rows):
            yield row0, store.read_rows(row0, min(chunk_rows, n - row0),
                                        dtype)
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()
    _DONE = object()

    def reader():
        try:
            for row0 in range(0, n, chunk_rows):
                if stop.is_set():
                    return
                chunk = store.read_rows(row0, min(chunk_rows, n - row0),
                                        dtype)
                while not stop.is_set():
                    try:
                        q.put((row0, chunk), timeout=0.1)
                        break
                    except queue.Full:
                        continue
            q.put(_DONE)
        except BaseException as e:  # surfaced in the consumer
            q.put(e)

    t = threading.Thread(target=reader, daemon=True,
                         name="omtpu-chunk-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


# --------------------------------------------------------------------- #
# Streaming statistics (pass 1, host float64)
# --------------------------------------------------------------------- #

_MOMENT_TYPES = frozenset(_scaling.SCALE_TYPES) - {"median"}
_MEDIAN_BINS = 4096
_MEDIAN_COLLECT_LIMIT = 1 << 22      # gather-and-partition threshold
_MEDIAN_EXACT_CAP = 64               # distinct-value counting threshold


# the fused stats+Gram pass keeps one (n_features, m, m) f64 accumulator;
# above this budget (4096 blocks at the reference's m=41) fall back to the
# separate Gram pass rather than ballooning host memory
_FUSED_GRAM_BYTES_CAP = 512 * 1024 * 1024


def _block_stats_pass(store, n_features, dtype, chunk_rows, need_row_means,
                      prefetch, accumulate_gram=False):
    """One disk pass: per-row means (host n-vector) + per-block power sums /
    extrema in float64.  Blocks are the contiguous ``n_points``-row feature
    slabs; chunks may straddle block boundaries.

    With ``accumulate_gram=True`` the same pass also accumulates the RAW
    per-block Grams ``G_f = X_fᵀX_f`` and column sums ``t_f = X_fᵀ1`` (both
    f64, (m, m)/(m,) per block) — the scaled-centered Gram of the whole
    panel is then derivable algebraically (:func:`_gram_from_block_stats`),
    folding the host engine's Gram disk pass into this one.  The row-mean
    cross terms (``t2_f = Σ c̃_i x_i``, ``sc2_f = Σ c̃_i²``) accumulate
    with the centers ROUNDED to the store dtype — the exact values the U
    pass and ``X_cnt`` will use — so the fused Gram matches the streamed
    centered-Gram pass to f64 round-off even for fp32 stores with large
    offsets (an exact-f64-mean identity would center a *different* matrix
    than the one actually projected downstream)."""
    n, m = store.shape
    n_points = n // n_features
    row_means = np.empty(n, dtype=np.float64) if need_row_means else None
    s1 = np.zeros(n_features)
    s2 = np.zeros(n_features)
    s3 = np.zeros(n_features)
    s4 = np.zeros(n_features)
    bmin = np.full(n_features, np.inf)
    bmax = np.full(n_features, -np.inf)
    G_blocks = t_blocks = t2_blocks = sc2_blocks = None
    if accumulate_gram:
        G_blocks = np.zeros((n_features, m, m), dtype=np.float64)
        t_blocks = np.zeros((n_features, m), dtype=np.float64)
        t2_blocks = np.zeros((n_features, m), dtype=np.float64)
        sc2_blocks = np.zeros(n_features, dtype=np.float64)

    for row0, chunk in iter_chunks(store, chunk_rows, dtype, prefetch):
        c = chunk.astype(np.float64, copy=False)
        if need_row_means:
            row_means[row0:row0 + chunk.shape[0]] = c.mean(axis=1)
        r = row0
        end = row0 + chunk.shape[0]
        while r < end:
            f = r // n_points
            r_stop = min(end, (f + 1) * n_points)
            seg = c[r - row0:r_stop - row0]
            s1[f] += seg.sum()
            sq = seg * seg
            s2[f] += sq.sum()
            s3[f] += (sq * seg).sum()
            s4[f] += (sq * sq).sum()
            bmin[f] = min(bmin[f], seg.min())
            bmax[f] = max(bmax[f], seg.max())
            if accumulate_gram:
                G_blocks[f] += seg.T @ seg
                t_blocks[f] += seg.sum(axis=0)
                if need_row_means:
                    # store-dtype-rounded row means — identical to the
                    # cnt the U pass will subtract
                    cr = seg.mean(axis=1).astype(dtype).astype(np.float64)
                    t2_blocks[f] += cr @ seg
                    sc2_blocks[f] += float(cr @ cr)
            r = r_stop
    cnt = float(n_points * m)
    return {"row_means": row_means, "s1": s1, "s2": s2, "s3": s3, "s4": s4,
            "min": bmin, "max": bmax, "count": cnt,
            "G_blocks": G_blocks, "t_blocks": t_blocks,
            "t2_blocks": t2_blocks, "sc2_blocks": sc2_blocks}


def _gram_from_block_stats(stats, scl_blocks, axis_cnt, n_points, dtype):
    """Scaled-centered Gram ``X0ᵀX0`` assembled algebraically from the raw
    per-block Grams of the fused stats pass — no second disk pass.

    Per feature block f (scale ``scl_f`` constant over its rows), with
    ``c̃``/``μ̃``/``scl̃`` the STORE-DTYPE-ROUNDED statistics — the exact
    values the U pass subtracts/divides, so the fused Gram describes the
    same matrix the panel pass projects:

    * ``axis_cnt=1`` (per-row centering): with the rounded-mean cross
      terms ``t2_f = Σ c̃_i x_i`` and ``sc2_f = Σ c̃_i²`` accumulated in
      the stats pass,
      ``Gc_f = G_f − (1 t2_fᵀ + t2_f 1ᵀ) + sc2_f·1 1ᵀ``
    * ``axis_cnt=None`` (block-scalar centering):
      ``Gc_f = G_f − μ̃_f (1 t_fᵀ + t_f 1ᵀ) + n_points·μ̃_f²·1 1ᵀ``

    and ``G = Σ_f Gc_f / scl̃_f²`` — all (m, m) host f64.

    The raw-minus-correction form cancels catastrophically when
    ``|mean| ≫ spread`` (raw moments ~μ², centered ~σ²).  Returns
    ``(G, digits_lost)`` where ``digits_lost`` is the worst base-10
    cancellation across blocks (log10 of raw/centered diagonal magnitude);
    callers fall back to the streamed two-sided Gram pass when it exceeds
    their f64 headroom."""
    G_blocks, t_blocks = stats["G_blocks"], stats["t_blocks"]
    n_features, m, _ = G_blocks.shape
    ones = np.ones(m)
    G = np.zeros((m, m), dtype=np.float64)
    worst = 0.0
    for f in range(n_features):
        Gf = G_blocks[f]
        if axis_cnt == 1:
            t2 = stats["t2_blocks"][f]
            Gc = Gf - np.outer(t2, ones) - np.outer(ones, t2) \
                + stats["sc2_blocks"][f] * np.outer(ones, ones)
        else:
            mu = float(np.asarray(stats["s1"][f] / stats["count"],
                                  dtype=dtype))
            tf = t_blocks[f]
            Gc = Gf - mu * (np.outer(ones, tf) + np.outer(tf, ones)) \
                + n_points * mu * mu * np.outer(ones, ones)
        raw_mag = float(np.abs(np.diag(Gf)).max())
        cen_mag = float(np.abs(np.diag(Gc)).max())
        if raw_mag > 0:
            worst = max(worst, np.log10(
                raw_mag / max(cen_mag, np.finfo(np.float64).tiny)))
        # 0/0-scale blocks propagate inf/nan exactly like the two-sided
        # Gram pass would — same failure surface, no silent flooring
        G += Gc / float(np.asarray(scl_blocks[f], dtype=dtype)) ** 2
    return G, worst


def _distinct_vals(lo: float, hi_excl: float, dt: np.dtype,
                   cap: int) -> Optional[np.ndarray]:
    """The representable values of ``dt`` in ``[lo, hi_excl)`` if there are
    at most ``cap`` of them, else None.  Used to finish the median selection
    exactly when interval bisection stalls (two adjacent representable
    values each holding huge mass cannot be separated by any finite
    histogram refinement)."""
    if not np.issubdtype(dt, np.floating):
        dt = np.dtype(np.float64)
    v = dt.type(lo)
    # dt.type(lo) rounds-to-nearest and may land below lo: step up first
    while np.float64(v) < lo:
        v = np.nextafter(v, np.inf, dtype=dt)
    out = []
    while np.float64(v) < hi_excl:
        out.append(v)
        if len(out) > cap:
            return None
        nxt = np.nextafter(v, np.inf, dtype=dt)
        if nxt == v:                       # inf saturation guard
            break
        v = nxt
    return np.asarray(out, dtype=np.float64)


def _block_medians(store, n_features: int, dtype, chunk_rows, prefetch,
                   bmin: np.ndarray, bmax: np.ndarray) -> np.ndarray:
    """Exact per-feature-block medians (``np.median`` semantics: mean of the
    two middle order statistics for even counts) with O(1) memory —
    histogram-refinement selection over disk passes.

    Each pass histograms every unfinished block's in-interval entries into
    ``_MEDIAN_BINS`` equal float64 bins (``searchsorted`` against explicit
    edges, so bin membership and the interval comparisons share one
    total order) and narrows the interval to the bins containing the two
    middle order statistics k1=(N−1)//2 and k2=N//2.  A block finishes
    when (a) its surviving candidate count drops below
    ``_MEDIAN_COLLECT_LIMIT`` — the next pass gathers the survivors and
    partitions them exactly; (b) all survivors are one value; or (c) the
    interval holds ≤ ``_MEDIAN_EXACT_CAP`` representable values of the
    store dtype — the next pass counts those exact values (terminates the
    adjacent-two-value mass case that defeats pure bisection).  Realistic
    data needs 2 extra passes (one histogram, one gather)."""
    n, m = store.shape
    n_points = n // n_features
    N = n_points * m
    k1, k2 = (N - 1) // 2, N // 2
    dt = np.dtype(dtype)

    lo = bmin.astype(np.float64).copy()
    hi_excl = np.nextafter(bmax.astype(np.float64), np.inf)
    below = np.zeros(n_features, dtype=np.int64)
    count = np.full(n_features, N, dtype=np.int64)
    med = np.full(n_features, np.nan)
    done = bmin >= bmax                   # constant blocks
    med[done] = bmin[done]
    # pending straddle resolutions: f → (aLo, aHi, bLo, bHi); when the two
    # middle order statistics of an even-N block land in DIFFERENT bins,
    # every bin between them is empty (the ranks are adjacent), so
    # v_k1 = max of bin A's contents and v_k2 = min of bin B's — one
    # min/max pass finishes exactly (pure bisection would never separate
    # two huge equal masses at adjacent bin centers)
    straddle: List[Optional[tuple]] = [None] * n_features

    for _ in range(200):                  # hard cap; realistic data: 1-2
        if done.all():
            break
        # per-block plan for this pass
        modes: List[Optional[list]] = [None] * n_features
        for f in range(n_features):
            if done[f]:
                continue
            if straddle[f] is not None:
                modes[f] = ["straddle", straddle[f],
                            np.array([-np.inf]), np.array([np.inf])]
            elif count[f] <= _MEDIAN_COLLECT_LIMIT:
                modes[f] = ["collect", []]
            else:
                vals = _distinct_vals(lo[f], hi_excl[f], dt,
                                      _MEDIAN_EXACT_CAP)
                if vals is not None:
                    modes[f] = ["exact", vals,
                                np.zeros(len(vals), dtype=np.int64)]
                else:
                    edges = np.linspace(lo[f], hi_excl[f],
                                        _MEDIAN_BINS + 1)
                    modes[f] = ["hist", edges,
                                np.zeros(_MEDIAN_BINS, dtype=np.int64),
                                np.array([np.inf]), np.array([-np.inf])]

        for row0, chunk in iter_chunks(store, chunk_rows, dtype, prefetch):
            c = chunk.astype(np.float64, copy=False)
            r, end = row0, row0 + chunk.shape[0]
            while r < end:
                f = r // n_points
                r_stop = min(end, (f + 1) * n_points)
                mode = modes[f]
                if mode is not None:
                    seg = c[r - row0:r_stop - row0].ravel()
                    if mode[0] == "straddle":
                        a_lo, a_hi, b_lo, b_hi = mode[1]
                        in_a = seg[(seg >= a_lo) & (seg < a_hi)]
                        in_b = seg[(seg >= b_lo) & (seg < b_hi)]
                        if in_a.size:
                            mode[2][0] = max(mode[2][0], in_a.max())
                        if in_b.size:
                            mode[3][0] = min(mode[3][0], in_b.min())
                    else:
                        cand = seg[(seg >= lo[f]) & (seg < hi_excl[f])]
                        if mode[0] == "collect":
                            mode[1].append(cand)
                        elif mode[0] == "exact":
                            # exact counts: cand values ∈ the vals set
                            idx = np.searchsorted(mode[1], cand)
                            mode[2] += np.bincount(
                                idx, minlength=len(mode[2])
                            ).astype(np.int64)
                        else:
                            idx = np.searchsorted(mode[1], cand,
                                                  side="right") - 1
                            mode[2] += np.bincount(
                                idx, minlength=_MEDIAN_BINS
                            ).astype(np.int64)
                            if cand.size:
                                mode[3][0] = min(mode[3][0], cand.min())
                                mode[4][0] = max(mode[4][0], cand.max())
                r = r_stop

        for f in range(n_features):
            mode = modes[f]
            if mode is None:
                continue
            if mode[0] == "straddle":
                med[f] = 0.5 * (mode[2][0] + mode[3][0])
                done[f] = True
            elif mode[0] == "collect":
                vals = (np.concatenate(mode[1]) if mode[1]
                        else np.empty(0))
                vals.sort()
                med[f] = 0.5 * (vals[k1 - below[f]] + vals[k2 - below[f]])
                done[f] = True
            elif mode[0] == "exact":
                cum = below[f] + np.cumsum(mode[2])
                v1 = mode[1][np.searchsorted(cum, k1, side="right")]
                v2 = mode[1][np.searchsorted(cum, k2, side="right")]
                med[f] = 0.5 * (v1 + v2)
                done[f] = True
            else:
                _, edges, cnts, cmin, cmax = mode
                if cmin[0] == cmax[0]:    # all survivors identical
                    med[f] = cmin[0]
                    done[f] = True
                    continue
                cum = below[f] + np.cumsum(cnts)
                b1 = int(np.searchsorted(cum, k1, side="right"))
                b2 = int(np.searchsorted(cum, k2, side="right"))
                if b1 != b2:              # adjacent ranks, distinct bins
                    straddle[f] = (edges[b1], edges[b1 + 1],
                                   edges[b2], edges[b2 + 1])
                    continue
                new_lo = max(edges[b1], cmin[0])
                new_hi = min(edges[b2 + 1], np.nextafter(cmax[0], np.inf))
                below[f] = below[f] + int(cnts[:b1].sum())
                count[f] = int(cnts[b1:b2 + 1].sum())
                lo[f], hi_excl[f] = new_lo, new_hi
    if not done.all():
        raise RuntimeError("streaming median failed to converge "
                           f"(blocks {np.flatnonzero(~done)})")
    return med


def _scale_from_stats(stats, scale_type: str) -> np.ndarray:
    """Per-block scale factors from streamed power sums — the moment-form
    equivalents of :func:`core.scaling._block_scale_factor` (biased moments,
    like ``jnp.std``/``scipy.stats.kurtosis``)."""
    N = stats["count"]
    mean = stats["s1"] / N
    var = np.maximum(stats["s2"] / N - mean * mean, 0.0)
    std = np.sqrt(var)
    if scale_type == "std":
        return std
    if scale_type == "none":
        return np.ones_like(std)
    if scale_type == "pareto":
        return np.sqrt(std)
    if scale_type == "vast":
        return var / mean
    if scale_type == "range":
        return stats["max"] - stats["min"]
    if scale_type == "level":
        return mean
    if scale_type == "max":
        return stats["max"]
    if scale_type == "variance":
        return var
    if scale_type == "poisson":
        return np.sqrt(mean)
    if scale_type == "l2-norm":
        return np.sqrt(stats["s2"])
    if scale_type in ("vast_2", "vast_3", "vast_4"):
        # central moments from raw power sums
        m2 = var
        m4 = (stats["s4"] / N - 4.0 * mean * stats["s3"] / N
              + 6.0 * mean ** 2 * stats["s2"] / N - 3.0 * mean ** 4)
        kurt = m4 / (m2 * m2) - 3.0
        base = var * kurt ** 2
        if scale_type == "vast_2":
            return base / mean
        if scale_type == "vast_3":
            return base / stats["max"]
        return base / (stats["max"] - stats["min"])
    raise NotImplementedError(
        "The scaling method selected has not been implemented yet")


# --------------------------------------------------------------------- #
# Device-side chunk kernels (passes 2-4)
# --------------------------------------------------------------------- #

@jax.jit
def _chunk_gram(chunk, cnt, scl, W=None):
    """Scaled-chunk Gram: ``x0 = (chunk − cnt)/scl`` rowwise; returns
    ``(x0 W)ᵀ (x0 W)`` (or full-width if W is None) at HIGHEST."""
    x0 = (chunk - cnt[:, None]) / scl[:, None]
    hp = jax.lax.Precision.HIGHEST
    if W is not None:
        x0 = jnp.matmul(x0, W, precision=hp)
    return jnp.matmul(x0.T, x0, precision=hp)


def _floored_norms(xp, colnorm, n, storage_dtype, norm_dtype):
    """The eps·max·√n rank-deficiency norm floor (single source — see
    :func:`_finalize_basis` for the precision rationale)."""
    eps = float(np.finfo(np.dtype(norm_dtype)).eps)
    tiny = float(np.finfo(np.dtype(storage_dtype)).tiny)
    return xp.maximum(
        xp.maximum(colnorm, eps * xp.max(colnorm) * float(n) ** 0.5), tiny)


def _finalize_basis(xp, U, colnorm, S2, V, r, n, norm_dtype=None):
    """Shared fit-engine epilogue — SINGLE SOURCE for the eps·max·√n
    rank-deficiency norm floor (√n is the growth rate of an n-entry norm's
    rounding error; an n-proportional floor de-normalizes real fp32 tail
    modes — see ``linalg/svd.py``), the column normalization, the sign
    canonicalization (largest-|.| entry positive, V flipped to match), and
    the full-width S assembly.  ``xp`` is numpy (host engine) or jax.numpy
    (device engine).  ``norm_dtype`` is the dtype the column norms were
    ACCUMULATED in — the floor must track that precision, not the storage
    dtype: the host engine's float64 norms resolve genuine tail modes far
    below fp32's eps·max·√n, and flooring those de-normalizes real basis
    columns (measured at flagship scale: σ12–14/σ1 ≈ 1e-5 sit under the
    fp32 floor 4.9e-5 — their U columns came out 0.2–0.5-norm, silently
    breaking downstream orthonormal-Ur math like the incremental basis
    update).  Defaults to ``U.dtype`` (the device engine's case).
    Returns ``(U, sr_f64, S_f64, V_f64)``."""
    safe = _floored_norms(xp, colnorm, n, U.dtype, norm_dtype or U.dtype)
    U = U / xp.asarray(safe, dtype=U.dtype)[None, :]
    signs = _svd.canonical_signs(U, xp)
    U = U * signs[None, :]
    sr = np.asarray(colnorm, dtype=np.float64)
    S = np.sqrt(S2)
    S[:r] = sr
    V[:, :r] *= np.asarray(signs, dtype=np.float64)[None, :]
    return U, sr, S, V


@jax.jit
def _finalize_sharded_u(U, safe):
    """On-device twin of :func:`_finalize_basis`'s normalization + sign
    canonicalization for a row-SHARDED raw U panel: the division is
    shard-local, the per-column argmax is an (r,)-sized cross-shard
    reduce.  ``safe`` is the host-f64 floored column norms.  Returns the
    canonical U (sharding preserved) and the applied signs."""
    U = U / safe[None, :].astype(U.dtype)
    signs = _svd.canonical_signs(U)
    return U * signs[None, :], signs


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_u(buf, chunk, cnt, scl, VU, row0):
    """``buf[row0:row0+c] = ((chunk − cnt)/scl) @ VU`` — U-pass scatter into
    the donated ``(n, r)`` device buffer."""
    x0 = (chunk - cnt[:, None]) / scl[:, None]
    u = jnp.matmul(x0, VU, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dynamic_update_slice(buf, u, (row0, 0))


# --------------------------------------------------------------------- #
# StreamingROM
# --------------------------------------------------------------------- #

class StreamingROM(ROM):
    """Out-of-core :class:`ROM`: identical post-fit API over a
    :class:`SnapshotStore` instead of an in-RAM matrix.

    ``X0`` is never materialized; methods that require the full scaled
    panel (``scale_data``, ``decomposition``, a ``solver_fn`` CPOD) raise
    with a pointer to the in-core class.  ``CPOD`` works: its per-snapshot
    QP only consumes ``UrᵀX0 = Arᵀ`` (exact for an orthonormal ``Ur``).
    ``adaptive_sampling`` reuses the fitted spectrum (full-width ``S``/``V``
    are kept — they are ``(m,)``/``(m, m)``)."""

    def __init__(self, source, n_features, xyz=None, chunk_rows=None,
                 dtype=np.float32, prefetch: int = 2):
        if not isinstance(n_features, int):
            raise TypeError("The parameter n_features is not an integer.")
        self.store = open_store(source)
        self.X = self.store          # duck-typed: .shape/.ndim only
        self.n_features = n_features
        self.xyz = xyz
        n = self.store.shape[0]
        self.n_points = n // n_features
        if n % n_features != 0:
            raise Exception(
                "The number of rows of X is not a multiple of n_features")
        self.chunk_rows = chunk_rows
        self.dtype = np.dtype(dtype)
        self.prefetch = prefetch

    # -------------------------------------------------------------- #

    def scale_data(self, scale_type="std", axis_cnt=1):
        raise NotImplementedError(
            "StreamingROM never materializes X0; call fit() — it computes "
            "X_cnt/X_scl in its streaming stats pass. Use the in-core ROM "
            "if you need the scaled snapshot matrix itself.")

    def decomposition(self, X0, select_modes="variance", n_modes=99):
        raise NotImplementedError(
            "StreamingROM decomposes inside fit() (streamed Gram route); "
            "there is no in-core X0 to decompose.")

    def _stream_scaling(self, scale_type, axis_cnt, want_gram=False):
        """Stats pass → (cnt, scl, stats, scl_blocks).  With
        ``want_gram=True`` the pass also accumulates the raw per-block
        Grams (``stats['G_blocks']``) so the host engine can skip its Gram
        disk pass (:func:`_gram_from_block_stats`); the accumulator is
        skipped above :data:`_FUSED_GRAM_BYTES_CAP`."""
        if scale_type not in _scaling.SCALE_TYPES:
            raise NotImplementedError(
                "The scaling method selected has not been implemented yet")
        if axis_cnt not in (1, None):
            raise ValueError("axis_cnt must be 1 or None")
        m = self.store.shape[1]
        want_gram = want_gram and (
            self.n_features * m * m * 8 <= _FUSED_GRAM_BYTES_CAP)
        stats = _block_stats_pass(
            self.store, self.n_features, self.dtype, self.chunk_rows,
            need_row_means=(axis_cnt == 1), prefetch=self.prefetch,
            accumulate_gram=want_gram)
        if scale_type == "median":
            # not a moment statistic: exact selection via histogram-
            # refinement disk passes (np.median semantics, usually 2 more
            # passes) — see _block_medians.  The fused raw Grams stay
            # valid: they are scale-independent, only the final /scl_f²
            # uses the medians.
            scl_blocks = _block_medians(
                self.store, self.n_features, self.dtype, self.chunk_rows,
                self.prefetch, stats["min"], stats["max"])
        else:
            scl_blocks = _scale_from_stats(stats, scale_type)
        if axis_cnt == 1:
            cnt = stats["row_means"]
        else:
            cnt = np.repeat(stats["s1"] / stats["count"], self.n_points)
        scl = np.repeat(scl_blocks, self.n_points)
        return (cnt.astype(self.dtype), scl.astype(self.dtype), stats,
                scl_blocks)

    def fit(self, scale_type: str = "std", axis_cnt: Optional[int] = 1,
            select_modes: str = "variance", n_modes=99, basis=None,
            refine: Optional[int] = None, width: Optional[int] = None,
            config=None, engine: str = "host", mesh=None,
            mesh_axis: str = "state"):
        """Streaming ``ROM.fit`` — see the module docstring for the pass
        structure.

        ``mesh=...`` composes out-of-core with multi-chip (SURVEY §5's
        scaling axis IS the tall state dimension): the U pass streams each
        disk chunk's rows toward their state shard and uploads every shard
        slice the moment its rows are complete (``jax.device_put`` is
        async, so shard uploads overlap the remaining disk reads), then
        assembles the global row-sharded ``Ur`` with
        ``jax.make_array_from_single_device_arrays`` — no single-device
        (n, r) hop.  Column normalization + sign canonicalization run as
        one jitted program ON the sharded array (shard-local elementwise
        work plus an (r,)-sized argmax reduce).  Everything else
        (stats/Gram/eigh) is the identical host-f64 math, so the factors
        match the unsharded fit bit-for-bit up to fp32 rounding (parity
        tested on an 8-device mesh, and in the driver dryrun).  Requires
        ``engine='host'`` (the device engine's chunk scatter assumes one
        resident HBM buffer).

        ``engine='host'`` (default): the spectral passes run in host
        float64 BLAS while chunks stream from disk, and only the final
        (n, r) basis is uploaded — the scaled-Gram + U math is ~18
        flops/byte, far below what one CPU core sustains at disk
        bandwidth, and the f64 Gram needs no fp32 refine pass.  Device
        traffic is n·r·4 bytes instead of the device engine's
        (2+refine)·n·m·4 — measured on the tunneled v5e at (1.7M × 45):
        10.6 s vs 46-59 s wall (9.6× fewer bytes shipped).  Requires an
        (n, r) float32 host buffer (same size as the device engine's HBM
        buffer).  ``refine``/``width`` are device-engine knobs and are
        REJECTED here (the f64 Gram is already beyond fp32-refine
        accuracy) — pass ``engine='device'`` to use them.

        ``engine='device'``: every pass runs on the accelerator
        (``refine``/``width`` follow :func:`linalg.svd.svd_tall`; default
        backend-aware refine, width ``min(m, 2r)``) — the right choice
        when host cores are the scarce resource or chunks already live in
        device-adjacent storage."""
        if config is not None:
            scale_type = config.scale_type
            axis_cnt = config.axis_cnt
            select_modes = config.select_modes
            n_modes = config.n_modes
        if engine not in ("host", "device"):
            raise ValueError(f"unknown streaming fit engine {engine!r}")
        if engine == "host" and (refine is not None or width is not None):
            # loud, not silent: these knobs control the device engine's
            # fp32-Gram accuracy recovery; the host engine's float64 Gram
            # has nothing for them to do
            raise ValueError(
                "refine/width are device-engine knobs; the host engine's "
                "float64 Gram does not use them — pass engine='device' "
                "or drop them.")
        if mesh is not None and engine != "host":
            raise ValueError(
                "mesh= composes with engine='host' only (the device "
                "engine's chunk scatter assumes one resident HBM buffer).")
        if mesh is not None and basis is not None:
            raise ValueError(
                "mesh= shards the streamed U pass; with basis= there is "
                "no U pass — shard the injected basis yourself "
                "(e.g. serving.shard_state_rows).")
        if refine is None:
            refine = _svd.default_refine()
        self.scale_type = scale_type
        # fit-path observability, reset every fit (the device/basis paths
        # never fuse; a later unsharded fit must not report a stale mesh)
        self.gram_fused_ = False
        self.fit_mesh_ = None
        n, m = self.store.shape

        # pass 1 — stats (fused with the raw block Grams on the host
        # engine, so the scaled-centered Gram needs no second disk pass)
        cnt_h, scl_h, stats, scl_blocks = self._stream_scaling(
            scale_type, axis_cnt,
            want_gram=(engine == "host" and basis is None))
        self.X_cnt = jnp.asarray(cnt_h[:, None])
        self.X_scl = jnp.asarray(scl_h[:, None])
        self._cnt_vector_cache = None

        if basis is not None:
            Ur, Ar = jnp.asarray(basis[0]), jnp.asarray(basis[1])
            self.Ur, self.Ar, self.r = Ur, Ar, Ar.shape[1]
            Sigma_r = jnp.linalg.norm(Ar, axis=0)
            self.Vr = Ar / Sigma_r[None, :]
            self.Sigma_r = Sigma_r
            self._invalidate_trained_state()
            return

        if engine == "host":
            self._fit_host_spectral(cnt_h, scl_h, select_modes, n_modes,
                                    stats=stats, scl_blocks=scl_blocks,
                                    axis_cnt=axis_cnt, mesh=mesh,
                                    mesh_axis=mesh_axis)
            self._fit_axis_cnt = axis_cnt
            self._invalidate_trained_state()
            return

        # pass 2 — Gram → V, eigenvalues, rank
        G = np.zeros((m, m), dtype=np.float64)
        for row0, chunk in self._chunks():
            G += np.asarray(_chunk_gram(
                jnp.asarray(chunk), *self._cnt_scl_slices(cnt_h, scl_h,
                                                          row0, chunk)))
        V, S2, r = self._rank_from_gram(G, select_modes, n_modes)

        # pass 3 — width-limited orthogonal-iteration refine
        if width is None:
            width = min(m, max(2 * r, r + 4))
        if not r <= width <= m:
            raise ValueError("need rank <= width <= m")
        if refine > 0 and width < m:
            Vw = V[:, :width]
        else:
            Vw = V
        for _ in range(refine):
            W_dev = jnp.asarray(Vw.astype(self.dtype))
            G2 = np.zeros((Vw.shape[1], Vw.shape[1]), dtype=np.float64)
            for row0, chunk in self._chunks():
                G2 += np.asarray(_chunk_gram(
                    jnp.asarray(chunk),
                    *self._cnt_scl_slices(cnt_h, scl_h, row0, chunk),
                    W=W_dev))
            e2, V2 = np.linalg.eigh(G2)
            V2 = V2[:, ::-1]
            S2[:Vw.shape[1]] = np.maximum(e2[::-1], 0.0)
            Vw = Vw @ V2

        V[:, :Vw.shape[1]] = Vw

        # pass 4 — assemble U (n, r) on device
        VU = jnp.asarray(V[:, :r].astype(self.dtype))
        buf = jnp.zeros((n, r), dtype=self.dtype)
        for row0, chunk in self._chunks():
            buf = _scatter_u(buf, jnp.asarray(chunk),
                             *self._cnt_scl_slices(cnt_h, scl_h, row0,
                                                   chunk),
                             VU, row0)
        colnorm = jnp.linalg.norm(buf, axis=0)
        U, sr, S, V = _finalize_basis(jnp, buf, colnorm, S2, V, r, n)
        self._set_spectral_attrs(U, sr, S, V)
        self._fit_axis_cnt = axis_cnt
        self._invalidate_trained_state()

    # -------------------------------------------------------------- #

    # worst tolerable base-10 cancellation in the fused raw-Gram algebra:
    # 6 lost digits still leave ~1e-10 relative in f64 — beyond the fp32
    # parity bars; above this the engine falls back to the streamed
    # two-sided (centered-then-multiplied) Gram pass, which is stable
    _FUSED_MAX_DIGITS_LOST = 6.0

    def _fit_host_spectral(self, cnt_h, scl_h, select_modes, n_modes,
                           stats=None, scl_blocks=None, axis_cnt=1,
                           mesh=None, mesh_axis="state"):
        """``engine='host'`` spectral passes: f64 BLAS Gram + U assembly on
        the host while chunks stream, one (n, r) device upload at the end.
        Post-fit attributes are identical to the device engine's
        (same rank rule, eps·max·√n norm floor, sign canonicalization).

        When the stats pass carried the fused raw block Grams, the
        scaled-centered Gram is assembled algebraically
        (:func:`_gram_from_block_stats`) and disk pass A is skipped —
        the moment-based scale types fit in TWO disk passes total
        (``median`` keeps its extra selection passes).  The fused algebra
        is abandoned (streamed pass A runs instead) if its cancellation
        check loses more than ``_FUSED_MAX_DIGITS_LOST`` digits
        (offset-dominated data: |mean| ≫ spread)."""
        n, m = self.store.shape
        cnt64 = cnt_h.astype(np.float64)
        scl64 = scl_h.astype(np.float64)

        G = self._assemble_gram(stats, scl_blocks, axis_cnt, cnt64, scl64)
        V, S2, r = self._rank_from_gram(G, select_modes, n_modes)

        # disk pass B — U = X0 V_r, column norms accumulated in f64,
        # entries stored fp32 (the only O(n) host buffer, size == the
        # device engine's HBM buffer).  With a mesh, every state shard's
        # rows are device_put the moment the stream completes them
        # (async — uploads overlap the remaining disk reads).
        from jax.sharding import NamedSharding, PartitionSpec
        pending, shards, sharding = [], [], None
        if mesh is not None:
            k = mesh.shape[mesh_axis]
            if n % k != 0:
                raise ValueError(
                    f"sharded streaming fit needs the state dimension "
                    f"(n={n}) divisible by the '{mesh_axis}' mesh axis "
                    f"({k} devices) — pad the store upstream or pick a "
                    f"divisor mesh (same convention as "
                    f"parallel.shard_snapshots).")
            sharding = NamedSharding(mesh, PartitionSpec(mesh_axis, None))
            groups = {}
            for dev, idx in \
                    sharding.addressable_devices_indices_map((n, r)).items():
                rs = idx[0]
                key = (rs.start or 0, n if rs.stop is None else rs.stop)
                groups.setdefault(key, []).append(dev)
            pending = sorted(groups.items())          # ascending row ranges

        Vr_ = V[:, :r]
        U_h = np.empty((n, r), dtype=self.dtype)
        colnorm2 = np.zeros((r,), dtype=np.float64)
        for row0, chunk in self._chunks():
            c = chunk.shape[0]
            x0 = (chunk.astype(np.float64)
                  - cnt64[row0:row0 + c, None]) / scl64[row0:row0 + c, None]
            u = x0 @ Vr_
            colnorm2 += np.sum(u * u, axis=0)
            U_h[row0:row0 + c] = u.astype(self.dtype)
            while pending and pending[0][0][1] <= row0 + c:
                (a, b), devs = pending.pop(0)
                shards += [jax.device_put(U_h[a:b], d) for d in devs]
        colnorm = np.sqrt(colnorm2)

        if mesh is None:
            U_h, sr, S, V = _finalize_basis(np, U_h, colnorm, S2, V, r, n,
                                            norm_dtype=np.float64)
            self._set_spectral_attrs(jnp.asarray(U_h), sr, S, V)
            return

        # sharded epilogue: assemble the global row-sharded panel, then
        # normalize + sign-canonicalize ON the shards (host twin:
        # _finalize_basis — same f64 norm floor, same canonical signs)
        assert not pending, "stream ended before all shards were complete"
        U_glob = jax.make_array_from_single_device_arrays(
            (n, r), sharding, shards)
        safe = _floored_norms(np, colnorm, n, self.dtype, np.float64)
        U_canon, signs_dev = _finalize_sharded_u(U_glob, jnp.asarray(safe))
        signs = np.asarray(signs_dev, dtype=np.float64)
        sr = np.asarray(colnorm, dtype=np.float64)
        S = np.sqrt(S2)
        S[:r] = sr
        V[:, :r] *= signs[None, :]
        self._set_spectral_attrs(U_canon, sr, S, V)
        # the n-row unscaling vectors ride the same row sharding so
        # reconstruct() stays shard-local end to end
        self.X_cnt = jax.device_put(self.X_cnt, sharding)
        self.X_scl = jax.device_put(self.X_scl, sharding)
        self.fit_mesh_ = mesh

    def _assemble_gram(self, stats, scl_blocks, axis_cnt, cnt64, scl64):
        """Scaled-centered f64 Gram of the whole panel: the fused algebra
        from the stats pass when available and well-conditioned
        (:func:`_gram_from_block_stats`), else ONE streamed centered Gram
        pass.  Sets ``self.gram_fused_``.  SINGLE SOURCE for the
        cancellation fallback — shared by the ROM fit and StreamingDMD."""
        self.gram_fused_ = False
        if stats is not None and stats.get("G_blocks") is not None:
            G, digits_lost = _gram_from_block_stats(
                stats, scl_blocks, axis_cnt, self.n_points, self.dtype)
            # A NON-FINITE fused Gram (a 0-scale block dividing by scl²)
            # is not a fallback case: the streamed pass divides by the
            # same zero and deterministically reproduces the inf/nan —
            # keep the identical failure surface without paying an extra
            # full disk sweep.
            if digits_lost <= self._FUSED_MAX_DIGITS_LOST \
                    or not np.all(np.isfinite(G)):
                self.gram_fused_ = True
                return G
        m = self.store.shape[1]
        G = np.zeros((m, m), dtype=np.float64)
        for row0, chunk in self._chunks():
            c = chunk.shape[0]
            x0 = (chunk.astype(np.float64) - cnt64[row0:row0 + c, None]
                  ) / scl64[row0:row0 + c, None]
            G += x0.T @ x0
        return G

    def _rank_from_gram(self, G, select_modes, n_modes):
        """Shared spectral step: host-f64 ``eigh`` of the accumulated
        Gram, explained variance, in-core rank rule.  Sets ``self.r``."""
        m = G.shape[0]
        evals, V = np.linalg.eigh(G)          # host float64, ascending
        V = V[:, ::-1]
        S2 = np.maximum(evals[::-1], 0.0)
        exp_var = 100.0 * np.cumsum(S2) / max(S2.sum(), np.finfo(float).tiny)
        r = _svd.select_rank(exp_var, select_modes, n_modes, m)
        self.r = r
        return V, S2, r

    def _set_spectral_attrs(self, U_dev, sr, S, V):
        """Shared post-fit attribute writes (both engines)."""
        r = self.r
        self.Ur = U_dev
        self.Sigma_r = jnp.asarray(sr.astype(self.dtype))
        self.Ar = jnp.asarray((V[:, :r] * S[:r][None, :]).astype(self.dtype))
        self.Vr = jnp.asarray(V[:, :r].astype(self.dtype))
        self._S_full = S                       # (m,) host float64
        self._V_full = V                       # (m, m) host float64

    def _chunks(self):
        return iter_chunks(self.store, self.chunk_rows, self.dtype,
                           self.prefetch)

    @staticmethod
    def _cnt_scl_slices(cnt_h, scl_h, row0, chunk):
        c = chunk.shape[0]
        return (jnp.asarray(cnt_h[row0:row0 + c]),
                jnp.asarray(scl_h[row0:row0 + c]))

    # -------------------------------------------------------------- #

    def CPOD(self, limits=None, solver_fn=None, max_iter: int = 4000,
             tol: float = 1e-9, over_relax: float = 1.6, solver_config=None,
             constraints=None, **kwargs):
        """Constrained POD without ``X0``: the box-QP's linear term is
        ``UrᵀX0[:, i]``, which equals ``Ar[i]`` exactly for the orthonormal
        streamed basis (``UrᵀU Σ V̂ᵀ = Σ_r V̂ᵀ``), so the identical vmapped
        ADMM program runs from the reduced coordinates alone."""
        if solver_fn is not None:
            raise NotImplementedError(
                "solver_fn CPOD needs the in-core X0; use ROM.CPOD.")
        if solver_config is not None:
            max_iter = solver_config.max_iter
            tol = solver_config.tol
            over_relax = solver_config.over_relax
        Ur = self.Ur
        hp = jax.lax.Precision.HIGHEST
        H = jnp.matmul(Ur.T, Ur, precision=hp)
        box = None
        if limits is not None:
            lo_b, hi_b = self.scale_limits(limits)
            box = (Ur, lo_b, hi_b)
        cs, box_only = _boxls.build_constraint_set(constraints, box)
        if cs is None:
            raise ValueError(
                "CPOD requires `limits`, `constraints`, or a solver_fn.")
        if box_only:
            A_c, lo, hi = Ur, cs.lo, cs.hi
            AtA = H
        else:
            A_c = jnp.asarray(cs.A)
            lo, hi = jnp.asarray(cs.lo), jnp.asarray(cs.hi)
            AtA = jnp.matmul(A_c.T, A_c, precision=hp)

        def solve_one(q_row, lo_i, hi_i):
            return _boxls.admm_box_qp(
                H, q_row, A_c, lo_i, hi_i, AtA=AtA, max_iter=max_iter,
                tol=tol, over_relax=over_relax)

        in_axes = (0, 0 if jnp.ndim(lo) == 2 else None,
                   0 if jnp.ndim(hi) == 2 else None)
        Gr, info = jax.vmap(solve_one, in_axes=in_axes)(self.Ar, lo, hi)
        self.admm_info = info
        self.Ar = Gr
        self.Vr = Gr / self.Sigma_r[None, :]

    def adaptive_sampling(self, P, scale_type: str = "std", seed=None):
        """Streaming variant reuses the fitted full-width spectrum (the
        influence functional needs only ``S`` and ``V`` — ``(m,)``/``(m, m)``
        — not the panel).  Requires ``scale_type`` to match the fit's."""
        if getattr(self, "_S_full", None) is None:
            raise RuntimeError(
                "call fit() before adaptive_sampling (an update_basis "
                "invalidates the fitted full-width spectrum — refit)")
        if scale_type != self.scale_type:
            raise NotImplementedError(
                "StreamingROM.adaptive_sampling reuses the fitted spectrum; "
                f"re-fit with scale_type={scale_type!r} first.")
        from scipy.stats import qmc

        S = jnp.asarray(self._S_full.astype(self.dtype))
        V = jnp.asarray(self._V_full.astype(self.dtype))
        p = V.shape[0]

        def influence(k):
            proj = jnp.eye(p, dtype=S.dtype) - jnp.outer(V[:, k], V[:, k])
            M = S[:, None] * proj
            Un, _, _ = jnp.linalg.svd(M, full_matrices=False)
            inf_ui = 1.0 / jnp.abs(jnp.diagonal(Un)) - 1.0
            return jnp.sum(S * inf_ui)

        Inf_basis = jax.vmap(influence)(jnp.arange(p))
        Inf_rel = np.asarray(Inf_basis / jnp.sum(Inf_basis))

        P = np.asarray(P)
        n_dim = P.shape[1]
        sampler = qmc.LatinHypercube(d=n_dim, seed=seed)
        nq = 100 * n_dim
        sample0 = sampler.random(n=nq)
        span = P.max(axis=0) - P.min(axis=0)
        sample = span[None, :] * sample0 + P.min(axis=0)[None, :]
        dist = np.linalg.norm(sample[:, None, :] - P[None, :, :], axis=2)
        j = np.argmin(dist, axis=1)
        pot = dist[np.arange(nq), j] * Inf_rel[j]
        return sample[np.argmax(pot), :]


    def update_basis(self, X_new, select_modes: str = "number",
                     n_modes=None, reorth: bool = True):
        """Incremental basis update without touching the original store.

        ``X_new`` may be an in-RAM ``(n, q)`` array or any
        :class:`SnapshotStore` source (an ``.npy`` path, a list of
        per-snapshot column files); new snapshots are streamed in row
        chunks, scaled with the FROZEN fit statistics, and appended via
        Brand's update (:meth:`ROM.update_basis` semantics) — the original
        snapshots are never re-read, which is the point of the streaming
        tier: assimilating q new snapshots costs O(n(r+q)) regardless of
        how many are already folded in.  The scaled ``(n, q)`` panel is
        materialized (same size class as the resident basis).

        The fitted full-width spectrum kept for ``adaptive_sampling`` no
        longer describes the enlarged set and is invalidated — refit to
        refresh it.
        """
        if not hasattr(self, "Ur"):
            raise AttributeError(
                "The fit function has to be called before update_basis.")
        n = self.store.shape[0]
        if isinstance(X_new, (np.ndarray, jax.Array)):
            Xn_h = np.asarray(X_new, dtype=self.dtype)
            if Xn_h.ndim == 1:
                Xn_h = Xn_h[:, None]
            if Xn_h.shape[0] != n:
                raise ValueError(
                    f"X_new has {Xn_h.shape[0]} rows; expected {n} "
                    f"(the fitted snapshot dimension).")
        else:
            new_store = open_store(X_new)
            if new_store.shape[0] != n:
                raise ValueError(
                    f"new source has {new_store.shape[0]} rows; expected "
                    f"{n} (the fitted snapshot dimension).")
            Xn_h = np.empty((n, new_store.shape[1]), dtype=self.dtype)
            for row0, chunk in iter_chunks(new_store, self.chunk_rows,
                                           self.dtype, self.prefetch):
                Xn_h[row0:row0 + chunk.shape[0]] = chunk
        cnt_h = np.asarray(self.X_cnt)[:, 0]
        scl_h = np.asarray(self.X_scl)[:, 0]
        X0n = jnp.asarray((Xn_h - cnt_h[:, None]) / scl_h[:, None],
                          dtype=self.Ur.dtype)
        self._update_basis_core(X0n, select_modes, n_modes, reorth)
        self._n_appended = getattr(self, "_n_appended", 0) + X0n.shape[1]
        # full-width spectrum no longer matches the enlarged snapshot set
        self._S_full = None
        self._V_full = None


class StreamingSPR(StreamingROM, SPR):
    """Out-of-core :class:`SPR`: streaming fit + the standard placement /
    train / predict stack (all of which consume only the memory-resident
    reduced quantities).  MRO: fit/CPOD from :class:`StreamingROM`;
    placement, train, predict, scale_vector from :class:`SPR`."""

    def update_basis(self, X_new, select_modes: str = "number",
                     n_modes=None, reorth: bool = True):
        """Streaming update (:meth:`StreamingROM.update_basis`) that also
        re-derives a trained sensor's ``Theta = C @ Ur``
        (:meth:`SPR.update_basis` semantics)."""
        StreamingROM.update_basis(self, X_new, select_modes=select_modes,
                                  n_modes=n_modes, reorth=reorth)
        self._refresh_theta_after_update()


class StreamingGPR(StreamingROM, GPR):
    """Out-of-core :class:`GPR`: the snapshot side of ``fit`` runs the
    streaming decomposition (the GP itself only ever consumes the tiny
    reduced quantities ``Vr`` ``(m, r)`` and the scaled parameters ``P0``
    ``(m, d)``, so train / predict / update / reconstruct / serving are
    inherited from :class:`GPR` unchanged — reference ``gpr.py:404-675``
    semantics on a snapshot matrix that never fits in RAM).

    MRO: fit spectral passes and ``update_basis`` engine from
    :class:`StreamingROM`; everything GP from :class:`GPR`.
    """

    def __init__(self, source, n_features, xyz, P,
                 gpr_type: str = "SingleTask", chunk_rows=None,
                 dtype=np.float32, prefetch: int = 2):
        StreamingROM.__init__(self, source, n_features, xyz,
                              chunk_rows=chunk_rows, dtype=dtype,
                              prefetch=prefetch)
        P = np.atleast_2d(np.asarray(P))
        self.P = P
        self.gpr_type = gpr_type
        if P.shape[0] != self.store.shape[1]:
            # reference GPR ctor validation (gpr.py:214-217)
            raise Exception(
                f"The number of parameters ({P.shape[0]}) is different"
                f" from the number of columns of X ({self.store.shape[1]})")

    def fit(self, scaleX_type: str = "std", scaleP_type: str = "std",
            axis_cnt: Optional[int] = 1, select_modes: str = "variance",
            n_modes=99, verbose: bool = False, basis=None,
            refine: Optional[int] = None, width: Optional[int] = None,
            config=None, engine: str = "host", mesh=None,
            mesh_axis: str = "state"):
        """Streaming ``GPR.fit``: :meth:`StreamingROM.fit` for the X side
        (scaling stats + spectral passes over the store; ``engine`` /
        ``refine`` / ``width`` / ``mesh`` as there — with ``mesh=`` the
        streamed basis lands row-sharded and the GP side trains on the
        replicated (m, r) coefficients unchanged), then the standard
        parameter scaling.  ``config`` overrides kwargs like
        :meth:`GPR.fit` (its ``scale_type`` applies to both X and P)."""
        if config is not None:
            scaleX_type = config.scale_type
            scaleP_type = config.scale_type
            axis_cnt = config.axis_cnt
            select_modes = config.select_modes
            n_modes = config.n_modes
        self.scaleX_type = scaleX_type
        self.scaleP_type = scaleP_type
        self.select_modes = select_modes
        self.n_modes = n_modes
        self.verbose = verbose
        StreamingROM.fit(self, scale_type=scaleX_type, axis_cnt=axis_cnt,
                         select_modes=select_modes, n_modes=n_modes,
                         basis=basis, refine=refine, width=width,
                         engine=engine, mesh=mesh, mesh_axis=mesh_axis)
        self.d = self.P.shape[1]
        self.P0 = self.scale_GPR_data(self.P, scaleP_type)

    def update_basis(self, X_new, P_new, select_modes: str = "number",
                     n_modes=None, reorth: bool = True,
                     retrain: bool = False, verbose: bool = False):
        """Streaming basis + GP-training-set assimilation:
        :meth:`StreamingROM.update_basis` for the snapshot side (``X_new``
        may be an array or any store source — only the NEW snapshots are
        read), then the :meth:`GPR.update_basis` bookkeeping (frozen
        parameter stats, re-set training set, optional warm-start
        retrain)."""
        self._guard_pigpr_retrain(retrain)
        self._guard_no_orphaned_updates()
        if isinstance(X_new, (np.ndarray, jax.Array)):
            q = 1 if np.ndim(X_new) == 1 else np.shape(X_new)[1]
        else:
            q = open_store(X_new).shape[1]
        P_new = self._validate_update_params(P_new, q)
        trained = hasattr(self, "params")
        r_old = self.r
        StreamingROM.update_basis(self, X_new, select_modes=select_modes,
                                  n_modes=n_modes, reorth=reorth)
        self._assimilate_params_after_update(P_new, trained, r_old,
                                             retrain, verbose)


class StreamingPIGPR(StreamingGPR, PIGPR):
    """Out-of-core :class:`PIGPR`: streamed snapshot side
    (:meth:`StreamingGPR.fit`), physics-informed added-loss training and
    prediction from :class:`PIGPR` (MRO: StreamingGPR -> StreamingROM ->
    PIGPR -> GPR)."""

    def __init__(self, source, n_features, xyz, P, P_cstr, AddedLoss,
                 chunk_rows=None, dtype=np.float32, prefetch: int = 2):
        StreamingGPR.__init__(self, source, n_features, xyz, P,
                              gpr_type="MultiTask", chunk_rows=chunk_rows,
                              dtype=dtype, prefetch=prefetch)
        self.P_cstr = P_cstr
        self.AddedLoss = AddedLoss

    def update_basis(self, X_new, P_new, select_modes: str = "number",
                     n_modes=None, reorth: bool = True,
                     retrain: bool = False, verbose: bool = False):
        """Streaming assimilation with :meth:`PIGPR.update_basis`'s
        contract — ``retrain=True`` is rejected (the standard warm-start
        loop would drop the added-loss term; call :meth:`train` after the
        update instead)."""
        if retrain:
            raise ValueError(
                "PIGPR.update_basis cannot retrain with the standard loop "
                "(it would drop the added-loss term); update with "
                "retrain=False and call train() again.")
        StreamingGPR.update_basis(self, X_new, P_new,
                                  select_modes=select_modes,
                                  n_modes=n_modes, reorth=reorth,
                                  retrain=False, verbose=verbose)


class StreamingDMD(StreamingROM, _DMD_base):
    """Out-of-core DMD: spectrum/modes/forecasts of a time-ordered snapshot
    series streamed from disk (the in-core :class:`~openmeasure_tpu.DMD`
    needs the full matrix in RAM; the reference has neither).

    The trick that makes this cheap: the full f64 snapshot Gram
    ``G = X0^T X0`` already contains the entire DMD identification —
    ``X1^T X1 = G[:-1, :-1]`` (the basis), ``X1^T X2 = G[:-1, 1:]`` (the
    cross term), and the projected coefficients of every snapshot
    ``X0^T Ur = G[:, :-1] V_r S_r^{-1}``.  So the whole fit is the standard
    stats pass + ONE f64 Gram disk pass + ONE narrow panel pass assembling
    the two (n, r) forecast panels (``Ur`` from the X1 columns, the exact-
    mode panel ``B = X2 V_r S_r^{-1}`` from the X2 columns of the same
    chunks) — X0 is never materialized.  Spectrum/amplitudes are the same
    host-f64 computation as the in-core class; sign flips of the Gram
    eigenvectors cancel between panels and amplitudes, so forecasts match
    the in-core fit to fp32 storage round-off (parity-tested).
    """

    def fit(self, dt: float = 1.0, scale_type: str = "std",
            axis_cnt: Optional[int] = 1, select_modes: str = "variance",
            n_modes=99):
        self.scale_type = scale_type
        self.dt = float(dt)
        n, m = self.store.shape
        self._m = m
        if m < 2:
            raise ValueError("DMD needs at least 2 time-ordered snapshots.")

        # pass 1 — scaling stats, fused with the raw block Grams (the
        # full-series scaled-centered Gram is then algebraic — no pass 2)
        cnt_h, scl_h, stats, scl_blocks = self._stream_scaling(
            scale_type, axis_cnt, want_gram=True)
        self.X_cnt = jnp.asarray(cnt_h[:, None])
        self.X_scl = jnp.asarray(scl_h[:, None])
        self._cnt_vector_cache = None
        cnt64 = cnt_h.astype(np.float64)
        scl64 = scl_h.astype(np.float64)

        G = self._assemble_gram(stats, scl_blocks, axis_cnt, cnt64, scl64)

        # host spectral step on the X1 block
        V, S2, r = self._rank_from_gram(G[:-1, :-1], select_modes, n_modes)
        S1 = np.sqrt(S2)
        # numerical-rank clamp, mirroring the in-core DMD: inverting
        # noise-floor singular values fabricates spurious spectrum
        floor = np.finfo(self.dtype).eps * S1.max() \
            * float(n) ** 0.5
        r_num = int(np.sum(S1 > floor))
        if r > r_num:
            import warnings
            warnings.warn(
                f"DMD rank clamped {r} -> {r_num}: requested mode count "
                "exceeds the series' numerical rank.", stacklevel=2)
            r = max(r_num, 1)
            self.r = r
        # div-by-zero guard only (rank selection should stay above the
        # noise floor; a zero singular value here means the user forced
        # n_modes past the series' rank)
        Sr = np.maximum(S1[:r], np.finfo(np.float64).tiny)
        Wf = V[:, :r] / Sr[None, :]                       # (m-1, r)
        A_tilde = Wf.T @ G[:-1, 1:] @ Wf                  # Ur^T X2 V S^-1
        self.A_tilde = A_tilde
        self.Sigma_r = jnp.asarray(Sr.astype(self.dtype))
        self.Vr = jnp.asarray(V[:, :r].astype(self.dtype))
        self.Ar = jnp.asarray((G[:, :-1] @ Wf).astype(self.dtype))

        lam, W = np.linalg.eig(A_tilde)
        a0 = Sr * V[0, :r]
        b, *_ = np.linalg.lstsq(W, a0.astype(np.complex128), rcond=None)
        be, *_ = np.linalg.lstsq(W * lam[None, :],
                                 a0.astype(np.complex128), rcond=None)
        self.eigs, self.W = lam, W
        self.amplitudes, self._b_exact = b, be
        with np.errstate(divide="ignore", invalid="ignore"):
            self.omega = np.log(lam.astype(np.complex128)) / self.dt

        # pass 3 — the two (n, r) forecast panels from the same chunks
        U_h = np.empty((n, r), dtype=self.dtype)
        B_h = np.empty((n, r), dtype=self.dtype)
        for row0, chunk in self._chunks():
            c = chunk.shape[0]
            x0 = (chunk.astype(np.float64)
                  - cnt64[row0:row0 + c, None]) / scl64[row0:row0 + c, None]
            U_h[row0:row0 + c] = (x0[:, :-1] @ Wf).astype(self.dtype)
            B_h[row0:row0 + c] = (x0[:, 1:] @ Wf).astype(self.dtype)
        self.Ur = jnp.asarray(U_h)
        self._B = jnp.asarray(B_h)
        self._invalidate_trained_state()

    def update_basis(self, *args, **kwargs):
        """Disabled, like the in-core DMD: the incremental POD update would
        decouple the basis from the identified propagator — refit on the
        extended store instead."""
        raise NotImplementedError(
            "StreamingDMD.update_basis is not supported (the propagator is "
            "tied to the fitted basis); call fit() on the extended store.")
