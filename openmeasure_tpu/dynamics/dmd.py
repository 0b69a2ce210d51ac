"""Dynamic mode decomposition of the snapshot series.

Capability beyond the reference: it treats the snapshot matrix as an
unordered ensemble (``ROM.fit``, ``sparse_sensing.py:463-511``) and has no
temporal analysis at all.  When the snapshots are a time series with uniform
spacing ``dt``, DMD (Schmid, JFM 656, 2010; Tu et al., J. Comput. Dyn. 1,
2014 — "exact DMD") extracts the spectrum of the best-fit linear propagator:
growth rates, frequencies, and spatial modes, plus a forecast.

TPU-first shape: the tall work is the SAME Gram-route panel passes the POD
fit uses (``linalg.svd.svd_tall_safe`` + two (n, ·) HIGHEST matmuls); the
(r, r) eigendecomposition and the complex time dynamics run on host float64
(device has no nonsymmetric eig; r is tiny, so this costs microseconds and
keeps ill-conditioned Vandermonde products in f64 — the same split as the
host-side rank selection).  Forecasts never put complex numbers on the
device: for any mode family the predicted field is
``panel @ real(W diag(lam^k) b)`` — a real (r, K) host product followed by
one real device panel matmul.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..rom.rom import ROM, _as_device
from ..linalg import svd as _svd

_HP = jax.lax.Precision.HIGHEST


class DMD(ROM):
    """Exact/projected DMD over the house data model.

    Same constructor as :class:`openmeasure_tpu.ROM` (feature-blocked
    snapshot matrix); :meth:`fit` additionally takes the sampling interval
    ``dt``.  Scaling follows the house contract (all 14 scale types, stats
    over the full series), so modes and forecasts live in the same scaled
    space as every other model — a forecast is unscaled exactly like a
    reconstruction.

    After :meth:`fit`:

    - ``eigs`` (r,) complex — discrete-time eigenvalues (per ``dt`` step)
    - ``omega`` (r,) complex — continuous-time: ``log(eigs)/dt``
    - ``amplitudes`` (r,) complex — first-snapshot mode loadings
    - ``modes(exact=...)`` — complex (n, r) spatial modes
    - ``forecast(k)`` / ``forecast_horizon(q)`` / ``reconstruct_dmd()``
    """

    def fit(self, dt: float = 1.0, scale_type: str = "std",
            axis_cnt: Optional[int] = 1, select_modes: str = "variance",
            n_modes=99):
        """Identify basis + propagator from the time-ordered snapshots.

        The basis is the thin SVD of the first m-1 snapshots (the DMD
        convention — the propagator maps column k to k+1), truncated by the
        house ``select_modes``/``n_modes`` rule; the reduced operator is
        ``A_tilde = Ur^T X2 V_r S_r^{-1}`` at HIGHEST precision.
        """
        self.scale_type = scale_type
        if not float(dt) > 0.0:
            raise ValueError(
                f"dt must be a positive sampling interval; got {dt} "
                "(dt=0 makes every continuous-time rate infinite, a "
                "negative dt flips growth/decay).")
        self.dt = float(dt)
        self.X0 = self.scale_data(scale_type, axis_cnt)
        m = self.X0.shape[1]
        self._m = m        # snapshot count (forecast index math; the
        #                    streaming subclass has no in-core X0)
        if m < 2:
            raise ValueError("DMD needs at least 2 time-ordered snapshots.")
        X1 = self.X0[:, :-1]
        X2 = self.X0[:, 1:]

        U, S, Vt = _svd.svd_tall_safe(X1)
        exp_var = _svd.explained_variance(S)
        r = _svd.select_rank(exp_var, select_modes, n_modes, S.shape[0])
        # clamp to the NUMERICAL rank: B divides by Sr, and noise-floor
        # singular values (a requested mode count beyond the series' true
        # rank) would fabricate a garbage spectrum — including spurious
        # GROWING modes — with no error (same eps·max·√n deficiency
        # threshold as svd_tall_safe)
        S_np = np.asarray(S, np.float64)
        floor = np.finfo(np.asarray(X1).dtype).eps * S_np.max() \
            * float(X1.shape[0]) ** 0.5
        r_num = int(np.sum(S_np > floor))
        if r > r_num:
            warnings.warn(
                f"DMD rank clamped {r} -> {r_num}: the requested mode "
                "count exceeds the series' numerical rank; the dropped "
                "directions are noise-floor singular values whose "
                "inversion would fabricate spurious spectrum.",
                stacklevel=2)
            r = max(r_num, 1)
        self.r = r
        Ur, Sr, Vrt = U[:, :r], S[:r], Vt[:r]

        # B = X2 V_r S_r^{-1} (n, r): one panel pass; doubles as the exact-
        # mode panel (Phi_exact = B W) and the projected operator's factor
        B = jnp.matmul(X2, (Vrt.T / Sr[None, :]), precision=_HP)
        A_tilde = jnp.matmul(Ur.T, B, precision=_HP)            # (r, r)

        self.Ur = Ur
        self.Sigma_r = Sr
        self.Vr = Vrt.T                 # house post-fit contract (rom.py)
        self._B = B
        # projected coefficients of ALL m snapshots in the X1 basis — the
        # quantity downstream dynamics identification consumes (one row per
        # snapshot, the house Ar layout)
        self.Ar = jnp.matmul(self.X0.T, Ur, precision=_HP)
        self.A_tilde = np.asarray(A_tilde, dtype=np.float64)

        # host f64 spectral analysis of the tiny operator
        lam, W = np.linalg.eig(self.A_tilde)
        a0 = np.asarray(Sr, np.float64) * np.asarray(Vrt, np.float64)[:, 0]
        # lstsq, not solve: a defective/near-defective A_tilde (repeated
        # eigenvalues) makes W ill-conditioned; least-squares amplitudes
        # still reproduce the representable part
        b, *_ = np.linalg.lstsq(W, a0.astype(np.complex128), rcond=None)
        # exact-mode amplitudes: the exact panel satisfies Ur^T (B W) =
        # A_tilde W = W Lam, so anchoring x_0 = Phi_exact b_e means
        # solving (W Lam) b_e = a0 — NOT b_e = b (that would shift the
        # whole series one step: Phi_exact = Phi_proj Lam on rank-r data)
        be, *_ = np.linalg.lstsq(W * lam[None, :],
                                 a0.astype(np.complex128), rcond=None)
        self.eigs = lam
        self.W = W
        self.amplitudes = b
        self._b_exact = be
        with np.errstate(divide="ignore", invalid="ignore"):
            self.omega = np.log(lam.astype(np.complex128)) / self.dt
        self._invalidate_trained_state()

    # ------------------------------------------------------------------ #

    @property
    def frequencies(self) -> np.ndarray:
        """Oscillation frequencies in cycles per time unit (Im(omega)/2pi)."""
        return np.imag(self.omega) / (2.0 * np.pi)

    @property
    def growth_rates(self) -> np.ndarray:
        """Continuous-time growth/decay rates (Re(omega))."""
        return np.real(self.omega)

    def modes(self, exact: bool = True) -> np.ndarray:
        """Complex (n, r) spatial modes (host numpy).

        ``exact=True``: Tu et al.'s exact DMD modes ``X2 V S^{-1} W`` —
        eigenvectors of the full-space propagator restricted to the data.
        ``exact=False``: projected modes ``Ur W`` (orthogonal-projection
        variant, Schmid's original).
        """
        panel = self._B if exact else self.Ur
        return np.asarray(panel, dtype=np.float64) @ self.W

    # ------------------------------------------------------------------ #

    def _dynamics(self, k: np.ndarray, exact: bool) -> np.ndarray:
        """Real (r, K) reduced trajectory ``real(W diag(lam^k) b)`` at
        snapshot indices k — host complex128 (Vandermonde powers are
        ill-conditioned; f32 would lose the decaying tail).  The
        amplitude vector matches the panel convention (see fit)."""
        lam = self.eigs.astype(np.complex128)
        b = self._b_exact if exact else self.amplitudes
        T = b[:, None] * np.power(lam[:, None],
                                  k[None, :].astype(np.float64))
        return np.real(self.W @ T)

    def forecast(self, indices, exact: bool = True) -> jax.Array:
        """Predicted snapshots at integer indices (0 = first training
        snapshot; values beyond m-1 extrapolate).  Returns the UNSCALED
        (n, K) field matrix: one real device panel matmul + the shared
        unscale pass."""
        if not hasattr(self, "eigs"):
            raise AttributeError(
                "The fit function has to be called before forecast.")
        k = np.atleast_1d(np.asarray(indices))
        if k.ndim != 1:
            raise ValueError("indices must be a scalar or 1-D array.")
        if not np.all(np.equal(np.mod(k, 1), 0)):
            raise ValueError(
                "forecast indices must be integers (snapshot steps): a "
                "fractional power of a negative/complex eigenvalue takes "
                "the principal branch and real() silently zeroes it — "
                "not an interpolant.")
        A_dyn = self._dynamics(k, exact)
        panel = self._B if exact else self.Ur
        X0_hat = jnp.matmul(panel,
                            jnp.asarray(A_dyn.astype(panel.dtype)),
                            precision=_HP)
        return _as_device(self.unscale_data(X0_hat))

    def forecast_horizon(self, q: int, exact: bool = True) -> jax.Array:
        """The q snapshots FOLLOWING the training series (indices m..m+q-1)."""
        m = self._m
        return self.forecast(np.arange(m, m + q), exact=exact)

    def reconstruct_dmd(self, exact: bool = True) -> jax.Array:
        """DMD reconstruction of the full training series (indices 0..m-1)."""
        return self.forecast(np.arange(self._m), exact=exact)

    # ------------------------------------------------------------------ #

    def update_basis(self, *args, **kwargs):
        """Disabled: the incremental POD update would silently decouple the
        basis from the identified propagator/spectrum — refit instead."""
        raise NotImplementedError(
            "DMD.update_basis is not supported (the propagator is tied to "
            "the fitted basis); call fit() on the extended series.")
