"""Multifidelity fusion: CoKriging with Procrustes manifold alignment.

API-parity re-implementation of the reference ``CoKriging``
(``cokriging.py:19-144``): two snapshot sets of different fidelity are
reduced by POD, the low-fidelity scores are aligned to the high-fidelity
latent space by a scaled Procrustes rotation, and a recursive two-fidelity
kriging model (``openmeasure_tpu.multifi.mfk``) is fit per latent dimension.

Deviations from reference quirks (SURVEY §4):

* ``predict`` evaluates each latent model once (the reference calls
  ``model.predict`` twice per dim, ``cokriging.py:132-133``), and all
  per-column unscaling is one fused pass;
* ``fit`` pairs the LF kriging level's parameters with its scores in the
  SAME (linked, unlinked) order — the reference concatenates the
  parameters (unlinked, linked) against (linked, unlinked)-ordered scores
  (``cokriging.py:110``), scrambling every (x, y) pair whenever the two
  sets differ (numeric results differ from the reference for non-empty
  ``X_train_u``; the fixed pairing is the evidently intended one);
* truncated ``predict(n_truncated=k)`` projects with the first k columns
  of ``Ur_hf`` — the reference's full-basis product shape-errors for any
  ``k < n_latent`` (``cokriging.py:135``); requesting MORE than
  ``n_latent`` (or a negative k) raises here where the reference's
  late ``IndexError`` / silent negative slice would;
* a re-run of ``manifold_alignment`` invalidates a previously fitted
  kriging model (the latent coordinates changed) — predict demands
  ``fit`` again instead of silently projecting stale latent outputs
  through the new basis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..rom.rom import ROM, _as_device
from ..linalg import svd as _svd


class CoKriging:
    """Reference constructor signature (``cokriging.py:20-42``); the
    regression/θ knobs are mutable public attributes, as in the reference."""

    def __init__(self, X_train_l, X_train_u, Y_train_lf_l, Y_train_lf_u,
                 Y_train_hf_l, xyz_lf, xyz_hf, n_features, config=None):
        self.X_train_l = X_train_l      # linked parameters
        self.X_train_u = X_train_u      # unlinked parameters
        self.Y_train_lf_l = Y_train_lf_l
        self.Y_train_lf_u = Y_train_lf_u
        self.Y_train_hf_l = Y_train_hf_l
        self.xyz_lf = xyz_lf
        self.xyz_hf = xyz_hf
        self.n_features = n_features
        self.n_linked = X_train_l.shape[0]
        self.n_unlinked = X_train_u.shape[0]
        self.n_latent = 0
        self.scale_type = "std"
        self.regr_type = "linear"
        self.rho_regr = "constant"
        self.normalize = True
        self.theta = None
        self.theta0 = None
        self.thetaL = None
        self.thetaU = None
        self.initial_range = 0.3
        self.tol = 1e-6
        # 'device' (default, ambient fp32 on TPU) or 'host': run the
        # latent kriging fits/predictions on the host CPU in float64
        # (core.host64) — the reference's numerics (OpenMDAO
        # MultiFiCoKriging is f64 scipy, cokriging.py:115-119) on top of
        # the device-fit manifold alignment.  The latent problems are
        # tiny (n ≈ tens), so the f64 stage is nearly free; the x64 probe
        # pins f64 agreement with the reference op set at 8.8e-8 where
        # the fp32 chain sits at ~3e-4 (BASELINE.md).
        self.engine = "device"
        if config is not None:
            # CoKrigingConfig fields map 1:1 onto the reference's mutable
            # public knobs (cokriging.py:33-42)
            import dataclasses as _dc
            for f in _dc.fields(config):
                setattr(self, f.name, getattr(config, f.name))

        if (Y_train_lf_l.shape[1] != self.n_linked
                or Y_train_hf_l.shape[1] != self.n_linked):
            # message matches the reference byte-for-byte, including the
            # newline + indentation its triple-quoted literal embeds
            # (cokriging.py:45-47) — error-surface parity
            raise Exception(
                "The number of linked conditions does not correspond to the"
                " number of columns of\n            Y_train_lf_l or"
                " Y_train_hf_l")
        if Y_train_lf_u.shape[1] != self.n_unlinked:
            raise Exception(
                "The number of unlinked conditions does not correspond to"
                " the number of columns of\n            Y_train_lf_u")

    # ------------------------------------------------------------------ #

    def manifold_alignment(self, select_modes: str = "variance",
                           n_modes_hf=99, n_modes_lf=99):
        """POD both fidelities, truncate, zero-pad, center, and align the LF
        scores onto the HF latent space with a scaled Procrustes rotation
        (reference ``cokriging.py:55-107``)."""
        self.rom_hf = ROM(self.Y_train_hf_l, self.n_features, self.xyz_hf)
        self.rom_lf = ROM(
            np.concatenate((self.Y_train_lf_l, self.Y_train_lf_u), axis=1),
            self.n_features, self.xyz_lf)

        X0_hf = self.rom_hf.scale_data(self.scale_type)
        X0_lf = self.rom_lf.scale_data(self.scale_type)

        U_hf, Sigma_hf, Vt_hf = _svd.svd_tall_safe(_as_device(X0_hf))
        U_lf, Sigma_lf, Vt_lf = _svd.svd_tall_safe(_as_device(X0_lf))
        self.Sigma_hf = Sigma_hf
        self.Sigma_lf = Sigma_lf

        Z_hf = Sigma_hf[:, None] * Vt_hf   # scores: (m_hf, m_hf)
        Z_lf = Sigma_lf[:, None] * Vt_lf

        ev_hf = _svd.explained_variance(Sigma_hf)
        ev_lf = _svd.explained_variance(Sigma_lf)

        Ur_hf, Zr_hf_t = self.rom_hf.reduction(U_hf, Z_hf.T, ev_hf,
                                               select_modes, n_modes_hf)
        Ur_lf, Zr_lf_t = self.rom_lf.reduction(U_lf, Z_lf.T, ev_lf,
                                               select_modes, n_modes_lf)
        Zr_hf = Zr_hf_t.T
        Zr_lf = Zr_lf_t.T
        self.r_hf = Ur_hf.shape[1]
        self.r_lf = Ur_lf.shape[1]

        if self.r_lf < self.r_hf:
            pad = jnp.zeros((self.r_hf - self.r_lf, Zr_lf.shape[1]),
                            dtype=Zr_lf.dtype)
            Zr_lf = jnp.concatenate([Zr_lf, pad], axis=0)

        Zr_lf_l = Zr_lf[:, : self.n_linked]

        Z0r_hf = Zr_hf - jnp.mean(Zr_hf, axis=1, keepdims=True)
        Z0r_lf_l = Zr_lf_l - jnp.mean(Zr_lf_l, axis=1, keepdims=True)

        # Scaled Procrustes: rotation + isotropic scale of LF onto HF
        # scores.  Full fp32 products regardless of the ambient matmul-
        # precision default (alignment fidelity sets prediction accuracy).
        hp = jax.lax.Precision.HIGHEST
        Ua, Sa, Vat = jnp.linalg.svd(
            jnp.matmul(Z0r_lf_l, Z0r_hf.T, precision=hp),
            full_matrices=False)
        # tr(Z Z^T) == ||Z||_F^2: O(r n) elementwise, not an O(r^2 n)
        # Gram materialized for its trace
        sr = jnp.sum(Sa) / jnp.sum(Z0r_lf_l * Z0r_lf_l)
        Qr = jnp.matmul(Vat.T, Ua.T, precision=hp)
        Zr_aligned = sr * jnp.matmul(Qr, Zr_lf, precision=hp)

        self.n_latent = int(Zr_aligned.shape[0])
        self.Zr_aligned = Zr_aligned
        self.Ur_hf = Ur_hf
        self.Zr_hf = Zr_hf
        # re-alignment changes the latent coordinates: a previously
        # fitted kriging model would be silently projected through the
        # NEW basis — drop it so predict demands fit() again
        for a in ("_batch", "model_list"):
            if hasattr(self, a):
                delattr(self, a)

    # ------------------------------------------------------------------ #

    def fit(self):
        # Deviation from the reference (cokriging.py:110): it concatenates
        # the LF parameters as (unlinked, linked) while the aligned LF scores
        # are ordered (linked, unlinked) from manifold_alignment — scrambling
        # every (x, y) pair of the LF kriging level whenever the two sets
        # differ.  We pair them correctly: linked first, matching the score
        # column order.
        X_train = np.concatenate(
            (np.asarray(self.X_train_l), np.asarray(self.X_train_u)), axis=0)
        Za = np.asarray(self.Zr_aligned)
        Zh = np.asarray(self.Zr_hf)

        # All latent dimensions share the same parameter sets, so the K
        # models fit as ONE batched program per level (θ optimization
        # vmapped over outputs×starts) instead of a Python loop of K
        # independent fits; model_list keeps the per-model view API.
        from .mfk import BatchedMFK, _BatchedMFKView
        self._batch = BatchedMFK(
            regr=self.regr_type, rho_regr=self.rho_regr, theta=self.theta,
            theta0=self.theta0, thetaL=self.thetaL, thetaU=self.thetaU,
            normalize=self.normalize, engine=self.engine)
        self._batch.fit([X_train, np.asarray(self.X_train_l)], [Za, Zh],
                        initial_range=self.initial_range, tol=self.tol)
        self.model_list = [_BatchedMFKView(self._batch, k)
                           for k in range(self.n_latent)]

    def predict(self, X_test, n_truncated: Optional[int] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
        n_test = X_test.shape[0]
        if not hasattr(self, "_batch") and not hasattr(self, "model_list"):
            raise AttributeError(
                "The fit function has to be called before predict "
                "(re-running manifold_alignment invalidates a previous "
                "fit).")
        if n_truncated is None:
            n_truncated = self.n_latent
        if not 0 < int(n_truncated) <= self.n_latent:
            # loud, like the reference's IndexError at model_list[k] —
            # silently clamping would hand back a full-rank prediction
            # the caller believes is truncated (or a negative-slice one)
            raise ValueError(
                f"n_truncated must be in [1, n_latent={self.n_latent}]; "
                f"got {n_truncated}.")

        if hasattr(self, "_batch"):
            Z_pred, Z_mse = self._batch.predict(np.asarray(X_test),
                                                n_outputs=n_truncated)
        else:  # model_list supplied externally
            Z_pred = np.zeros((n_truncated, n_test))
            Z_mse = np.zeros((n_truncated, n_test))
            for i in range(n_truncated):
                mean, mse = self.model_list[i].predict(X_test)
                Z_pred[i, :] = mean.ravel()
                Z_mse[i, :] = mse.ravel()

        # The reference projects with the full Ur_hf, which shape-errors for
        # n_truncated < n_latent (cokriging.py:135); use the first
        # n_truncated columns — the evidently intended truncation.
        Ur = self.Ur_hf[:, :n_truncated]
        hp = jax.lax.Precision.HIGHEST
        Y0_pred = jnp.matmul(Ur, jnp.asarray(Z_pred), precision=hp)
        Y0_mse = jnp.matmul(Ur, jnp.asarray(Z_mse), precision=hp)
        Y_pred = self.rom_hf.unscale_data(Y0_pred)
        Y_mse = self.rom_hf.unscale_data(Y0_mse)
        return np.asarray(Y_pred), np.asarray(Y_mse)
