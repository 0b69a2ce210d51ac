"""Incremental thin-SVD basis updates (linalg.incremental + ROM.update_basis).

The reference has no incremental update (a full refit recomputes the SVD,
``sparse_sensing.py:463-511``) — correctness here is against direct
numpy SVD oracles of the matrix the update claims to factorize.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from openmeasure_tpu.linalg.incremental import svd_append_columns
from openmeasure_tpu import ROM, SPR


def _thin_svd(X):
    U, S, Vt = np.linalg.svd(X, full_matrices=False)
    return U, S, Vt


class TestSvdAppendColumns:
    def test_full_rank_exact_vs_direct_svd(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((60, 8))
        B = rng.standard_normal((60, 3))
        U, S, Vt = _thin_svd(A)
        U2, S2, Vt2 = svd_append_columns(jnp.asarray(U), jnp.asarray(S),
                                         jnp.asarray(Vt), jnp.asarray(B))
        S_ref = np.linalg.svd(np.concatenate([A, B], axis=1),
                              compute_uv=False)
        np.testing.assert_allclose(np.asarray(S2), S_ref, rtol=1e-10)
        # the factorization reproduces the concatenation exactly
        rec = np.asarray(U2) @ np.diag(np.asarray(S2)) @ np.asarray(Vt2)
        np.testing.assert_allclose(rec, np.concatenate([A, B], axis=1),
                                   atol=1e-10)

    def test_truncated_start_exact_for_represented_matrix(self):
        rng = np.random.default_rng(1)
        A = rng.standard_normal((50, 7))
        B = rng.standard_normal((50, 2))
        U, S, Vt = _thin_svd(A)
        r = 4
        Ur, Sr, Vtr = U[:, :r], S[:r], Vt[:r, :]
        U2, S2, Vt2 = svd_append_columns(jnp.asarray(Ur), jnp.asarray(Sr),
                                         jnp.asarray(Vtr), jnp.asarray(B))
        # exact statement: the update factorizes [Ur Sr Vtr, B]
        M_rep = np.concatenate([Ur @ np.diag(Sr) @ Vtr, B], axis=1)
        S_ref = np.linalg.svd(M_rep, compute_uv=False)
        np.testing.assert_allclose(np.asarray(S2), S_ref[:r + 2], rtol=1e-10)
        rec = np.asarray(U2) @ np.diag(np.asarray(S2)) @ np.asarray(Vt2)
        np.testing.assert_allclose(rec, M_rep, atol=1e-10)

    def test_orthonormal_even_when_in_span(self):
        # new columns (numerically) inside span(U): the residual QR is rank-
        # deficient; U' must stay orthonormal and the junk singular values ~0
        rng = np.random.default_rng(2)
        A = rng.standard_normal((40, 5))
        U, S, Vt = _thin_svd(A)
        B = U @ rng.standard_normal((5, 2))          # exactly in span
        U2, S2, _ = svd_append_columns(jnp.asarray(U), jnp.asarray(S),
                                       jnp.asarray(Vt), jnp.asarray(B))
        G = np.asarray(U2).T @ np.asarray(U2)
        np.testing.assert_allclose(G, np.eye(7), atol=1e-8)
        assert np.asarray(S2)[-2:].max() <= 1e-8 * np.asarray(S2)[0]

    def test_right_factors_orthonormal(self):
        rng = np.random.default_rng(3)
        A = rng.standard_normal((30, 6))
        B = rng.standard_normal((30, 2))
        U, S, Vt = _thin_svd(A)
        _, _, Vt2 = svd_append_columns(jnp.asarray(U), jnp.asarray(S),
                                       jnp.asarray(Vt), jnp.asarray(B))
        V2 = np.asarray(Vt2).T
        np.testing.assert_allclose(V2.T @ V2, np.eye(8), atol=1e-10)


class TestEagerHostCoreVariant:
    def test_matches_jitted_variant(self):
        # the production eager path (host-f64 core SVD — accurate tails on
        # the real TPU, see incremental.py) must agree with the jitted
        # variant on CPU where both cores are LAPACK
        from openmeasure_tpu.linalg.incremental import (
            svd_append_columns_eager)
        rng = np.random.default_rng(14)
        A = rng.standard_normal((50, 7))
        B = rng.standard_normal((50, 2))
        U, S, Vt = _thin_svd(A)
        out_j = svd_append_columns(jnp.asarray(U), jnp.asarray(S),
                                   jnp.asarray(Vt), jnp.asarray(B))
        out_e = svd_append_columns_eager(jnp.asarray(U), jnp.asarray(S),
                                         jnp.asarray(Vt), jnp.asarray(B))
        for a, b in zip(out_e, out_j):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-9)

    def test_fp32_inputs_get_f64_core_accuracy(self):
        # ill-conditioned spectrum in fp32: the host-f64 core must recover
        # tail singular values to entry-noise accuracy
        from openmeasure_tpu.linalg.incremental import (
            svd_append_columns_eager)
        rng = np.random.default_rng(15)
        n, r = 400, 6
        Uo = np.linalg.qr(rng.standard_normal((n, r + 2)))[0]
        S_true = np.array([1e3, 1e2, 1e1, 1.0, 1e-2, 1e-3])
        Vo = np.linalg.qr(rng.standard_normal((10, r)))[0]
        A = (Uo[:, :r] * S_true) @ Vo.T
        U, S, Vt = np.linalg.svd(A.astype(np.float32), full_matrices=False)
        B = (Uo[:, r:] @ rng.standard_normal((2, 3))).astype(np.float32)
        U2, S2, _ = svd_append_columns_eager(
            jnp.asarray(U[:, :r], jnp.float32),
            jnp.asarray(S[:r], jnp.float32),
            jnp.asarray(Vt[:r], jnp.float32), jnp.asarray(B, jnp.float32))
        M_rep = np.concatenate(
            [U[:, :r].astype(np.float64) @ np.diag(S[:r].astype(np.float64))
             @ Vt[:r].astype(np.float64), B.astype(np.float64)], axis=1)
        S_ref = np.linalg.svd(M_rep, compute_uv=False)
        # B spans only 2 fresh directions, so σ9 of the concat is exactly 0
        # — compare the r+2 genuine values
        rel = np.abs(np.asarray(S2, np.float64)[:r + 2] - S_ref[:r + 2]) \
            / S_ref[:r + 2]
        assert rel.max() < 1e-3, rel


class TestCholQRVariant:
    def test_matches_householder_variant(self):
        from openmeasure_tpu.linalg.incremental import (
            svd_append_columns_cholqr)
        rng = np.random.default_rng(8)
        A = rng.standard_normal((60, 8))
        B = rng.standard_normal((60, 3))
        U, S, Vt = _thin_svd(A)
        U1, S1, Vt1 = svd_append_columns(jnp.asarray(U), jnp.asarray(S),
                                         jnp.asarray(Vt), jnp.asarray(B))
        U2, S2, Vt2 = svd_append_columns_cholqr(
            jnp.asarray(U), jnp.asarray(S), jnp.asarray(Vt), jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(S2), np.asarray(S1), rtol=1e-9)
        rec1 = np.asarray(U1) @ np.diag(np.asarray(S1)) @ np.asarray(Vt1)
        rec2 = np.asarray(U2) @ np.diag(np.asarray(S2)) @ np.asarray(Vt2)
        np.testing.assert_allclose(rec2, rec1, atol=1e-9)
        G = np.asarray(U2).T @ np.asarray(U2)
        np.testing.assert_allclose(G, np.eye(11), atol=1e-7)

    def test_fp32_large_n_near_span_residual_stays_finite(self):
        """fp32 at streaming scale with new snapshots NEARLY in span(U):
        the computed residual Gram carries ~sqrt(n)*eps accumulation noise
        and can be indefinite — the eigh-based factor must never NaN
        (a ridged Cholesky silently did) and the update must stay
        orthonormal + exact on the represented matrix."""
        from openmeasure_tpu.linalg.incremental import (
            svd_append_columns_cholqr)
        rng = np.random.default_rng(11)
        n, r, q = 200_000, 6, 3
        A = (rng.standard_normal((n, r)) * np.geomspace(50, 1, r)).astype(
            np.float32) @ rng.standard_normal((r, 10)).astype(np.float32)
        U, S, Vt = _thin_svd(np.asarray(A, np.float64))
        U = U[:, :r].astype(np.float32)
        S, Vt = S[:r].astype(np.float32), Vt[:r].astype(np.float32)
        # almost-in-span columns: residual ~1e-5 of the data scale
        B = (U @ rng.standard_normal((r, q)).astype(np.float32)
             + 1e-5 * rng.standard_normal((n, q)).astype(np.float32))
        U2, S2, Vt2 = svd_append_columns_cholqr(
            jnp.asarray(U), jnp.asarray(S), jnp.asarray(Vt),
            jnp.asarray(B))
        assert np.all(np.isfinite(np.asarray(U2)))
        assert np.all(np.isfinite(np.asarray(S2)))
        # leading block still orthonormal; represented matrix reproduced
        G = np.asarray(U2[:, :r], np.float64).T @ np.asarray(
            U2[:, :r], np.float64)
        np.testing.assert_allclose(G, np.eye(r), atol=5e-5)
        rec = np.asarray(U2, np.float64)[:, :r] \
            @ np.diag(np.asarray(S2, np.float64)[:r]) \
            @ np.asarray(Vt2, np.float64)[:r, :10]
        truth = np.asarray(U, np.float64) @ np.diag(
            np.asarray(S, np.float64)) @ np.asarray(Vt, np.float64)
        np.testing.assert_allclose(rec, truth,
                                   atol=1e-4 * np.abs(truth).max())

    def test_rank_deficient_residual_still_exact(self):
        # new columns in span(U): the floored CholQR must still reproduce
        # the concatenation (Q R == Res by construction)
        from openmeasure_tpu.linalg.incremental import (
            svd_append_columns_cholqr)
        rng = np.random.default_rng(9)
        A = rng.standard_normal((40, 5))
        U, S, Vt = _thin_svd(A)
        B = U @ rng.standard_normal((5, 2))
        U2, S2, Vt2 = svd_append_columns_cholqr(
            jnp.asarray(U), jnp.asarray(S), jnp.asarray(Vt), jnp.asarray(B))
        rec = np.asarray(U2) @ np.diag(np.asarray(S2)) @ np.asarray(Vt2)
        np.testing.assert_allclose(rec, np.concatenate([A, B], axis=1),
                                   atol=1e-8)

    def test_sharded_parity(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from openmeasure_tpu.parallel.sharded import (
            make_mesh, sharded_update_basis)
        from openmeasure_tpu.linalg.incremental import (
            svd_append_columns_cholqr)
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh(8, 1)
        rng = np.random.default_rng(10)
        A = rng.standard_normal((64, 6))
        B = rng.standard_normal((64, 2))
        U, S, Vt = _thin_svd(A)
        row = NamedSharding(mesh, P("state", None))
        with mesh:
            Ud = jax.device_put(jnp.asarray(U), row)
            Bd = jax.device_put(jnp.asarray(B), row)
            U2, S2, Vt2 = sharded_update_basis(
                Ud, jnp.asarray(S), jnp.asarray(Vt), Bd)
            U2, S2, Vt2 = map(np.asarray, (U2, S2, Vt2))
        U1, S1, Vt1 = map(np.asarray, svd_append_columns_cholqr(
            jnp.asarray(U), jnp.asarray(S), jnp.asarray(Vt),
            jnp.asarray(B)))
        np.testing.assert_allclose(S2, S1, rtol=1e-10)
        np.testing.assert_allclose(U2, U1, atol=1e-10)
        np.testing.assert_allclose(Vt2, Vt1, atol=1e-10)


class TestROMUpdateBasis:
    def _make(self, seed=0, n_points=30, n_features=2, m=8):
        rng = np.random.default_rng(seed)
        n = n_points * n_features
        X = rng.standard_normal((n, m)) * 10 + 5
        xyz = rng.random((n_points, 3))
        return X, xyz, rng

    def test_full_rank_update_matches_direct_svd_frozen_stats(self):
        X, xyz, rng = self._make()
        rom = ROM(X, 2, xyz)
        rom.fit(select_modes="number", n_modes=8)
        Xn = rng.standard_normal((X.shape[0], 3)) * 10 + 5
        cnt, scl = np.asarray(rom.X_cnt), np.asarray(rom.X_scl)
        # row-centering makes the old block rank m-1 = 7, so the enlarged
        # matrix has 10 genuine singular values; keep rank 10
        rom.update_basis(Xn, n_modes=10)
        # oracle: direct SVD of [X0_old, X0_new] with the FROZEN stats
        X0_cat = np.concatenate([(X - cnt) / scl, (Xn - cnt) / scl], axis=1)
        U_ref, S_ref, Vt_ref = _thin_svd(X0_cat)
        np.testing.assert_allclose(np.asarray(rom.Sigma_r), S_ref[:10],
                                   rtol=1e-9)
        # subspace equality (up to per-mode sign) on the well-separated modes
        dots = np.abs(np.sum(np.asarray(rom.Ur) * U_ref[:, :10], axis=0))
        np.testing.assert_allclose(dots, np.ones(10), atol=1e-7)
        # coefficients reproduce the scaled data: Ur @ Ar.T == X0_cat
        rec = np.asarray(rom.Ur) @ np.asarray(rom.Ar).T
        np.testing.assert_allclose(rec, X0_cat, atol=1e-9)
        assert rom.X.shape == (X.shape[0], 11)
        assert np.asarray(rom.X0).shape == (X.shape[0], 11)
        assert rom.r == 10 and rom.Ar.shape == (11, 10)

    def test_truncated_update_keeps_rank_and_tracks_new_snapshots(self):
        # low-rank signal + small noise: the rank-4 update must absorb a new
        # snapshot direction nearly as well as a frozen-stats refit
        rng = np.random.default_rng(4)
        n, m, r_true = 80, 10, 3
        U_sig = np.linalg.qr(rng.standard_normal((n, r_true + 1)))[0]
        X = U_sig[:, :r_true] @ rng.standard_normal((r_true, m)) * 5
        X += 0.01 * rng.standard_normal((n, m))
        rom = ROM(X, 2, rng.random((n // 2, 3)))
        rom.fit(select_modes="number", n_modes=4)
        # new snapshots excite the 4th signal direction
        Xn = (U_sig[:, [r_true]] @ rng.standard_normal((1, 3)) * 5
              + 0.01 * rng.standard_normal((n, 3)))
        cnt, scl = np.asarray(rom.X_cnt), np.asarray(rom.X_scl)
        rom.update_basis(Xn)
        assert rom.r == 4 and rom.Ur.shape == (n, 4)
        X0_cat = np.concatenate([(X - cnt) / scl, (Xn - cnt) / scl], axis=1)
        rec = np.asarray(rom.Ur) @ np.asarray(rom.Ar).T
        nrmse_up = np.linalg.norm(rec - X0_cat) / np.linalg.norm(X0_cat)
        U_ref, S_ref, Vt_ref = _thin_svd(X0_cat)
        rec_ref = U_ref[:, :4] @ np.diag(S_ref[:4]) @ Vt_ref[:4, :]
        nrmse_ref = np.linalg.norm(rec_ref - X0_cat) / np.linalg.norm(X0_cat)
        # the update started from a truncated basis, so it can only be
        # slightly worse than the oracle rank-4 refit
        assert nrmse_up <= nrmse_ref + 5e-3, (nrmse_up, nrmse_ref)

    def test_variance_mode_selection_and_validation(self):
        X, xyz, rng = self._make(seed=5)
        rom = ROM(X, 2, xyz)
        with pytest.raises(AttributeError, match="fit"):
            rom.update_basis(X[:, :1])
        rom.fit(select_modes="number", n_modes=5)
        with pytest.raises(ValueError, match="rows"):
            rom.update_basis(np.zeros((7, 2)))
        rom.update_basis(X[:, :1] * 1.1, select_modes="variance", n_modes=99)
        assert 1 <= rom.r <= 6
        # 1-D new snapshot promotes to a column
        rom.update_basis(np.asarray(X[:, 0] * 0.9))
        assert rom.X.shape[1] == 10


class TestStreamingUpdateBasis:
    def _fit_both(self, X, n_features=3, n_modes=6):
        from openmeasure_tpu.streaming import StreamingROM, ArrayStore
        rom = ROM(X, n_features, None)
        rom.fit(select_modes="number", n_modes=n_modes)
        srom = StreamingROM(ArrayStore(X), n_features, chunk_rows=17,
                            dtype=np.float64)
        srom.fit(select_modes="number", n_modes=n_modes)
        return rom, srom

    def test_array_update_matches_incore(self):
        rng = np.random.default_rng(11)
        X = rng.standard_normal((120, 10)) * 4 + 2
        rom, srom = self._fit_both(X)
        Xn = rng.standard_normal((120, 3)) * 4 + 2
        rom.update_basis(Xn)
        srom.update_basis(Xn)
        assert srom.r == rom.r
        np.testing.assert_allclose(np.asarray(srom.Sigma_r),
                                   np.asarray(rom.Sigma_r), rtol=1e-8)
        dots = np.abs(np.sum(np.asarray(srom.Ur) * np.asarray(rom.Ur),
                             axis=0))
        np.testing.assert_allclose(dots, np.ones(rom.r), atol=1e-7)

    def test_npy_source_update_and_spectrum_invalidation(self, tmp_path):
        rng = np.random.default_rng(12)
        X = rng.standard_normal((120, 10))
        rom, srom = self._fit_both(X)
        Xn = rng.standard_normal((120, 2))
        p = str(tmp_path / "new.npy")
        np.save(p, Xn)
        rom.update_basis(Xn)
        srom.update_basis(p)
        np.testing.assert_allclose(np.asarray(srom.Sigma_r),
                                   np.asarray(rom.Sigma_r), rtol=1e-8)
        assert srom._n_appended == 2
        with pytest.raises(RuntimeError, match="update_basis"):
            srom.adaptive_sampling(rng.random((5, 2)))
        with pytest.raises(ValueError, match="rows"):
            srom.update_basis(np.zeros((7, 1)))

    def test_host_engine_tail_modes_stay_unit_norm(self):
        # regression (found driving update_basis on the TPU): genuine tail
        # modes with sigma/sigma1 below fp32's eps*max*sqrt(n) floor were
        # de-normalized by the host-f64 engine's epilogue, silently breaking
        # the orthonormal-Ur premise of downstream math.  The floor must
        # track the f64 norm-accumulation precision.
        from openmeasure_tpu.streaming import StreamingROM, ArrayStore
        rng = np.random.default_rng(16)
        n, r_true = 40_000, 5
        Uo = np.linalg.qr(rng.standard_normal((n, r_true)))[0]
        sig = np.array([1.0, 1e-2, 1e-4, 1e-6, 1e-7])   # deep tail
        Vo = np.linalg.qr(rng.standard_normal((8, r_true)))[0]
        X = (Uo * sig) @ Vo.T
        srom = StreamingROM(ArrayStore(X.astype(np.float32)), 1,
                            chunk_rows=7000)      # default dtype=float32
        srom.fit(scale_type="none", axis_cnt=None, select_modes="number",
                 n_modes=r_true)
        # centering is by the block mean here; tail ratios stay ~1e-7 <<
        # fp32 eps*sqrt(n) = 2.4e-5, so the old floor would shrink them
        norms = np.linalg.norm(np.asarray(srom.Ur, np.float64), axis=0)
        np.testing.assert_allclose(norms, np.ones(r_true), atol=1e-4)
        # and the update algebra now holds for the streamed triple
        Xn = (Uo[:, [4]] @ rng.standard_normal((1, 2))).astype(np.float32)
        U_f = np.asarray(srom.Ur, np.float64)
        S_f = np.asarray(srom.Sigma_r, np.float64)
        Vt_f = np.asarray(srom.Vr, np.float64).T
        cnt = np.asarray(srom.X_cnt, np.float64)
        scl = np.asarray(srom.X_scl, np.float64)
        srom.update_basis(Xn)
        X0n = (Xn.astype(np.float64) - cnt) / scl
        M_rep = np.concatenate([U_f @ np.diag(S_f) @ Vt_f, X0n], axis=1)
        S_ref = np.linalg.svd(M_rep, compute_uv=False)[: srom.r]
        rel = np.abs(np.asarray(srom.Sigma_r, np.float64) - S_ref) / S_ref
        assert rel.max() < 1e-3, rel

    def test_streaming_spr_theta_refresh(self):
        from openmeasure_tpu.streaming import StreamingSPR, ArrayStore
        rng = np.random.default_rng(13)
        n, m = 60, 8
        X = rng.standard_normal((n, m)) * 2 + 1
        spr = StreamingSPR(ArrayStore(X), 2, chunk_rows=13,
                           dtype=np.float64)
        spr.fit(select_modes="number", n_modes=m)
        C = np.eye(n)
        spr.train(C)
        Xn = rng.standard_normal((n, 2)) * 2 + 1
        spr.update_basis(Xn, n_modes=m + 1)
        np.testing.assert_allclose(np.asarray(spr.Theta),
                                   np.asarray(spr.Ur), atol=1e-12)
        y = np.stack([Xn[:, 1], np.zeros(n),
                      np.repeat([0.0, 1.0], n // 2)], axis=1)
        Ar, _ = spr.predict(y)
        rec = spr.reconstruct(Ar)
        np.testing.assert_allclose(np.asarray(rec)[:, 0], Xn[:, 1],
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.slow
class TestGPRUpdateBasis:
    """Basis + GP-training-set assimilation (beyond-reference; the
    reference's GPR.update extends data against a FROZEN basis only)."""

    def _make(self):
        # the reference's manufactured rank-1 problem (test_gpr.py:13-34
        # there): X = U (100 Vt) + 20, V = sin(2 pi P)
        n_points, m = 20, 10
        P = np.linspace(0, 1, 2 * m)[:, None]
        V = 10 * np.sin(2 * np.pi * P)
        V = V / np.linalg.norm(V)
        U = np.arange(1, n_points + 1, dtype=float)[:, None]
        U = U / np.linalg.norm(U)
        X = U @ (100 * V.T) + 20.0
        return P, X, np.zeros((n_points, 3))

    def test_untrained_update_and_validation(self):
        from openmeasure_tpu import GPR
        P, X, xyz = self._make()
        gpr = GPR(X[:, :14], 1, xyz, P[:14])
        gpr.fit(scaleX_type="none", select_modes="number", n_modes=1)
        with pytest.raises(Exception, match="number of parameters"):
            gpr.update_basis(X[:, 14:17], P[14:16])
        gpr.update_basis(X[:, 14:17], P[14:17])
        assert gpr.P.shape == (17, 1) and np.asarray(gpr.P0).shape == (17, 1)
        assert np.asarray(gpr.Vr).shape == (17, 1)
        # frozen-stat parameter scaling (the update contract)
        np.testing.assert_allclose(
            np.asarray(gpr.P0)[14:],
            (P[14:17] - np.asarray(gpr.P_cnt)[0]) / np.asarray(gpr.P_scl)[0],
            rtol=1e-12)

    @pytest.mark.parametrize("gpr_type", ["SingleTask", "MultiTask"])
    def test_trained_update_predicts_heldout(self, gpr_type):
        from openmeasure_tpu import GPR
        P, X, xyz = self._make()
        even = np.arange(0, 20, 2)          # initial ensemble
        upd = np.arange(1, 11, 2)           # arriving pairs
        te = np.arange(11, 20, 2)           # held-out, interleaved
        gpr = GPR(X[:, even], 1, xyz, P[even], gpr_type)
        gpr.fit(scaleX_type="none", select_modes="number", n_modes=1)
        gpr.train(max_iter=400)
        gpr.update_basis(X[:, upd], P[upd], retrain=True)
        assert np.asarray(gpr._train_X).shape[0] == 15
        assert np.asarray(gpr._train_Y).shape[0] == 15
        assert np.asarray(gpr.Vr_sigma).shape[0] == 15
        A_pred, _ = gpr.predict(P[te])
        X_pred = gpr.reconstruct(A_pred)
        # reference predict bar (atol 0.5) on the never-seen points
        np.testing.assert_allclose(X[:, te], np.asarray(X_pred), atol=5e-1)

    @pytest.mark.parametrize("gpr_type", ["SingleTask", "MultiTask"])
    def test_rank_change_on_trained_model(self, gpr_type):
        """Rank growth on a trained model drops the (r_old, ...) parameter
        stacks: retrain=False leaves the model fitted-but-untrained;
        retrain=True trains FRESH at the new rank (MultiTask rebuilds the
        num_tasks likelihood)."""
        from openmeasure_tpu import GPR
        rng = np.random.default_rng(17)
        X = rng.standard_normal((20, 8))
        P = rng.random((8, 2))
        gpr = GPR(X, 1, np.zeros((20, 3)), P, gpr_type)
        gpr.fit(select_modes="number", n_modes=3)
        gpr.train(max_iter=30)
        X_new, P_new = rng.standard_normal((20, 2)), rng.random((2, 2))
        gpr.update_basis(X_new, P_new, select_modes="number", n_modes=5)
        assert gpr.r == 5 and not hasattr(gpr, "params")
        assert np.asarray(gpr.P0).shape[0] == 10
        gpr.train(max_iter=30)
        A, _ = gpr.predict(P_new)
        assert np.asarray(A).shape == (2, 5)
        assert np.all(np.isfinite(np.asarray(A)))

        # retrain=True at a rank change: fresh training at the new rank
        gpr2 = GPR(X, 1, np.zeros((20, 3)), P, gpr_type)
        gpr2.fit(select_modes="number", n_modes=3)
        gpr2.train(max_iter=30)
        gpr2.update_basis(X_new, P_new, select_modes="number", n_modes=5,
                          retrain=True)
        assert gpr2.r == 5 and hasattr(gpr2, "params")
        if gpr_type == "MultiTask":
            assert gpr2.likelihood.num_tasks == 5
        A2, _ = gpr2.predict(P_new)
        np.testing.assert_allclose(np.asarray(A2), np.asarray(A),
                                   rtol=1e-4, atol=1e-6)

    def test_pigpr_retrain_rejected(self):
        from openmeasure_tpu import PIGPR
        P, X, xyz = self._make()

        def added_loss(ctx):
            return 0.0

        pig = PIGPR(X[:, :14], 1, xyz, P[:14], P[14:16], added_loss)
        pig.fit(scaleX_type="none", select_modes="number", n_modes=1)
        with pytest.raises(ValueError, match="added-loss"):
            pig.update_basis(X[:, 14:16], P[14:16], retrain=True)
        pig.update_basis(X[:, 14:16], P[14:16])
        assert np.asarray(pig.P0).shape[0] == 16


class TestSPRUpdateBasis:
    def test_theta_refresh_and_predict_new_snapshot(self):
        rng = np.random.default_rng(6)
        n, m = 40, 6
        X = rng.standard_normal((n, m)) * 3 + 1
        spr = SPR(X, 2, rng.random((n // 2, 3)))
        spr.fit(select_modes="number", n_modes=m)
        C = np.eye(n)
        spr.train(C)
        Xn = rng.standard_normal((n, 2)) * 3 + 1
        spr.update_basis(Xn, n_modes=m + 2)
        np.testing.assert_allclose(np.asarray(spr.Theta),
                                   np.asarray(spr.Ur), atol=1e-12)
        # with C = I the new snapshot must be reconstructed exactly
        # (reference exactness bar, tests/test_spr.py:48-60)
        y = np.stack([Xn[:, 0], np.zeros(n),
                      np.repeat([0.0, 1.0], n // 2)], axis=1)
        Ar, _ = spr.predict(y)
        rec = spr.reconstruct(Ar)
        np.testing.assert_allclose(np.asarray(rec)[:, 0], Xn[:, 0],
                                   rtol=1e-6, atol=1e-8)

    def test_checkpoint_roundtrip_after_update(self, tmp_path):
        # an updated model must save/load like a fitted one
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        rng = np.random.default_rng(18)
        n, m = 30, 6
        X = rng.standard_normal((n, m))
        spr = SPR(X, 2, rng.random((n // 2, 3)))
        spr.fit(select_modes="number", n_modes=4)
        spr.train(np.eye(n))
        spr.update_basis(rng.standard_normal((n, 2)))
        p = str(tmp_path / "updated.npz")
        save_model(spr, p)
        spr2 = load_model(p)
        np.testing.assert_allclose(np.asarray(spr2.Ur), np.asarray(spr.Ur),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(spr2.Sigma_r),
                                   np.asarray(spr.Sigma_r), atol=1e-12)
        np.testing.assert_allclose(np.asarray(spr2.Theta),
                                   np.asarray(spr.Theta), atol=1e-12)

    def test_is_theta_invalidated(self):
        rng = np.random.default_rng(7)
        n, m = 20, 5
        X = rng.standard_normal((n, m))
        spr = SPR(X, 1, rng.random((n, 3)))
        spr.fit(select_modes="number", n_modes=4)
        spr.train(np.asarray(spr.Ur)[:4, :], is_Theta=True)
        spr.update_basis(X[:, :1] * 1.05)
        # the message must point at train(), not fit() — fit state is
        # intact, only the supplied Theta encodes the old basis
        with pytest.raises(AttributeError, match="train"):
            spr.predict(np.zeros((4, 3)))

    def test_is_theta_after_prior_C_train_clears_stale_operator(self):
        """train(C1) then train(Theta2, is_Theta=True): the stale C1 must
        not survive — update_basis previously rebuilt Theta = C1 @ Ur_new
        silently, and scale_vector centered Theta2's measurements with
        C1's sensors."""
        rng = np.random.default_rng(8)
        n, m = 20, 5
        X = rng.standard_normal((n, m))
        spr = SPR(X, 1, rng.random((n, 3)))
        spr.fit(select_modes="number", n_modes=4)
        C1 = np.asarray(spr.optimal_placement())
        spr.train(C1)
        spr.train(np.asarray(spr.Ur)[2:6, :], is_Theta=True)
        assert spr.C is None
        spr.update_basis(X[:, :1] * 1.05)
        with pytest.raises(AttributeError, match="train"):
            spr.predict(np.zeros((4, 3)))
