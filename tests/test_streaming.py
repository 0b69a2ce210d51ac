"""Out-of-core streaming tier: native npy loader, prefetching chunk
iterator, and StreamingROM/StreamingSPR parity against the in-core classes.

The streaming fit must agree with ``ROM.fit`` on the same data: X_cnt/X_scl
exactly (both are float64-statistics here), the POD factors to spectral-
perturbation tolerance, and end-to-end reconstructions/predictions to
float-round-off NRMSE.  Positive data is used so every scale type
(level/max/poisson/vast…) is well-defined.
"""

import os

import numpy as np
import pytest

from openmeasure_tpu import ROM, SPR
from openmeasure_tpu import native as nat
from openmeasure_tpu.streaming import (
    ArrayStore, NpyColumnStore, NpyMatrixStore, StreamingROM, StreamingSPR,
    iter_chunks, open_store,
)

RNG = np.random.default_rng(42)


class CountingStore(ArrayStore):
    """ArrayStore that counts full disk sweeps (a pass starts at row 0)."""

    def __init__(self, X):
        super().__init__(X)
        self.passes = 0

    def read_rows(self, row0, nrows, dtype=np.float32):
        if row0 == 0:
            self.passes += 1
        return super().read_rows(row0, nrows, dtype)


def make_X(n_features=3, n_points=40, m=12, rank=6, dtype=np.float64):
    n = n_features * n_points
    U = RNG.standard_normal((n, rank))
    V = RNG.standard_normal((m, rank))
    s = np.geomspace(50.0, 0.5, rank)
    X = (U * s) @ V.T
    return (X + 10.0 + np.abs(X).max()).astype(dtype)  # strictly positive


# --------------------------------------------------------------------- #
# Native loader
# --------------------------------------------------------------------- #

@pytest.mark.skipif(not nat.available(), reason="native build unavailable")
class TestNativeNpyLoader:
    def test_probe_matrix(self, tmp_path):
        X = RNG.standard_normal((30, 5)).astype(np.float32)
        p = str(tmp_path / "x.npy")
        np.save(p, X)
        item, shape, off = nat.npy_probe(p)
        assert (item, shape) == (4, (30, 5))
        assert off % 64 == 0

    @pytest.mark.parametrize("fdtype", [np.float32, np.float64])
    @pytest.mark.parametrize("odtype", [np.float32, np.float64])
    def test_matrix_rows_all_dtype_pairs(self, tmp_path, fdtype, odtype):
        X = RNG.standard_normal((50, 7)).astype(fdtype)
        p = str(tmp_path / "x.npy")
        np.save(p, X)
        got = nat.read_rows_matrix(p, 11, 17, 7, odtype)
        np.testing.assert_array_equal(got, X[11:28].astype(odtype))

    def test_column_files_mixed_1d_2d(self, tmp_path):
        X = RNG.standard_normal((64, 6)).astype(np.float64)
        paths = []
        for j in range(6):
            pj = str(tmp_path / f"c{j}.npy")
            col = X[:, j] if j % 2 == 0 else X[:, j].reshape(-1, 1)
            np.save(pj, col.astype(np.float32 if j < 3 else np.float64))
            paths.append(pj)
        got = nat.read_rows_files(paths, 9, 40, np.float64)
        expect = np.stack(
            [X[9:49, j].astype(np.float32 if j < 3 else np.float64)
             for j in range(6)], axis=1)
        np.testing.assert_array_equal(got, expect)

    def test_errors(self, tmp_path):
        p = str(tmp_path / "f.npy")
        np.save(p, np.asfortranarray(RNG.standard_normal((4, 4))))
        with pytest.raises(RuntimeError, match="fortran"):
            nat.read_rows_matrix(p, 0, 2, 4)
        with pytest.raises(RuntimeError, match="open failed"):
            nat.npy_probe(str(tmp_path / "missing.npy"))
        np.save(p2 := str(tmp_path / "i.npy"), np.arange(8, dtype=np.int32))
        with pytest.raises(RuntimeError, match="dtype"):
            nat.npy_probe(p2)
        np.save(p3 := str(tmp_path / "m.npy"),
                RNG.standard_normal((10, 3)))
        with pytest.raises(RuntimeError, match="out of bounds"):
            nat.read_rows_matrix(p3, 5, 6, 3)


# --------------------------------------------------------------------- #
# Stores + chunk iterator
# --------------------------------------------------------------------- #

class TestStores:
    def test_open_store_sniffing(self, tmp_path):
        X = make_X()
        p = str(tmp_path / "x.npy")
        np.save(p, X)
        assert isinstance(open_store(p), NpyMatrixStore)
        assert isinstance(open_store(X), ArrayStore)
        st = ArrayStore(X)
        assert open_store(st) is st
        cols = []
        for j in range(X.shape[1]):
            pj = str(tmp_path / f"c{j}.npy")
            np.save(pj, X[:, j])
            cols.append(pj)
        assert isinstance(open_store(cols), NpyColumnStore)

    def test_matrix_store_matches_memory(self, tmp_path):
        X = make_X(dtype=np.float32)
        p = str(tmp_path / "x.npy")
        np.save(p, X)
        st = NpyMatrixStore(p)
        assert st.shape == X.shape
        np.testing.assert_array_equal(st.read_rows(13, 29, np.float32),
                                      X[13:42])

    def test_column_store_validation(self, tmp_path):
        np.save(a := str(tmp_path / "a.npy"), np.zeros(10))
        np.save(b := str(tmp_path / "b.npy"), np.zeros(11))
        with pytest.raises(ValueError, match="inconsistent length"):
            NpyColumnStore([a, b])
        np.save(c := str(tmp_path / "c.npy"), np.zeros((5, 2)))
        with pytest.raises(ValueError, match=r"\(n,\) or \(n, 1\)"):
            NpyColumnStore([c])
        with pytest.raises(ValueError, match="at least one"):
            NpyColumnStore([])

    @pytest.mark.parametrize("chunk_rows", [1, 7, 40, 120, 1000])
    def test_iter_chunks_covers_everything(self, chunk_rows):
        X = make_X()
        seen = np.zeros_like(X)
        hit = np.zeros(X.shape[0], dtype=int)
        for row0, chunk in iter_chunks(ArrayStore(X), chunk_rows,
                                       np.float64):
            seen[row0:row0 + chunk.shape[0]] = chunk
            hit[row0:row0 + chunk.shape[0]] += 1
        assert (hit == 1).all()
        np.testing.assert_array_equal(seen, X)

    def test_iter_chunks_early_close_stops_reader(self):
        X = make_X()
        gen = iter_chunks(ArrayStore(X), 10, np.float64, prefetch=2)
        next(gen)
        gen.close()  # must not hang / leak a blocked thread

    def test_iter_chunks_propagates_reader_error(self, tmp_path):
        p = str(tmp_path / "x.npy")
        np.save(p, make_X(dtype=np.float32))
        st = NpyMatrixStore(p)
        os.remove(p)
        with pytest.raises(Exception):
            list(iter_chunks(st, 16, np.float32))


# --------------------------------------------------------------------- #
# StreamingROM parity vs in-core ROM
# --------------------------------------------------------------------- #

STREAMABLE_TYPES = ["std", "none", "pareto", "vast", "range", "level",
                    "max", "variance", "poisson", "vast_2", "vast_3",
                    "vast_4", "l2-norm", "median"]


def fit_pair(X, n_features, chunk_rows=17, refine=None, engine="host", **kw):
    rom = ROM(X, n_features, None)
    rom.fit(**kw)
    srom = StreamingROM(ArrayStore(X), n_features, chunk_rows=chunk_rows,
                        dtype=np.float64)
    if engine == "device":
        srom.fit(refine=1 if refine is None else refine, engine=engine, **kw)
    else:                      # host engine rejects the device-only knobs
        srom.fit(engine=engine, **kw)
    return rom, srom


class TestStreamingFitParity:
    @pytest.mark.parametrize("scale_type", STREAMABLE_TYPES)
    def test_scaling_stats_match(self, scale_type):
        X = make_X()
        rom, srom = fit_pair(X, 3, scale_type=scale_type, n_modes=99.5)
        np.testing.assert_allclose(np.asarray(srom.X_cnt),
                                   np.asarray(rom.X_cnt), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(srom.X_scl),
                                   np.asarray(rom.X_scl), rtol=1e-9)

    @pytest.mark.parametrize("axis_cnt", [1, None])
    @pytest.mark.parametrize("chunk_rows", [7, 40, 61, 500])
    def test_factors_match(self, axis_cnt, chunk_rows):
        # chunk sizes straddle the n_points=40 block boundaries in every way
        X = make_X()
        rom, srom = fit_pair(X, 3, chunk_rows=chunk_rows, axis_cnt=axis_cnt,
                             n_modes=99.9)
        assert srom.r == rom.r
        np.testing.assert_allclose(np.asarray(srom.Sigma_r),
                                   np.asarray(rom.Sigma_r), rtol=1e-8)
        # canonical signs on both sides → direct comparison
        np.testing.assert_allclose(np.asarray(srom.Ur),
                                   np.asarray(rom.Ur), atol=1e-6)
        np.testing.assert_allclose(np.asarray(srom.Ar),
                                   np.asarray(rom.Ar),
                                   atol=1e-6 * float(rom.Sigma_r[0]))

    def test_number_selection_and_reconstruct(self):
        X = make_X()
        rom, srom = fit_pair(X, 3, select_modes="number", n_modes=5)
        assert srom.r == 5
        rec_i = np.asarray(rom.reconstruct(rom.Ar))
        rec_s = np.asarray(srom.reconstruct(srom.Ar))
        np.testing.assert_allclose(rec_s, rec_i,
                                   atol=1e-8 * np.abs(rec_i).max())
        # and the reconstruction actually reproduces X (rank 6 data, r=5)
        nrmse = np.linalg.norm(rec_s - X) / np.linalg.norm(X)
        assert nrmse < 0.05

    @pytest.mark.parametrize("axis_cnt", [1, None])
    def test_device_engine_matches_host_engine(self, axis_cnt):
        """Both fit engines (host f64 BLAS passes vs device passes with
        fp32 Gram + refine) must deliver the same factors — the engine knob
        is a transport/hardware trade, not a semantics switch."""
        X = make_X()
        sh = StreamingROM(ArrayStore(X.astype(np.float32)), 3, chunk_rows=17)
        sh.fit(n_modes=99.9, axis_cnt=axis_cnt)               # engine='host'
        sd = StreamingROM(ArrayStore(X.astype(np.float32)), 3, chunk_rows=17)
        sd.fit(n_modes=99.9, axis_cnt=axis_cnt, engine="device")
        assert sh.r == sd.r
        np.testing.assert_allclose(np.asarray(sh.Sigma_r),
                                   np.asarray(sd.Sigma_r), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sh.Ur), np.asarray(sd.Ur),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(sh.Ar), np.asarray(sd.Ar),
                                   atol=5e-5 * float(sd.Sigma_r[0]))

    def test_moment_types_fit_in_two_disk_passes(self):
        """The fused stats+Gram pass makes the host engine a 2-pass fit
        for every moment-based scale type (VERDICT r3 task 2)."""
        X = make_X()
        for scale_type in ["std", "vast_2", "l2-norm"]:
            st = CountingStore(X)
            srom = StreamingROM(st, 3, chunk_rows=17, dtype=np.float64)
            srom.fit(scale_type=scale_type, n_modes=99.9)
            assert srom.gram_fused_ is True
            assert st.passes == 2, (scale_type, st.passes)
        # median keeps its selection passes but still fuses the Gram
        st = CountingStore(X)
        srom = StreamingROM(st, 3, chunk_rows=17, dtype=np.float64)
        srom.fit(scale_type="median", n_modes=99.9)
        assert srom.gram_fused_ is True
        assert st.passes <= 4           # stats+gram, selection(s), U

    def test_fused_gram_parity_all_moment_types(self):
        """Fused-algebra factors == in-core factors (the existing parity
        bars re-checked explicitly on the fused path)."""
        X = make_X()
        for scale_type in ["std", "range", "poisson"]:
            rom, srom = fit_pair(X, 3, scale_type=scale_type, n_modes=99.9)
            assert srom.gram_fused_ is True
            np.testing.assert_allclose(np.asarray(srom.Sigma_r),
                                       np.asarray(rom.Sigma_r), rtol=1e-8)
            np.testing.assert_allclose(np.asarray(srom.Ur),
                                       np.asarray(rom.Ur), atol=1e-6)

    def test_fused_gram_matches_fallback_on_fp32_store_with_offsets(self):
        """The fused algebra must center/scale with the STORE-DTYPE-
        ROUNDED statistics (what the U pass actually subtracts), so fused
        and streamed Grams describe the same matrix even for fp32 stores
        with large offsets."""
        X = (make_X() + 300.0).astype(np.float32)   # ~3 offset decades
        s_fused = StreamingROM(ArrayStore(X), 3, chunk_rows=17)
        s_fused.fit(n_modes=99.9)
        assert s_fused.gram_fused_ is True
        s_fall = StreamingROM(ArrayStore(X), 3, chunk_rows=17)
        import openmeasure_tpu.streaming as sm
        orig = sm.StreamingROM._FUSED_MAX_DIGITS_LOST
        try:
            sm.StreamingROM._FUSED_MAX_DIGITS_LOST = -1.0  # force fallback
            s_fall.fit(n_modes=99.9)
        finally:
            sm.StreamingROM._FUSED_MAX_DIGITS_LOST = orig
        assert s_fall.gram_fused_ is False
        assert s_fused.r == s_fall.r
        np.testing.assert_allclose(np.asarray(s_fused.Sigma_r),
                                   np.asarray(s_fall.Sigma_r), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s_fused.Ur),
                                   np.asarray(s_fall.Ur), atol=2e-6)

    def test_fit_path_attributes_reset(self):
        """gram_fused_/fit_mesh_ exist on every fit path and never go
        stale across refits."""
        import jax
        from jax.sharding import Mesh
        X = make_X()
        srom = StreamingROM(ArrayStore(X), 3, chunk_rows=17,
                            dtype=np.float64)
        srom.fit(engine="device", refine=1)
        assert srom.gram_fused_ is False and srom.fit_mesh_ is None
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("state",))
        srom.fit(mesh=mesh)
        assert srom.fit_mesh_ is mesh
        srom.fit()                       # unsharded refit
        assert srom.fit_mesh_ is None and srom.gram_fused_ is True
        srom.fit(basis=(np.zeros((120, 2)), np.zeros((12, 2))))
        assert srom.gram_fused_ is False

    def test_zero_scale_block_fails_without_extra_pass(self):
        """A constant block under 'std' (scl=0) must fail the same way the
        streamed pass would — but WITHOUT paying a wasted full disk sweep
        that deterministically recomputes the same non-finite Gram."""
        X = make_X()
        X[40:80] = 7.5                   # block 1 constant -> std 0
        st = CountingStore(X)
        srom = StreamingROM(st, 3, chunk_rows=17, dtype=np.float64)
        with pytest.raises(Exception):
            srom.fit(n_modes=99.9)
        assert st.passes == 1            # stats only; no fallback sweep

    def test_offset_dominated_data_falls_back_to_streamed_gram(self):
        """|mean| >> spread defeats the raw-minus-correction algebra
        (catastrophic cancellation); the engine must detect it and run the
        stable streamed Gram pass — with unchanged results."""
        X = make_X() + 1e6              # ~9 digits between mean and spread
        st = CountingStore(X)
        srom = StreamingROM(st, 3, chunk_rows=17, dtype=np.float64)
        # scale_type='none' isolates the Gram algebra (the streamed std
        # statistic has its own raw-moment form)
        srom.fit(scale_type="none", n_modes=99.9)
        assert srom.gram_fused_ is False
        assert st.passes == 3           # stats, fallback Gram, U
        rom = ROM(X, 3, None)
        rom.fit(scale_type="none", n_modes=99.9)
        assert srom.r == rom.r
        np.testing.assert_allclose(np.asarray(srom.Sigma_r),
                                   np.asarray(rom.Sigma_r), rtol=1e-6)

    def test_sharded_fit_matches_unsharded(self):
        """fit(mesh=...) — out-of-core × multi-chip composition: the U
        pass streams shard slices to their devices; factors must equal the
        single-device streaming fit exactly (same host-f64 math)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        X = make_X()                       # n=120 rows, 8 devices → 15 each
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("state",))
        s1 = StreamingROM(ArrayStore(X), 3, chunk_rows=17, dtype=np.float64)
        s1.fit(n_modes=99.9)
        s2 = StreamingROM(ArrayStore(X), 3, chunk_rows=17, dtype=np.float64)
        s2.fit(n_modes=99.9, mesh=mesh)
        assert s2.r == s1.r
        assert s2.Ur.sharding == NamedSharding(mesh, P("state", None))
        np.testing.assert_array_equal(np.asarray(s2.Ur), np.asarray(s1.Ur))
        np.testing.assert_array_equal(np.asarray(s2.Sigma_r),
                                      np.asarray(s1.Sigma_r))
        np.testing.assert_array_equal(np.asarray(s2.Ar), np.asarray(s1.Ar))
        # reconstruct stays shard-local end to end and matches
        rec1 = np.asarray(s1.reconstruct(s1.Ar))
        rec2 = np.asarray(s2.reconstruct(s2.Ar))
        np.testing.assert_allclose(rec2, rec1, atol=1e-12 * np.abs(rec1).max())

    def test_sharded_fit_spr_pipeline_matches(self, tmp_path):
        """StreamingSPR on a mesh: placement pivots, Theta, and the gappy
        prediction equal the unsharded streaming pipeline."""
        import jax
        from jax.sharding import Mesh
        X = make_X()
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("state",))
        sprs = []
        for m_ in (None, mesh):
            spr = StreamingSPR(ArrayStore(X), 3, chunk_rows=17,
                               dtype=np.float64)
            spr.fit(select_modes="number", n_modes=5, mesh=m_)
            C = spr.optimal_placement()
            spr.train(C)
            sprs.append(spr)
        a, b = sprs
        np.testing.assert_array_equal(np.asarray(b.C), np.asarray(a.C))
        np.testing.assert_allclose(np.asarray(b.Theta), np.asarray(a.Theta),
                                   atol=1e-12)
        y = np.column_stack([X[np.asarray(a.C).argmax(1), 2],
                             np.zeros(5), np.zeros(5)])
        Ya, _ = a.predict(y)
        Yb, _ = b.predict(y)
        np.testing.assert_allclose(np.asarray(Yb), np.asarray(Ya),
                                   atol=1e-10)

    def test_sharded_fit_validation(self):
        import jax
        from jax.sharding import Mesh
        X = make_X(n_points=37)            # n=111: not divisible by 8
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("state",))
        srom = StreamingROM(ArrayStore(X), 3, dtype=np.float64)
        with pytest.raises(ValueError, match="divisible"):
            srom.fit(mesh=mesh)
        X2 = make_X()
        srom2 = StreamingROM(ArrayStore(X2), 3, dtype=np.float64)
        with pytest.raises(ValueError, match="engine='host'"):
            srom2.fit(mesh=mesh, engine="device")
        with pytest.raises(ValueError, match="basis"):
            srom2.fit(mesh=mesh, basis=(np.zeros((120, 2)),
                                        np.zeros((12, 2))))

    def test_unknown_engine_raises(self):
        X = make_X()
        srom = StreamingROM(ArrayStore(X.astype(np.float32)), 3)
        with pytest.raises(ValueError, match="engine"):
            srom.fit(engine="gpu")

    def test_host_engine_rejects_device_knobs(self):
        """refine/width must not be silently ignored by the host engine."""
        X = make_X()
        srom = StreamingROM(ArrayStore(X.astype(np.float32)), 3)
        with pytest.raises(ValueError, match="device-engine knobs"):
            srom.fit(refine=2)
        with pytest.raises(ValueError, match="device-engine knobs"):
            srom.fit(width=8)

    def test_refine_zero_three_passes(self):
        X = make_X()
        rom, srom = fit_pair(X, 3, refine=0, n_modes=99.9,
                             engine="device")   # refine is a device-engine knob
        np.testing.assert_allclose(np.asarray(srom.Ur), np.asarray(rom.Ur),
                                   atol=5e-6)

    @pytest.mark.parametrize("engine", ["host", "device"])
    def test_tail_mode_normalization_large_n_fp32(self, engine):
        """Regression twin of test_linalg's √n-floor test for the streamed
        U pass (both engines share the floor formula): real fp32 tail modes
        at n ≈ 1e5 rows must be normalized by their true column norms, not
        the rank-deficiency floor (the old eps·max·n floor reached
        0.014·σ_1 here and shrank them)."""
        n, m = 120_000, 6
        rng = np.random.default_rng(3)
        U0, _ = np.linalg.qr(rng.standard_normal((n, m)))
        V0, _ = np.linalg.qr(rng.standard_normal((m, m)))
        s = np.array([1.0, 0.5, 0.1, 0.03, 0.01, 0.003])
        X = ((U0 * s[None, :]) @ V0.T).astype(np.float32)
        srom = StreamingROM(ArrayStore(X), 1, chunk_rows=50_000,
                            dtype=np.float32)
        srom.fit(scale_type="none", select_modes="number", n_modes=5,
                 engine=engine)
        # float64 truth of the row-centered panel
        X0 = X.astype(np.float64)
        X0 -= X0.mean(axis=1, keepdims=True)
        Un, Sn, _ = np.linalg.svd(X0, full_matrices=False)
        eps32 = np.finfo(np.float32).eps
        assert Sn[4] < eps32 * n * Sn[0]          # old-bug region
        Ur = np.asarray(srom.Ur, dtype=np.float64)
        np.testing.assert_allclose(np.linalg.norm(Ur, axis=0), np.ones(5),
                                   rtol=1e-5)
        for k in range(5):
            sgn = np.sign(np.dot(Ur[:, k], Un[:, k]))
            np.testing.assert_allclose(Ur[:, k] * sgn, Un[:, k], atol=2e-5)

    def test_basis_injection_skips_decomposition(self):
        X = make_X()
        rom = ROM(X, 3, None)
        rom.fit(n_modes=99.9)
        srom = StreamingROM(ArrayStore(X), 3, dtype=np.float64)
        srom.fit(basis=(rom.Ur, rom.Ar))
        np.testing.assert_allclose(np.asarray(srom.Ur), np.asarray(rom.Ur))
        np.testing.assert_allclose(np.asarray(srom.Vr), np.asarray(rom.Vr),
                                   rtol=1e-12)

    def test_from_disk_both_layouts(self, tmp_path):
        X = make_X()
        p = str(tmp_path / "x.npy")
        np.save(p, X)
        cols = []
        for j in range(X.shape[1]):
            pj = str(tmp_path / f"c{j}.npy")
            np.save(pj, X[:, j])
            cols.append(pj)
        rom = ROM(X, 3, None)
        rom.fit(n_modes=99.9)
        for source in (p, cols):
            srom = StreamingROM(source, 3, chunk_rows=23, dtype=np.float64)
            srom.fit(n_modes=99.9)
            np.testing.assert_allclose(np.asarray(srom.Ur),
                                       np.asarray(rom.Ur), atol=1e-6)

    def test_incore_only_methods_raise(self):
        srom = StreamingROM(ArrayStore(make_X()), 3, dtype=np.float64)
        with pytest.raises(NotImplementedError, match="never materializes"):
            srom.scale_data()
        with pytest.raises(NotImplementedError, match="inside fit"):
            srom.decomposition(None)
        srom.fit()
        with pytest.raises(NotImplementedError, match="solver_fn"):
            srom.CPOD(solver_fn=lambda *a: None)

    def test_validation_parity(self):
        with pytest.raises(TypeError, match="n_features is not an integer"):
            StreamingROM(ArrayStore(make_X()), 3.0)
        with pytest.raises(Exception, match="not a multiple"):
            StreamingROM(ArrayStore(make_X()), 7)


# --------------------------------------------------------------------- #
# _block_medians selection machinery (the hard cases)
# --------------------------------------------------------------------- #

def run_medians(X, n_features, chunk_rows=13):
    import openmeasure_tpu.streaming as sm
    n_points = X.shape[0] // n_features
    bmin = np.array([X[f * n_points:(f + 1) * n_points].min()
                     for f in range(n_features)], dtype=np.float64)
    bmax = np.array([X[f * n_points:(f + 1) * n_points].max()
                     for f in range(n_features)], dtype=np.float64)
    return sm._block_medians(ArrayStore(np.ascontiguousarray(X)),
                             n_features, X.dtype, chunk_rows, 0, bmin, bmax)


def expected_medians(X, n_features):
    n_points = X.shape[0] // n_features
    return np.array([np.median(X[f * n_points:(f + 1) * n_points]
                               .astype(np.float64))
                     for f in range(n_features)])


class TestBlockMedians:
    @pytest.mark.parametrize("chunk_rows", [7, 40, 61, 500])
    @pytest.mark.parametrize("m", [9, 10])          # odd and even N
    def test_random_parity(self, chunk_rows, m):
        rng = np.random.default_rng(11)
        X = rng.standard_normal((120, m))
        med = run_medians(X, 3, chunk_rows)
        np.testing.assert_array_equal(med, expected_medians(X, 3))

    def test_forced_histogram_paths(self, monkeypatch):
        """collect limit 1 forces full histogram refinement (hist →
        single-survivor-bin narrowing → collect/straddle finish)."""
        import openmeasure_tpu.streaming as sm
        monkeypatch.setattr(sm, "_MEDIAN_COLLECT_LIMIT", 1)
        rng = np.random.default_rng(5)
        for m in (9, 10):                          # odd and even N
            X = rng.standard_normal((80, m))
            med = run_medians(X, 2, 17)
            np.testing.assert_array_equal(med, expected_medians(X, 2))

    def test_even_n_straddle_two_masses(self, monkeypatch):
        """Half the block at 0.0, half at 1.0 (even N): the two middle
        ranks land in DIFFERENT bins — pure bisection never separates the
        masses; the straddle min/max pass must finish with 0.5 exactly."""
        import openmeasure_tpu.streaming as sm
        monkeypatch.setattr(sm, "_MEDIAN_COLLECT_LIMIT", 1)
        X = np.concatenate([np.zeros(20), np.ones(20)])[:, None] \
            * np.ones((1, 4))
        med = run_medians(X, 1, 13)
        assert med[0] == 0.5

    def test_adjacent_fp32_values_exact_mode(self, monkeypatch):
        """Two ADJACENT representable float32 values each holding half the
        mass: no float64 histogram can split them past one ulp; the
        representable-value enumeration (exact mode) must terminate."""
        import openmeasure_tpu.streaming as sm
        monkeypatch.setattr(sm, "_MEDIAN_COLLECT_LIMIT", 1)
        a = np.float32(1.0)
        b = np.nextafter(a, np.float32(2.0), dtype=np.float32)
        X = np.concatenate([np.full(20, a), np.full(20, b)])[:, None] \
            * np.ones((1, 3), dtype=np.float32)
        X = X.astype(np.float32)
        med = run_medians(X, 1, 9)
        assert med[0] == 0.5 * (np.float64(a) + np.float64(b))

    def test_constant_and_duplicate_blocks(self, monkeypatch):
        import openmeasure_tpu.streaming as sm
        monkeypatch.setattr(sm, "_MEDIAN_COLLECT_LIMIT", 1)
        rng = np.random.default_rng(7)
        const = np.full((30, 5), 3.25)
        dups = rng.choice([1.0, 2.0, 2.0, 7.5], size=(30, 5))
        X = np.concatenate([const, dups], axis=0)
        med = run_medians(X, 2, 11)
        np.testing.assert_array_equal(med, expected_medians(X, 2))

    def test_cpod_parity(self):
        X = make_X()
        limits = [np.min(X) * np.ones(3), np.max(X) * 0.9 * np.ones(3)]
        rom, srom = fit_pair(X, 3, n_modes=99.9)
        rom.CPOD(limits=limits)
        srom.CPOD(limits=limits)
        np.testing.assert_allclose(np.asarray(srom.Ar), np.asarray(rom.Ar),
                                   atol=1e-5 * float(rom.Sigma_r[0]))

    def test_adaptive_sampling_behavior(self):
        # Exact parity with the in-core path is ill-posed: row-centering
        # leaves a near-null mode whose singular direction (and hence its
        # leave-one-out influence) is backend-arbitrary.  Assert the
        # well-defined properties: determinism, in-bounds candidate, and the
        # scale-type guard.
        X = make_X()
        P = RNG.random((X.shape[1], 3))
        _, srom = fit_pair(X, 3, n_modes=99.9)
        got = srom.adaptive_sampling(P, seed=7)
        got2 = srom.adaptive_sampling(P, seed=7)
        np.testing.assert_array_equal(got, got2)
        assert got.shape == (3,)
        assert (got >= P.min(axis=0)).all() and (got <= P.max(axis=0)).all()
        with pytest.raises(NotImplementedError, match="fitted spectrum"):
            srom.adaptive_sampling(P, scale_type="range")


# --------------------------------------------------------------------- #
# StreamingSPR end-to-end
# --------------------------------------------------------------------- #

class TestStreamingSPR:
    def test_full_pipeline_matches_incore(self, tmp_path):
        X = make_X(n_features=3, n_points=60, m=14)
        p = str(tmp_path / "x.npy")
        np.save(p, X)

        spr = SPR(X, 3, None)
        spr.fit(n_modes=99.9)
        C = spr.optimal_placement(calc_type="qr")
        spr.train(C)

        sspr = StreamingSPR(p, 3, chunk_rows=37, dtype=np.float64)
        sspr.fit(n_modes=99.9)
        Cs = sspr.optimal_placement(calc_type="qr")
        np.testing.assert_array_equal(np.asarray(Cs).argmax(axis=1),
                                      np.asarray(C).argmax(axis=1))
        sspr.train(Cs)

        rows = np.asarray(C).argmax(axis=1)
        y = np.zeros((rows.size, 3))
        y[:, 0] = X[rows, 0]
        y[:, 2] = rows // 60
        ar_i, _ = spr.predict(y)
        ar_s, _ = sspr.predict(y)
        x_i = np.asarray(spr.reconstruct(ar_i))[:, 0]
        x_s = np.asarray(sspr.reconstruct(ar_s))[:, 0]
        np.testing.assert_allclose(x_s, x_i, atol=1e-6 * np.abs(x_i).max())
        # reconstruction quality itself (rank-6 data, sensors at pivots)
        nrmse = np.linalg.norm(x_s - X[:, 0]) / np.linalg.norm(X[:, 0])
        assert nrmse < 0.05

    def test_train_shape_validation_uses_store_shape(self):
        X = make_X()
        sspr = StreamingSPR(ArrayStore(X), 3, dtype=np.float64)
        sspr.fit(n_modes=99.9)
        bad_C = np.zeros((4, X.shape[0] + 1))
        with pytest.raises(ValueError, match="columns of C"):
            sspr.train(bad_C)


class TestStreamingServing:
    def test_streaming_spr_packages_into_softsensor(self, tmp_path):
        """A StreamingSPR trained out-of-core must package into the
        compiled SoftSensor exactly like the in-core class (it IS an SPR
        after fit: Ur/Theta/scaling all memory-resident)."""
        from openmeasure_tpu.serving import SoftSensor
        X = make_X(dtype=np.float32)
        p = str(tmp_path / "x.npy")
        np.save(p, X)
        sspr = StreamingSPR(p, 3)
        sspr.fit(select_modes="number", n_modes=4)
        C = np.asarray(sspr.optimal_placement())
        sspr.train(C)
        sensor = SoftSensor.from_spr(sspr)
        rows = np.argmax(C, axis=1)
        y = np.zeros((len(rows), 3))
        y[:, 0] = X[rows, 0]
        y[:, 2] = rows // (X.shape[0] // 3)
        a_eager, _ = sspr.predict(y)
        x_eager = np.asarray(sspr.reconstruct(np.asarray(a_eager)))[:, 0]
        x_srv = np.asarray(sensor(y[:, 0]))
        scale = float(np.abs(x_eager).max())
        np.testing.assert_allclose(x_srv, x_eager, atol=1e-5 * scale)

    def test_streaming_spr_packages_into_dynamic_sensor(self, tmp_path):
        """The Kalman serving family works out-of-core too: a StreamingSPR
        carries the same Ar/Theta/C/scaling surface DynamicSensor.from_spr
        consumes, so the filter built from the streamed fit must match the
        one built from the in-core fit on the same data."""
        from openmeasure_tpu import SPR
        from openmeasure_tpu.serving import DynamicSensor
        X = make_X(dtype=np.float32)
        p = str(tmp_path / "x.npy")
        np.save(p, X)
        sspr = StreamingSPR(p, 3)
        sspr.fit(select_modes="number", n_modes=4)
        C = np.asarray(sspr.optimal_placement())
        sspr.train(C)
        spr = SPR(X, 3, np.zeros((X.shape[0] // 3, 3)))
        spr.fit(select_modes="number", n_modes=4)
        spr.train(C)
        d_stream = DynamicSensor.from_spr(sspr)
        d_core = DynamicSensor.from_spr(spr)
        rows = np.argmax(C, axis=1)
        Y = X[rows, -5:].T.astype(np.float64)
        sig = np.full_like(Y, 0.05 * float(np.std(Y)))
        Xs, As, _ = d_stream.filter_batch(Y, sig)
        Xc, Ac, _ = d_core.filter_batch(Y, sig)
        # streamed factors match in-core to fp32 round-off (basis sign
        # canonicalized in both); so must the filtered reconstructions
        scale = float(np.abs(np.asarray(Xc)).max())
        np.testing.assert_allclose(np.asarray(Xs), np.asarray(Xc),
                                   atol=5e-4 * scale)


@pytest.mark.slow
class TestStreamingGPR:
    """Out-of-core GPR: the snapshot side streams, the GP side is the
    in-core engine — fit/train/predict/update_basis must match the in-core
    GPR on identical data."""

    def _make(self, n_points=30, m=10):
        # the reference's manufactured rank-1 GP problem (test_gpr.py:13-34
        # there): X = U (100 Vt) + 20, V = sin(2 pi P)
        P = np.linspace(0, 1, 2 * m)[:, None]
        V = 10 * np.sin(2 * np.pi * P)
        V = V / np.linalg.norm(V)
        U = np.arange(1, n_points + 1, dtype=float)[:, None]
        U = U / np.linalg.norm(U)
        X = U @ (100 * V.T) + 20.0
        return P, X, np.zeros((n_points, 3))

    def test_ctor_validation(self):
        from openmeasure_tpu import StreamingGPR
        P, X, xyz = self._make()
        with pytest.raises(Exception, match="number of parameters"):
            StreamingGPR(ArrayStore(X[:, :10]), 1, xyz, P[:9])

    def test_fit_train_predict_matches_incore(self, tmp_path):
        from openmeasure_tpu import GPR, StreamingGPR
        P, X, xyz = self._make()
        tr, te = np.arange(0, 20, 2), np.arange(1, 20, 2)
        p = str(tmp_path / "x.npy")
        np.save(p, X[:, tr])

        gpr = GPR(X[:, tr], 1, xyz, P[tr])
        gpr.fit(scaleX_type="none", select_modes="number", n_modes=1)
        sgpr = StreamingGPR(p, 1, xyz, P[tr], chunk_rows=7,
                            dtype=np.float64)
        sgpr.fit(scaleX_type="none", select_modes="number", n_modes=1)

        np.testing.assert_allclose(np.asarray(sgpr.Vr), np.asarray(gpr.Vr),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(sgpr.Sigma_r),
                                   np.asarray(gpr.Sigma_r), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(sgpr.P0), np.asarray(gpr.P0),
                                   rtol=1e-12)

        gpr.train(max_iter=200)
        sgpr.train(max_iter=200)
        A_i, _ = gpr.predict(P[te])
        A_s, _ = sgpr.predict(P[te])
        np.testing.assert_allclose(np.asarray(A_s), np.asarray(A_i),
                                   rtol=1e-4, atol=1e-8)
        X_s = np.asarray(sgpr.reconstruct(A_s))
        # the reference's held-out bar (test_gpr.py:62-68 there)
        np.testing.assert_allclose(X[:, te], X_s, atol=5e-1)

    def test_fit_with_mesh_matches_unsharded(self):
        """StreamingGPR.fit(mesh=...): the streamed basis lands row-
        sharded, the GP trains on the replicated coefficients, and
        predictions equal the unsharded streaming fit."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P_
        from openmeasure_tpu import StreamingGPR
        P, X, xyz = self._make(n_points=32)          # n=32... 8 | 32
        tr, te = np.arange(0, 20, 2), np.arange(1, 20, 2)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("state",))
        a = StreamingGPR(ArrayStore(X[:, tr]), 1, xyz, P[tr],
                         chunk_rows=7, dtype=np.float64)
        a.fit(scaleX_type="none", select_modes="number", n_modes=1)
        b = StreamingGPR(ArrayStore(X[:, tr]), 1, xyz, P[tr],
                         chunk_rows=7, dtype=np.float64)
        b.fit(scaleX_type="none", select_modes="number", n_modes=1,
              mesh=mesh)
        assert b.Ur.sharding == NamedSharding(mesh, P_("state", None))
        np.testing.assert_array_equal(np.asarray(b.Ur), np.asarray(a.Ur))
        a.train(max_iter=100)
        b.train(max_iter=100)
        A_a, _ = a.predict(P[te])
        A_b, _ = b.predict(P[te])
        np.testing.assert_allclose(np.asarray(A_b), np.asarray(A_a),
                                   rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(np.asarray(b.reconstruct(A_b)),
                                   np.asarray(a.reconstruct(A_a)),
                                   rtol=1e-6)

    def test_update_basis_matches_incore(self, tmp_path):
        from openmeasure_tpu import GPR, StreamingGPR
        P, X, xyz = self._make()
        init = np.arange(0, 20, 2)
        upd = np.arange(1, 11, 2)
        p = str(tmp_path / "x.npy")
        np.save(p, X[:, init])

        gpr = GPR(X[:, init], 1, xyz, P[init])
        gpr.fit(scaleX_type="none", select_modes="number", n_modes=1)
        gpr.train(max_iter=150)
        sgpr = StreamingGPR(p, 1, xyz, P[init], chunk_rows=11,
                            dtype=np.float64)
        sgpr.fit(scaleX_type="none", select_modes="number", n_modes=1)
        sgpr.train(max_iter=150)

        # streaming side assimilates from per-snapshot FILES (only the new
        # ones are read); in-core side from the array
        new_paths = []
        for j, c in enumerate(upd):
            q = str(tmp_path / f"arr_{j}.npy")
            np.save(q, X[:, c])
            new_paths.append(q)
        gpr.update_basis(X[:, upd], P[upd])
        sgpr.update_basis(new_paths, P[upd])

        np.testing.assert_allclose(np.asarray(sgpr.P0), np.asarray(gpr.P0),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(sgpr.Vr), np.asarray(gpr.Vr),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(sgpr._train_Y),
                                   np.asarray(gpr._train_Y), atol=1e-7)
        te = np.arange(11, 20, 2)
        A_i, _ = gpr.predict(P[te])
        A_s, _ = sgpr.predict(P[te])
        np.testing.assert_allclose(np.asarray(A_s), np.asarray(A_i),
                                   rtol=1e-4, atol=1e-8)

    def test_checkpoint_roundtrip_and_serving(self, tmp_path):
        from openmeasure_tpu import StreamingGPR
        from openmeasure_tpu.serving import GPRSensor
        from openmeasure_tpu.utils.checkpoint import save_model, load_model
        P, X, xyz = self._make()
        tr = np.arange(0, 20, 2)
        p = str(tmp_path / "x.npy")
        np.save(p, X[:, tr])
        sgpr = StreamingGPR(p, 1, xyz, P[tr], dtype=np.float64)
        sgpr.fit(scaleX_type="none", select_modes="number", n_modes=1)
        sgpr.train(max_iter=150)

        # include_data needs an in-core X — streaming must refuse loudly
        with pytest.raises(ValueError, match="include_data"):
            save_model(sgpr, str(tmp_path / "bad.npz"), include_data=True)

        ck = str(tmp_path / "sgpr.npz")
        save_model(sgpr, ck)
        loaded = load_model(ck)            # restores as the in-core GPR
        te = np.arange(1, 20, 2)
        A_0, _ = sgpr.predict(P[te])
        A_1, _ = loaded.predict(P[te])
        np.testing.assert_allclose(np.asarray(A_1), np.asarray(A_0),
                                   rtol=1e-6, atol=1e-10)

        sensor = GPRSensor.from_gpr(sgpr)
        fields, _, _ = sensor(P[te])
        x_srv = np.asarray(fields).T                     # (q, n) -> (n, q)
        x_eag = np.asarray(sgpr.reconstruct(np.asarray(A_0)))
        scale = float(np.abs(x_eag).max())
        np.testing.assert_allclose(x_srv, x_eag, atol=1e-5 * scale)

    def test_streaming_pigpr(self, tmp_path):
        from openmeasure_tpu import PIGPR, StreamingPIGPR
        P, X, xyz = self._make()
        tr = np.arange(0, 20, 2)
        p = str(tmp_path / "x.npy")
        np.save(p, X[:, tr])
        P_cstr = P[[1, 3]]
        import jax.numpy as jnp

        def added_loss(ctx):
            # penalize posterior mass above 1 at the constraint points
            return -jnp.sum(jnp.maximum(ctx["output"].mean[-2:], 1.0) - 1.0)

        pig = PIGPR(X[:, tr], 1, xyz, P[tr], P_cstr, added_loss)
        pig.fit(scaleX_type="none", select_modes="number", n_modes=1)
        pig.train(max_iter=100)
        spig = StreamingPIGPR(p, 1, xyz, P[tr], P_cstr, added_loss,
                              chunk_rows=7, dtype=np.float64)
        spig.fit(scaleX_type="none", select_modes="number", n_modes=1)
        spig.train(max_iter=100)
        te = np.arange(1, 20, 2)
        A_i, _ = pig.predict(P[te])
        A_s, _ = spig.predict(P[te])
        np.testing.assert_allclose(np.asarray(A_s), np.asarray(A_i),
                                   rtol=1e-4, atol=1e-8)
        with pytest.raises(ValueError, match="added-loss"):
            spig.update_basis(X[:, 1:3], P[1:3], retrain=True)
        spig.update_basis(X[:, 1:3], P[1:3])
        assert np.asarray(spig.P0).shape[0] == 12
