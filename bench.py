#!/usr/bin/env python
"""Benchmark: flagship SPR pipeline on the flame-scale workload.

Runs the full soft-sensing flow — POD fit (scale + truncated SVD) + QRCP
sensor placement + gappy-POD reconstruction of 4 test snapshots — on the
(165258 x 41) flame-shaped synthetic dataset, end-to-end on the accelerator,
and compares against the reference implementation's algorithm (numpy/scipy
LAPACK float64 on CPU: np.linalg.svd + scipy.linalg.qr(pivoting=True) + pinv,
exactly the ops at sparse_sensing.py:272/:739/:877 of the reference).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}
value = our wall-clock (s); vs_baseline = reference_time / our_time (speedup).
"""

import json
import time

import numpy as np


def time_reference_cpu(X_train, X_test, n_features, r):
    """Reference algorithm (README flow) with numpy/scipy, float64 CPU."""
    import scipy.linalg as la

    t0 = time.perf_counter()
    # ROM.scale_data (std, axis_cnt=1)
    n, m = X_train.shape
    n_points = n // n_features
    X_cnt = np.mean(X_train, axis=1)[:, None]
    X_scl = np.zeros((n, 1))
    for i in range(n_features):
        X_scl[i * n_points:(i + 1) * n_points] = np.std(
            X_train[i * n_points:(i + 1) * n_points])
    X0 = (X_train - X_cnt) / X_scl
    # ROM.decomposition
    U, S, Vt = np.linalg.svd(X0, full_matrices=False)
    Ur = U[:, :r]
    # SPR.optimal_placement('qr')
    _, _, P = la.qr(Ur.T, pivoting=True, mode="economic")
    piv = P[:r]
    # SPR.train + predict (OLS) + reconstruct
    Theta = Ur[piv, :]
    y0 = (X_test[piv, :] - X_cnt[piv, 0][:, None]) / X_scl[piv, 0][:, None]
    Ar = (np.linalg.pinv(Theta) @ y0).T
    X_rec = (Ur @ Ar.T) * X_scl + X_cnt
    t1 = time.perf_counter()
    err = X_rec - X_test
    nrmse = float(np.sqrt(np.mean(err ** 2)) / (X_test.max() - X_test.min()))
    return t1 - t0, nrmse, piv


def time_reference_gpr_cpu(X_train, P_train, P_test, X_test, n_features, r,
                           max_iter=1000, rel_error=1e-5, lr=0.1):
    """Reference GPR-ROM flow, reference op set on CPU: numpy f64 scale+SVD
    (``gpr.py:356-402``), then r SERIAL torch-f64 Adam+Cholesky −MLL loops
    with the reference's stop rule (the op set of the gpytorch/libtorch
    trainer at ``gpr.py:220-251`` crossed r times serially at
    ``gpr.py:497-509``: Matern-2.5 + constant mean + softplus noise, full
    Cholesky MLL gradient per iteration), then per-mode posterior predict +
    reconstruction (``gpr.py:517-567``)."""
    import torch

    t0 = time.perf_counter()
    n, m = X_train.shape
    n_points = n // n_features
    X_cnt = np.mean(X_train, axis=1)[:, None]
    X_scl = np.zeros((n, 1))
    for i in range(n_features):
        X_scl[i * n_points:(i + 1) * n_points] = np.std(
            X_train[i * n_points:(i + 1) * n_points])
    X0 = (X_train - X_cnt) / X_scl
    U, S, Vt = np.linalg.svd(X0, full_matrices=False)
    Ur = U[:, :r]
    Ar = (S[:r, None] * Vt[:r]).T                      # (m, r)
    Sigma_r = np.linalg.norm(Ar, axis=0)
    Vr = Ar / Sigma_r[None, :]
    P_cnt, P_scl = P_train.mean(0), P_train.std(0)
    P0 = (P_train - P_cnt) / P_scl
    P0_test = (P_test - P_cnt) / P_scl

    Xt = torch.tensor(P0, dtype=torch.float64)
    Xs = torch.tensor(P0_test, dtype=torch.float64)
    p = Xt.shape[0]
    eps = torch.finfo(torch.float64).eps ** 2
    sp = torch.nn.functional.softplus

    def matern(A, B, ls):
        diff = (A[:, None, :] - B[None, :, :]) / ls
        d2 = (diff * diff).sum(-1)
        safe = d2 > eps
        rr = torch.sqrt(torch.where(safe, d2, torch.ones_like(d2)))
        c = np.sqrt(5.0) * rr
        k = (1 + c + 5.0 / 3.0 * d2) * torch.exp(-c)
        return torch.where(safe, k, torch.ones_like(k))

    A_pred = np.zeros((P_test.shape[0], r))
    for i in range(r):                                  # SERIAL over modes
        y = torch.tensor(Vr[:, i], dtype=torch.float64)
        raw_ls = torch.zeros(1, dtype=torch.float64, requires_grad=True)
        raw_noise = torch.zeros((), dtype=torch.float64, requires_grad=True)
        constant = torch.zeros((), dtype=torch.float64, requires_grad=True)
        opt = torch.optim.Adam([raw_ls, raw_noise, constant], lr=lr)
        loss_old, e, j = 1e10, 1e10, 0
        while (e > rel_error) and (j < max_iter):       # gpr.py:230
            opt.zero_grad()
            ls = sp(raw_ls)
            noise = sp(raw_noise) + 1e-4
            Kmat = matern(Xt, Xt, ls) \
                + (noise + 1e-8) * torch.eye(p, dtype=torch.float64)
            L = torch.linalg.cholesky(Kmat)
            resid = y - constant
            alpha = torch.cholesky_solve(resid[:, None], L)[:, 0]
            loss = -(-0.5 * resid @ alpha
                     - torch.log(torch.diagonal(L)).sum()
                     - 0.5 * p * np.log(2 * np.pi)) / p
            loss.backward()
            e = abs(float(loss.detach()) - loss_old)
            loss_old = float(loss.detach())
            opt.step()
            j += 1
        with torch.no_grad():
            ls = sp(raw_ls)
            noise = sp(raw_noise) + 1e-4
            Kmat = matern(Xt, Xt, ls) \
                + (noise + 1e-8) * torch.eye(p, dtype=torch.float64)
            L = torch.linalg.cholesky(Kmat)
            alpha = torch.cholesky_solve((y - constant)[:, None], L)[:, 0]
            A_pred[:, i] = (constant + matern(Xs, Xt, ls) @ alpha).numpy() \
                * Sigma_r[i]
    X_rec = (Ur @ A_pred.T) * X_scl + X_cnt
    t1 = time.perf_counter()
    err = X_rec - X_test
    nrmse = float(np.sqrt(np.mean(err ** 2)) / (X_test.max() - X_test.min()))
    return t1 - t0, nrmse


def _mfk_problem(K=8, n_lf=40, n_hf=15, n_test=25, d=2, seed=3):
    """Forrester-style two-fidelity multi-output latent workload — the
    shape of the reference's latent co-kriging stage (K models on shared
    parameter sites, ``cokriging.py:113-119``)."""
    rng = np.random.default_rng(seed)
    X_lf = rng.random((n_lf, d))
    X_hf = X_lf[::max(1, n_lf // n_hf)][:n_hf]
    X_test = rng.random((n_test, d))

    def hf(X, k):
        return np.sin(3 * X[:, 0] + 0.7 * k) + 0.5 * np.cos(2 * X[:, 1] + k)

    Y_hf = np.stack([hf(X_hf, k) for k in range(K)])
    Y_lf = np.stack([0.6 * hf(X_lf, k) - 0.3 + 0.2 * X_lf[:, 0]
                     for k in range(K)])
    return X_lf, Y_lf, X_hf, Y_hf, X_test


def time_reference_cokriging_cpu(X_lf, Y_lf, X_hf, Y_hf, X_test):
    """Reference latent co-kriging op set on CPU: K SERIAL OpenMDAO-style
    ``MultiFiCoKriging`` fits + predicts (``cokriging.py:109-144``) in
    numpy f64 — per level, multistart gradient-free COBYLA on the same
    concentrated NLL (openmdao's optimizer family), GLS terms, recursive
    predict.  Same 5-point start grid and θ bounds as our fit."""
    from scipy.optimize import minimize as _min

    llo, lhi = np.log10(1e-6), np.log10(100.0)
    d = X_lf.shape[1]
    rng = np.random.default_rng(0)
    s0 = np.clip(np.log10(np.full(d, 0.5)), llo, lhi)
    starts = [s0]
    for _ in range(2):
        starts.append(np.clip(s0 + 0.3 * (2 * rng.random(d) - 1), llo, lhi))
    for _ in range(2):
        starts.append(llo + (lhi - llo) * rng.random(d))

    def corr(theta, A, B):
        dd = A[:, None, :] - B[None, :, :]
        return np.exp(-np.sum(theta * dd * dd, axis=-1))

    def nll(log_t, X, F, y):
        theta = 10.0 ** np.clip(log_t, llo, lhi)
        n = X.shape[0]
        R = corr(theta, X, X) + 1e-10 * np.eye(n)
        try:
            L = np.linalg.cholesky(R)
        except np.linalg.LinAlgError:
            return 1e12
        Fi = np.linalg.solve(L.T, np.linalg.solve(L, F))
        yi = np.linalg.solve(L.T, np.linalg.solve(L, y))
        beta = np.linalg.solve(F.T @ Fi, F.T @ yi)
        resid = y - F @ beta
        ri = np.linalg.solve(L.T, np.linalg.solve(L, resid))
        sigma2 = (resid @ ri) / n
        return float(n * np.log(max(sigma2, 1e-300))
                     + 2.0 * np.sum(np.log(np.diagonal(L))))

    def fit_level(X, F, y):
        best, best_f = None, np.inf
        for st in starts:                      # multistart COBYLA, serial
            res = _min(lambda lt: nll(lt, X, F, y), st, method="COBYLA",
                       options={"rhobeg": 0.5, "tol": 1e-6, "maxiter": 200})
            if res.fun < best_f:
                best, best_f = res.x, res.fun
        theta = 10.0 ** np.clip(best, llo, lhi)
        n = X.shape[0]
        R = corr(theta, X, X) + 1e-10 * np.eye(n)
        Ri = np.linalg.inv(R)
        G = F.T @ Ri @ F
        beta = np.linalg.solve(G, F.T @ Ri @ y)
        resid = y - F @ beta
        gamma = Ri @ resid
        return dict(X=X, F=F, theta=theta, beta=beta, gamma=gamma,
                    sigma2=(resid @ gamma) / n, Ri=Ri, G=G)

    def predict(levels, l, Xs):
        lev = levels[l]
        rmat = corr(lev["theta"], Xs, lev["X"])
        ones = np.ones((Xs.shape[0], 1))
        if l == 0:
            f = ones
            m_prev = s2_prev = np.zeros(Xs.shape[0])
            rho = np.zeros(Xs.shape[0])
        else:
            m_prev, s2_prev = predict(levels, l - 1, Xs)
            rho = (ones @ lev["beta"][:1]).ravel()
            f = np.concatenate([ones * m_prev[:, None], ones], axis=1)
        mean = f @ lev["beta"] + rmat @ lev["gamma"]
        Ri_rT = lev["Ri"] @ rmat.T
        rRr = np.sum(rmat.T * Ri_rT, axis=0)
        u = lev["F"].T @ Ri_rT - f.T
        uGu = np.sum(u * np.linalg.solve(lev["G"], u), axis=0)
        var = lev["sigma2"] * np.maximum(1.0 - rRr + uGu, 0.0)
        if l > 0:
            var = var + rho ** 2 * s2_prev
        return mean, var

    # normalization (openmdao normalize=True)
    X_all = np.concatenate([X_lf, X_hf])
    Xm, Xs_ = X_all.mean(0), X_all.std(0)
    Xs_[Xs_ == 0] = 1.0
    t0 = time.perf_counter()
    K = Y_lf.shape[0]
    means = np.zeros((K, X_test.shape[0]))
    for k in range(K):                          # SERIAL over latent dims
        yall = np.concatenate([Y_lf[k], Y_hf[k]])
        ym, ys = yall.mean(), yall.std() or 1.0
        Xn_lf, Xn_hf = (X_lf - Xm) / Xs_, (X_hf - Xm) / Xs_
        lev0 = fit_level(Xn_lf, np.ones((len(X_lf), 1)), (Y_lf[k] - ym) / ys)
        m_prev, _ = predict([lev0], 0, Xn_hf)
        F1 = np.concatenate([m_prev[:, None], np.ones((len(X_hf), 1))],
                            axis=1)
        lev1 = fit_level(Xn_hf, F1, (Y_hf[k] - ym) / ys)
        mean, _ = predict([lev0, lev1], 1, (X_test - Xm) / Xs_)
        means[k] = mean * ys + ym
    t1 = time.perf_counter()
    return t1 - t0, means


def time_reference_gem_cpu(Ur, xyz_tiled, n_sensors, d_min):
    """Reference GEM op set (``sparse_sensing.py:586-698``): greedy
    conditional-variance sensor selection with the per-candidate ``np.cov``
    Python loop (``:670-678``), d_min masking, and the 1e-5 random
    Σ_AA jitter.  Selection only — Ur is computed outside the timer (both
    sides receive the same basis)."""
    t0 = time.perf_counter()
    sigma = np.var(Ur, ddof=1, axis=1)
    coef = 1.0 / np.sqrt(sigma.max()) * 2
    Ur_scl = Ur * coef
    Ur_msk = Ur_scl
    xyz_msk = xyz_tiled
    index_msk = np.arange(Ur.shape[0])
    sel = []
    sigma_coef = np.var(Ur_msk, ddof=1, axis=1)
    mask_d = None
    for s in range(n_sensors):
        if s == 0:
            i_s = int(np.argmax(sigma_coef))
        else:
            Ur_msk = Ur_msk[mask_d]
            xyz_msk = xyz_msk[mask_d]
            index_msk = index_msk[mask_d]
            Sigma_aa = np.cov(Ur_scl[sel, :], ddof=1)
            if s == 1:
                Sigma_aa_inv = np.atleast_2d(1.0 / Sigma_aa)
            else:
                noise = 1e-5 * np.random.normal(size=Sigma_aa.shape[0])
                Sigma_aa_inv = np.linalg.inv(Sigma_aa + np.diag(noise))
            temp = np.zeros(index_msk.size)
            for j in range(index_msk.size):
                Sig = np.cov(Ur_scl[sel, :], Ur_msk[j, :], ddof=1)
                temp[j] = (Sig[-1, -1]
                           - Sig[-1, :-1] @ Sigma_aa_inv @ Sig[:-1, -1])
            i_s = int(np.argmax(temp))
        sel.append(int(index_msk[i_s]))
        mask_d = np.linalg.norm(xyz_msk[i_s] - xyz_msk, axis=1) >= d_min
    return time.perf_counter() - t0, np.array(sel)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    from openmeasure_tpu.datasets.synthetic import make_flame_dataset
    from openmeasure_tpu.pipelines import spr_end_to_end

    R = 14  # sensors = modes, README default
    data = make_flame_dataset()
    n_features = data["n_features"]
    X_train64, X_test64 = data["X_train"], data["X_test"]

    # --- reference (CPU, float64, LAPACK) ---
    # The CPU baseline is sensitive to background load (observed 0.6-8 s
    # for the same work).  Take the min over 5 runs, and when the spread
    # is still large (max/min > 3: a load spike hit every run) keep
    # sampling up to 5 more — the min converges to the unloaded time.
    ref_runs = [time_reference_cpu(X_train64, X_test64, n_features, R)
                for _ in range(5)]
    times_ref = [t for t, _, _ in ref_runs]
    extra = 0
    # keep sampling until the min is REPRODUCED (a second sample within
    # 20% of it) — an early load spike then costs at most the runs needed
    # to confirm the min, not a fixed burn-down
    while (sum(t <= 1.2 * min(times_ref) for t in times_ref) < 2
           and extra < 5):
        times_ref.append(
            time_reference_cpu(X_train64, X_test64, n_features, R)[0])
        extra += 1
    ref_time = min(times_ref)
    ref_nrmse = ref_runs[0][1]

    # --- ours (accelerator, float32) ---
    # Timing methodology: the TPU may sit behind a high-latency tunnel where
    # even block_until_ready returns before remote completion, so we (a) force
    # a host readback of a scalar that depends on the whole computation, and
    # (b) chain K data-dependent pipeline executions inside one jitted loop,
    # timing at K and 2K so the per-call fixed cost cancels (see
    # slope_per_iter below).
    X_train = jnp.asarray(X_train64, dtype=jnp.float32)
    X_test = jnp.asarray(X_test64, dtype=jnp.float32)

    K = 20

    # k is a TRACED argument (fori_loop lowers to while_loop), so ONE
    # compilation serves both the K and 2K timing shapes — remote compiles
    # through the tunnel cost 40 s-6 min each, and the slope method would
    # otherwise pay two per pipeline.
    @jax.jit
    def bench_loop(X_train, X_test, k):
        def body(i, acc):
            # acc-dependent perturbation serializes iterations and defeats CSE
            res = spr_end_to_end(X_train + acc * 1e-30, X_test,
                                 n_features, R)
            return res.nrmse.astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    # warm the dispatch path once before any timing
    _ = float(jax.jit(lambda x: x * 1.0)(jnp.zeros((1,), jnp.float32))[0])

    # --- tunnel telemetry (round-5): a one-shot round-trip + bandwidth
    # probe recorded in the artifact, so the wall rows (streaming upload,
    # GEM/CTC single-dispatch walls) are attributable to tunnel weather
    # from the JSON alone — the same 95 MB basis transfer has measured
    # 19 vs 1.5 MB/s hours apart (BASELINE.md streaming row).
    probe_small = (jnp.zeros((8,), jnp.float32) + 0.0)
    _ = float(jnp.sum(probe_small))                  # warm
    t_rt = min(_timed(lambda: float(jnp.sum(probe_small)))
               for _ in range(5))
    # Bandwidth by SIZE-SLOPE (the repo's two-point timing convention —
    # never subtract a separately measured round-trip, CLAUDE.md): time a
    # big and a small transfer and difference them, so the per-call fixed
    # cost cancels exactly instead of being estimated.
    _MB_BIG, _MB_SMALL = 16.0, 4.0

    def _up_once(mb):
        h = np.zeros((int(mb * 1024 * 1024) // 4,), np.float32)
        d = jax.device_put(h)
        _ = float(jnp.sum(d[:: 65536]))              # force the transfer
    t_up_b = min(_timed(lambda: _up_once(_MB_BIG)) for _ in range(2))
    t_up_s = min(_timed(lambda: _up_once(_MB_SMALL)) for _ in range(2))
    # download must read a DATA-DEPENDENT array produced on device: a
    # device_put result keeps its host buffer and a jitted constant is
    # host-materialized, so np.asarray on either returns without touching
    # the wire (measured: a bogus 16 GB/s "download"); only the FIRST
    # read transfers — build a fresh array per size.

    def _down_time(mb):
        h = np.zeros((int(mb * 1024 * 1024) // 4,), np.float32)
        seed_d = jax.device_put(h)
        _ = float(jnp.sum(seed_d[:: 65536]))
        big_d = jax.jit(lambda x: x * 1.0001 + 0.5)(seed_d)
        _ = float(jnp.sum(big_d[:: 65536]))
        return _timed(lambda: np.asarray(big_d))
    t_down_b = _down_time(_MB_BIG)
    t_down_s = _down_time(_MB_SMALL)
    d_mb = _MB_BIG - _MB_SMALL
    tunnel = {
        "tunnel_roundtrip_s": round(t_rt, 4),
        "tunnel_upload_mb_s": round(d_mb / max(t_up_b - t_up_s, 1e-3), 1),
        "tunnel_download_mb_s": round(d_mb / max(t_down_b - t_down_s,
                                                 1e-3), 1),
    }

    # --- variance bookkeeping (round-5): every timed row records its
    # per-rep spread [min, median, max] alongside the headline value, so
    # round-over-round drift is separable from tunnel/load noise in the
    # artifact itself (BENCH_r03→r04 3D-row ambiguity).
    spreads = {}

    def _record(key, samples, scale=1.0):
        vals = sorted(float(s) * scale for s in samples)
        spreads[key + "_spread"] = [
            round(vals[0], 9), round(float(np.median(vals)), 9),
            round(vals[-1], 9)]

    def wall_min(fn, key=None, reps=3):
        ts = [_timed(fn) for _ in range(reps)]
        if key:
            _record(key, ts)
        return min(ts)

    # Two-point slope: time the chained loop at K and 2K iterations and
    # difference them — the per-call fixed cost (tunnel round-trip, ~27-55
    # ms and DRIFTING between runs) cancels instead of being estimated,
    # which previously could exceed the K-amortized loop time and clamp
    # the result to 0.  The K and 2K runs are INTERLEAVED in adjacent
    # pairs so slow drift lands inside a pair and cancels; the median
    # over pairs rejects the occasional latency spike.
    def slope_per_iter(loop_fn, k, reps=5, key=None, scale=1.0):
        _ = loop_fn(k)          # warmup/compile both shapes
        _ = loop_fn(2 * k)
        diffs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = loop_fn(k)
            t1 = time.perf_counter()
            _ = loop_fn(2 * k)
            t2 = time.perf_counter()
            diffs.append((t2 - t1) - (t1 - t0))
        if key:
            _record(key, [max(d / k, 1e-9) for d in diffs], scale)
        return max(float(np.median(diffs)) / k, 1e-9)

    _record("reference_cpu_s", times_ref)
    our_time = slope_per_iter(
        lambda k: float(bench_loop(X_train, X_test, k)), K, key="value")
    # Accuracy is measured on an UNCHAINED call: fusing the iteration-
    # serializing perturbation into the loop body changes how XLA compiles
    # the scale+Gram region and degrades the computed NRMSE ~5x (measured
    # 1.28e-6 single vs 6.2e-6 chained) — the chained value is a timing
    # artifact, not the pipeline's accuracy.
    our_nrmse = float(spr_end_to_end(X_train, X_test, n_features, R).nrmse)

    # --- 3D scale (reference pyvista_doc: 191,511 cells x 9 features = 1.7M
    # rows, 45 sims) — demonstrates the same pipeline at 10x the state dim ---
    data3d = make_flame_dataset(n_cells=191511, n_features=9, m_train=45,
                                m_test=4, seed=1, dtype=np.float32)
    X3 = jnp.asarray(data3d["X_train"])
    X3t = jnp.asarray(data3d["X_test"])
    K3 = 5

    # svd_width=2r: the refine passes act on a 28-wide subspace; measured
    # 9.9 -> 9.3 ms with NRMSE 2.8e-6 -> 2.4e-6 (the guard columns absorb
    # the first Gram's mode-mixing leakage; see linalg/svd.py docstring)
    @jax.jit
    def bench_loop_3d(Xt, Xs, k):
        def body(i, acc):
            res = spr_end_to_end(Xt + acc * 1e-30, Xs, 9, R,
                                 svd_width=2 * R)
            return res.nrmse.astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t3d = slope_per_iter(
        lambda k: float(bench_loop_3d(X3, X3t, k)), K3, reps=3,
        key="pipeline_3d_1p7M_rows_s")
    nrmse_3d = float(spr_end_to_end(X3, X3t, 9, R,
                                    svd_width=2 * R).nrmse)  # unchained

    # --- GPR ROM pipeline (second model family): full fit + 1000-iteration
    # vmapped GP training of all 14 modes + posterior + reconstruction ---
    # Same K-vs-2K chained-slope timing as the other rows (the single-shot
    # roundtrip-subtract measurement scattered 0.10-0.14 s run to run).
    from openmeasure_tpu.pipelines import gpr_end_to_end
    P_train = jnp.asarray(data["P_train"], jnp.float32)
    P_test = jnp.asarray(data["P_test"], jnp.float32)

    @jax.jit
    def bench_loop_gpr(Xt, k):
        def body(i, acc):
            res = gpr_end_to_end(Xt + acc * 1e-30, P_train, P_test,
                                 X_test, n_features, R)
            return res.nrmse.astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t_gpr = slope_per_iter(
        lambda k: float(bench_loop_gpr(X_train, k)), 2, reps=3,
        key="gpr_fit_train1000_predict_s")
    gpr_nrmse = float(gpr_end_to_end(X_train, P_train, P_test, X_test,
                                     n_features, R).nrmse)  # unchained

    # reference GPR baseline: r serial torch-f64 Adam+Cholesky loops (the
    # reference's own op set and stop rule); min over 2 runs (load spikes)
    ref_gpr_runs = [time_reference_gpr_cpu(
        X_train64, np.asarray(data["P_train"], np.float64),
        np.asarray(data["P_test"], np.float64), X_test64, n_features, R)
        for _ in range(3)]
    ref_gpr_time = min(t for t, _ in ref_gpr_runs)
    _record("reference_gpr_cpu_s", [t for t, _ in ref_gpr_runs])
    ref_gpr_nrmse = ref_gpr_runs[0][1]

    # --- round-5 accuracy config: fp32 device fit + host-f64 GP stage
    # (GPR.train(engine='host') — the reference's own double-precision GP
    # numerics, gpr.py:480-481,503-504).  This is the recommended
    # max-accuracy flow; the TIMED row above stays the all-fp32
    # single-program path (annotated below), because the host stage runs
    # on the 1-core host CPU (seconds) and would otherwise dominate a
    # 15 ms device row.  Measured r5: lands gpr_nrmse at the reference's
    # own f64 result (0.014428 deflated / 0.014430 plain basis — the
    # plain fit is used here since its compiles are shared with the
    # serving section's SPR fit; warm host stage ≈ 3.2 s). ---
    from openmeasure_tpu import GPR as _GPR
    gpr_h = _GPR(X_train, n_features, data["xyz"],
                 np.asarray(data["P_train"]))
    gpr_h.fit(select_modes="number", n_modes=R)
    t0_h = time.perf_counter()
    gpr_h.train(max_iter=1000, engine="host")
    A_h, _sig_h = gpr_h.predict(np.asarray(data["P_test"]))
    t_gpr_host_stage = time.perf_counter() - t0_h
    X_rec_h = np.asarray(gpr_h.reconstruct(np.asarray(A_h, np.float32)))
    err_h = X_rec_h - X_test64
    gpr_nrmse_host = float(np.sqrt(np.mean(err_h ** 2))
                           / (X_test64.max() - X_test64.min()))

    # --- CoKriging latent stage (third model family): K=8 two-level
    # recursive co-kriging fits + predicts as ONE XLA program, vs the
    # reference's K serial OpenMDAO-style fits (COBYLA multistart) ---
    from openmeasure_tpu.pipelines import mfk_end_to_end
    X_lf, Y_lf, X_hf, Y_hf, X_mfkt = _mfk_problem()
    ref_ck_runs = [time_reference_cokriging_cpu(X_lf, Y_lf, X_hf, Y_hf,
                                                X_mfkt) for _ in range(3)]
    ref_ck_time = min(t for t, _ in ref_ck_runs)
    _record("reference_cokriging_cpu_s", [t for t, _ in ref_ck_runs])
    ref_ck_means = ref_ck_runs[0][1]

    Xlf_j = jnp.asarray(X_lf, jnp.float32)
    Ylf_j = jnp.asarray(Y_lf, jnp.float32)
    Xhf_j = jnp.asarray(X_hf, jnp.float32)
    Yhf_j = jnp.asarray(Y_hf, jnp.float32)
    Xt_j = jnp.asarray(X_mfkt, jnp.float32)

    @jax.jit
    def bench_loop_mfk(Xl, k):
        def body(i, acc):
            res = mfk_end_to_end(Xl + acc * 1e-30, Ylf_j, Xhf_j, Yhf_j,
                                 Xt_j)
            return jnp.sum(res.mean).astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t_mfk = slope_per_iter(
        lambda k: float(bench_loop_mfk(Xlf_j, k)), 3, reps=3,
        key="cokriging_fit_predict_s")
    our_ck_means = np.asarray(mfk_end_to_end(Xlf_j, Ylf_j, Xhf_j, Yhf_j,
                                             Xt_j).mean)  # unchained
    ck_dev = float(np.sqrt(np.mean((our_ck_means - ref_ck_means) ** 2))
                   / (ref_ck_means.max() - ref_ck_means.min()))

    # round-5 accuracy config: host-f64 latent fits (BatchedMFK
    # engine='host' — OpenMDAO's own f64 numerics; the x64 probe pins
    # agreement at 8.8e-8 where the fp32 chain sits at ~3e-4).  Same
    # timed-vs-accuracy-config split as the GPR rows, annotated below.
    from openmeasure_tpu.multifi.mfk import BatchedMFK as _BMFK
    t0_ckh = time.perf_counter()
    _bh = _BMFK(engine="host")
    _bh.fit([X_lf, X_hf], [Y_lf, Y_hf])
    ck_means_host, _ = _bh.predict(X_mfkt)
    t_ck_host_stage = time.perf_counter() - t0_ckh
    ck_dev_host = float(
        np.sqrt(np.mean((ck_means_host - ref_ck_means) ** 2))
        / (ref_ck_means.max() - ref_ck_means.min()))

    # --- CTC projection (fourth workload family): the reference's ctc_doc
    # example scale — 32^3 voxel grid, 64x64 sensor, parallel rays
    # (docs/ctc_doc.ipynb cells 9-10; the reference's hot loop is 4096
    # serial Python iterations each calling VTK C++
    # find_cells_intersecting_line, utils.py:366-379).  VTK is NOT
    # installed in this environment, so no measured reference ratio is
    # reported for this row — only our absolute numbers: the device DDA
    # trace of the full 4096-ray bundle (chained-slope, round-trip-free)
    # and the user-visible wall-clock of camera.project() end-to-end
    # (device trace + host CSR assembly, INCLUDING the tunnel round-trip).
    from openmeasure_tpu.ctc import VoxelGrid, camera as ctc_camera
    from openmeasure_tpu.ctc.raytrace import trace_rays

    grid32 = VoxelGrid.from_bounds((-0.1, 0.1, -0.1, 0.1, -0.1, 0.1),
                                   (32, 32, 32))
    cam = ctc_camera(np.array([0.0, 0.0, 1.0, 1.0]), np.zeros(3), 0.05,
                     2.8, 0.06, np.array([64, 64]), 0.25 / 64)
    p1s, p2s, _pix = cam._make_rays("parallel", 1,
                                    np.random.default_rng(0))
    P1 = jnp.asarray(p1s, jnp.float32)
    P2 = jnp.asarray(p2s, jnp.float32)
    org = jnp.asarray(grid32.origin, jnp.float32)
    spc = jnp.asarray(grid32.spacing, jnp.float32)

    @jax.jit
    def bench_loop_ctc(P1, k):
        def body(i, acc):
            cells, counts = trace_rays(P1 + acc * 1e-30, P2, org, spc,
                                       (32, 32, 32))
            # both outputs must feed acc, else XLA dead-code-eliminates the
            # per-step cell writes and the loop times a gutted kernel
            live = jnp.sum(counts) + jnp.sum(jnp.maximum(cells, 0))
            return live.astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    # K=200: the SoA tracer is ~0.13 ms/iter — at K=20 the 27-55 ms tunnel
    # round-trip drift swamps the slope (median went negative, clamping to
    # the 1e-9 floor and printing 0.0)
    t_ctc = slope_per_iter(lambda k: float(bench_loop_ctc(P1, k)), 200,
                           reps=3, key="ctc_trace_4096rays_32cube_s")
    t_proj = wall_min(lambda: cam.project(grid32, "parallel"),
                      key="ctc_project_wall_s")
    # full-model walls: the stochastic projection models trace N_rand
    # rays/pixel (8x the parallel bundle) and dedup per pixel — formerly
    # never timed; the device-side dedup + compressed readback makes
    # their wall ~one tunnel round-trip too
    t_proj_ph = wall_min(lambda: cam.project(grid32, "pinhole",
                                             N_rand=8, seed=0),
                         key="ctc_pinhole_wall_s")
    t_proj_tl = wall_min(lambda: cam.project(grid32, "thin_lens",
                                             N_rand=8, seed=0),
                         key="ctc_thinlens_wall_s")
    # 4-view rig in ONE device dispatch (stack_cameras batches every
    # view's bundle through a single trace+assembly; per-view
    # project+vstack measured ~2.7x slower at this shape)
    from openmeasure_tpu.ctc.projection import stack_cameras
    cams_rig = [ctc_camera(np.array([0.3 * np.sin(i), 0.0, 1.0, 1.0]),
                           np.array([0.0, 0.0, i * np.pi / 4]), 0.05,
                           2.8, 0.06, np.array([64, 64]), 0.25 / 64)
                for i in range(4)]
    t_rig = wall_min(lambda: stack_cameras(cams_rig, grid32, "parallel",
                                           seed=0),
                     key="ctc_rig4_wall_s")

    # --- GEM placement (second placement family): greedy conditional-
    # entropy selection, 10 sensors at 20k rows, d_min=0.05 — the reference
    # runs a per-candidate np.cov Python loop per sensor (O(s·n) cov
    # builds); ours is ONE jitted fixed-shape program.  Both sides select
    # from the SAME f64 basis (selection-algorithm timing only; ~244 s at
    # full 165k-row flame scale for the reference op set — measured at 20k
    # to keep bench bounded; our full-scale warm time is 66 ms wall /
    # 1.45 ms device slope with a device-resident basis) ---
    from openmeasure_tpu.sensing.gem import gem_select
    data_gem = make_flame_dataset(n_cells=2223)        # 20,007 rows
    Xg = np.asarray(data_gem["X_train"], np.float64)
    nfg = data_gem["n_features"]
    ng = Xg.shape[0]
    npts_g = ng // nfg
    cnt_g = np.mean(Xg, axis=1)[:, None]
    scl_g = np.zeros((ng, 1))
    for i in range(nfg):
        scl_g[i * npts_g:(i + 1) * npts_g] = np.std(
            Xg[i * npts_g:(i + 1) * npts_g])
    Ug, _, _ = np.linalg.svd((Xg - cnt_g) / scl_g, full_matrices=False)
    Ur_g = Ug[:, :R]
    xyz_g = np.tile(np.asarray(data_gem["xyz"], np.float64), (nfg, 1))
    _gem_runs = [time_reference_gem_cpu(Ur_g, xyz_g, 10, 0.05)
                 for _ in range(3)]
    ref_gem_time = min(t for t, _ in _gem_runs)
    _record("reference_gem_cpu_s", [t for t, _ in _gem_runs])
    _ref_sel = _gem_runs[0][1]
    Ur_g32 = jnp.asarray(Ur_g, jnp.float32)
    xyz_g32 = jnp.asarray(xyz_g, jnp.float32)
    _ = gem_select(Ur_g32, xyz_g32, 10, d_min=0.05)    # compile + warm
    t_gem = wall_min(lambda: gem_select(Ur_g32, xyz_g32, 10, d_min=0.05),
                     key="gem_placement_20k_10sensors_s")

    # Device-time row (CLAUDE.md slope convention): the wall row above
    # includes the ~27-55 ms tunnel round-trip of the fused host readback,
    # which is real user latency here but not the selection's device cost.
    from openmeasure_tpu.sensing.gem import _gem_select_jit
    mask_g = jnp.ones((ng,), bool)
    dmin_g = jnp.asarray(0.05, jnp.float32)

    @jax.jit
    def bench_loop_gem(Ur0, k):
        def body(i, acc):
            # acc-dependent perturbation (underflows to +0 in fp32, so the
            # selection is bit-identical) serializes iterations / defeats CSE
            sel, step_scores, _, _ = _gem_select_jit(
                Ur0 * (1.0 + acc * 1e-30), xyz_g32, mask_g, dmin_g, 10)
            return (jnp.sum(step_scores)
                    + jnp.sum(sel).astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    # K=200 like the CTC row: the selection is ~0.1-1 ms/iter on device, so
    # K=8 left the K-vs-2K difference inside the 27-55 ms round-trip drift
    # (median went negative → clamped → printed 0.0)
    t_gem_dev = slope_per_iter(
        lambda k: float(bench_loop_gem(Ur_g32, k)), 200, reps=3,
        key="gem_device_20k_10sensors_s")

    # --- Serving (production path): the packaged CONSTRAINED soft sensor
    # on the flagship flame model — COLS with physical per-feature limits,
    # fixed 300-iteration ADMM budget, batch-50 frame stream (the
    # README/serving.md headline workflow).  Chained-slope per-frame device
    # time; the eager fit/placement/train here is the user packaging path.
    from openmeasure_tpu import SPR as _SPR
    from openmeasure_tpu.serving import SoftSensor, _predict_many
    spr_srv = _SPR(np.asarray(X_train64, np.float32), n_features,
                   data["xyz"])
    spr_srv.fit(select_modes="number", n_modes=R)
    C_srv = np.asarray(spr_srv.optimal_placement())
    npts_srv = X_train64.shape[0] // n_features
    Xb = X_train64.reshape(n_features, npts_srv, -1)
    f_lo, f_hi = Xb.min(axis=(1, 2)), Xb.max(axis=(1, 2))
    pad_f = 0.05 * (f_hi - f_lo)
    spr_srv.train(C_srv, method="COLS",
                  limits=[f_lo - pad_f, f_hi + pad_f])
    sensor = SoftSensor.from_spr(spr_srv)
    rows_srv = np.argmax(C_srv, axis=1)
    frames = np.asarray(X_test64, np.float32)[rows_srv]      # (s, 4)
    Yb = jnp.asarray(np.tile(frames.T, (13, 1))[:50], jnp.float32)
    Sb = jnp.zeros_like(Yb)
    state_srv = sensor._state

    @jax.jit
    def bench_loop_srv(Y, k):
        def body(i, acc):
            x, a, a_sig = _predict_many(
                state_srv, Y + acc * 1e-30, Sb, method="COLS",
                admm_iters=sensor.admm_iters,
                over_relax=sensor.admm_over_relax)
            # all three outputs live (full predict_full contract)
            return (jnp.sum(x[:, :: 4096]) + jnp.sum(a)
                    + jnp.sum(a_sig)) * jnp.float32(1e-12)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t_srv_frame = slope_per_iter(
        lambda k: float(bench_loop_srv(Yb, k)), 20, reps=3,
        key="serving_cols_batch50_per_frame_s", scale=1 / 50.0) / 50.0

    # round-5 fast path: SoftSensor(admm_rho='fixed') — fixed-rho ADMM
    # with hoisted factorization and normless body (linalg/boxls
    # adapt_rho=False); measured 2.0x at equivalent converged accuracy
    @jax.jit
    def bench_loop_srv_fx(Y, k):
        def body(i, acc):
            x, a, a_sig = _predict_many(
                state_srv, Y + acc * 1e-30, Sb, method="COLS",
                admm_iters=sensor.admm_iters,
                over_relax=sensor.admm_over_relax, adapt_rho=False)
            return (jnp.sum(x[:, :: 4096]) + jnp.sum(a)
                    + jnp.sum(a_sig)) * jnp.float32(1e-12)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t_srv_frame_fx = slope_per_iter(
        lambda k: float(bench_loop_srv_fx(Yb, k)), 20, reps=3,
        key="serving_cols_fixedrho_batch50_per_frame_s",
        scale=1 / 50.0) / 50.0

    # --- Shallow-decoder serving (nonlinear reconstruction family): the
    # batched DecoderSensor forward at flagship scale — the 14 QRCP sensor
    # readings feed a (40, 45) ReLU MLP emitting the 165,258-dim field.
    # Training epochs are kept short (this row times the compiled serving
    # forward, not training; the 2000-epoch training cost is documented in
    # docs/parity.md).
    from openmeasure_tpu.sensing.decoder import ShallowDecoder
    from openmeasure_tpu.serving import (DecoderSensor,
                                         _decoder_predict_kernel)
    dec_b = ShallowDecoder(np.asarray(X_train64, np.float32), n_features,
                           data["xyz"], hidden=(40, 45))
    dec_b.fit(C_srv, epochs=50, lr=3e-3)
    dsensor = DecoderSensor.from_decoder(dec_b)
    Yd = jnp.asarray(np.tile(frames.T, (13, 1))[:50], jnp.float32)
    dstate = dsensor._state

    @jax.jit
    def bench_loop_dec(Y, k):
        def body(i, acc):
            out = _decoder_predict_kernel(dstate, Y + acc * 1e-30)
            return jnp.sum(out[:, :: 4096]).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t_dec_frame = slope_per_iter(
        lambda k: float(bench_loop_dec(Yd, k)), 50, reps=3,
        key="serving_decoder_batch50_per_frame_s", scale=1 / 50.0) / 50.0

    # --- Kalman-filtered serving (temporal family): a 50-frame noisy
    # measurement series filtered through the identified reduced dynamics
    # and reconstructed at flagship scale — ONE scan program per series
    # (serving.DynamicSensor; no reference analog, the reference solves
    # every frame independently).
    from openmeasure_tpu.serving import DynamicSensor, _kf_serve_series
    ksensor = DynamicSensor.from_spr(spr_srv)
    kstate = ksensor._state
    a0_k, P0_k = ksensor._a0, ksensor._P0
    Sk = jnp.full_like(Yd, 0.05)

    @jax.jit
    def bench_loop_kf(Y, k):
        def body(i, acc):
            X, Af, var, *_ = _kf_serve_series(kstate, Y + acc * 1e-30, Sk,
                                              a0_k, P0_k)
            return (jnp.sum(X[:, :: 4096]) + jnp.sum(Af)
                    + jnp.sum(var)).astype(jnp.float32) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t_kf_frame = slope_per_iter(
        lambda k: float(bench_loop_kf(Yd, k)), 20, reps=3,
        key="serving_kf_batch50_per_frame_s", scale=1 / 50.0) / 50.0

    # --- Streaming tier (out-of-core): POD fit of the 3D-scale panel
    # DIRECTLY FROM DISK (1.7M x 45 float32 = 307 MB npy; native chunk
    # loader + double-buffered prefetch, X0 never materialized; default
    # engine='host' — f64 BLAS spectral passes at disk speed, one (n, r)
    # device upload).  Wall-clock includes all disk passes; min over 2
    # runs (the second rides the page cache, the steady production
    # state).  On this TUNNELED device the row is transfer-bound: the
    # device engine ships (2+refine)·n·m·4 = 921 MB at ~20 MB/s (46-59 s
    # measured); the host engine ships n·r·4 = 95 MB (13.5-21 s).  No
    # reference analog exists: the reference is strictly in-RAM (SURVEY
    # §5 long-context row).
    import os
    import tempfile
    from openmeasure_tpu.streaming import StreamingROM
    tmpd = tempfile.mkdtemp(prefix="omtpu_bench_stream_")
    npy_path = os.path.join(tmpd, "X3.npy")
    np.save(npy_path, np.asarray(data3d["X_train"], np.float32))
    t_stream = t_stream_passes = np.inf
    _stream_walls, _stream_passes_list = [], []
    for _ in range(2):
        srom = StreamingROM(npy_path, 9)
        t0 = time.perf_counter()
        srom.fit(select_modes="number", n_modes=R)
        # fit() returns after the host passes + upload ENQUEUE;
        # block_until_ready lies on the tunneled device (SKILL.md), so the
        # 95 MB basis transfer is only forced by a readback that depends
        # on the uploaded array.  Report both: the host-pass time (the
        # engine's real disk+BLAS cost, stable ~5-7 s) and the
        # upload-inclusive wall (tunnel-bandwidth weather: the same 95 MB
        # measured 5 s and 64 s hours apart — 19 vs 1.5 MB/s).
        t_pass = time.perf_counter() - t0
        _ = float(jnp.sum(srom.Ur[:: 100000, 0]))   # force the upload
        _stream_walls.append(time.perf_counter() - t0)
        _stream_passes_list.append(t_pass)
        t_stream = min(t_stream, _stream_walls[-1])
        t_stream_passes = min(t_stream_passes, t_pass)
    os.remove(npy_path)
    os.rmdir(tmpd)
    n3_rows = data3d["X_train"].shape[0]
    _record("streaming_fit_from_disk_1p7M_rows_s", _stream_walls)
    _record("streaming_host_passes_s", _stream_passes_list)

    print(json.dumps({
        "metric": "SPR end-to-end (POD fit + QRCP placement + gappy-POD "
                  "reconstruction, 165258x41 flame, r=14)",
        "value": round(our_time, 6),
        "unit": "s",
        "vs_baseline": round(ref_time / our_time, 3),
        "detail": {
            "reference_cpu_s": round(ref_time, 6),
            "our_nrmse": round(our_nrmse, 6),
            "reference_nrmse": round(ref_nrmse, 6),
            "pipeline_3d_1p7M_rows_s": round(t3d, 6),
            "nrmse_3d": round(nrmse_3d, 6),
            "gpr_fit_train1000_predict_s": round(t_gpr, 6),
            "gpr_nrmse": round(gpr_nrmse_host, 6),
            "gpr_nrmse_fp32_device": round(gpr_nrmse, 6),
            "gpr_host_stage_s": round(t_gpr_host_stage, 3),
            "gpr_config_note": "timed row = all-fp32 single-program "
                               "device pipeline; gpr_nrmse = the "
                               "max-accuracy config (fp32 device fit + "
                               "host-f64 GP stage, engine='host', its "
                               "host-stage wall in gpr_host_stage_s); "
                               "the pure-fp32 accuracy is "
                               "gpr_nrmse_fp32_device",
            "reference_gpr_cpu_s": round(ref_gpr_time, 6),
            "reference_gpr_nrmse": round(ref_gpr_nrmse, 6),
            "gpr_vs_baseline": round(ref_gpr_time / t_gpr, 3),
            "cokriging_fit_predict_s": round(t_mfk, 6),
            "reference_cokriging_cpu_s": round(ref_ck_time, 6),
            "cokriging_vs_baseline": round(ref_ck_time / t_mfk, 3),
            "cokriging_pred_dev_vs_ref": round(ck_dev_host, 8),
            "cokriging_pred_dev_fp32_device": round(ck_dev, 6),
            "cokriging_host_stage_s": round(t_ck_host_stage, 3),
            "cokriging_config_note": "timed row = fp32 device program; "
                                     "pred_dev_vs_ref = host-f64 latent "
                                     "fits (engine='host', wall in "
                                     "cokriging_host_stage_s); fp32 "
                                     "deviation kept as "
                                     "cokriging_pred_dev_fp32_device",
            "ctc_trace_4096rays_32cube_s": round(t_ctc, 8),
            "ctc_project_wall_s": round(t_proj, 6),
            "ctc_pinhole_wall_s": round(t_proj_ph, 6),
            "ctc_thinlens_wall_s": round(t_proj_tl, 6),
            "ctc_rig4_wall_s": round(t_rig, 6),
            "gem_placement_20k_10sensors_s": round(t_gem, 6),
            "gem_device_20k_10sensors_s": round(t_gem_dev, 8),
            "serving_cols_batch50_per_frame_s": round(t_srv_frame, 8),
            "serving_cols_fixedrho_batch50_per_frame_s":
                round(t_srv_frame_fx, 8),
            "serving_decoder_batch50_per_frame_s": round(t_dec_frame, 9),
            "serving_kf_batch50_per_frame_s": round(t_kf_frame, 9),
            "streaming_fit_from_disk_1p7M_rows_s": round(t_stream, 6),
            "streaming_host_passes_s": round(t_stream_passes, 6),
            "streaming_rows_per_s": round(n3_rows / t_stream_passes, 0),
            "reference_gem_cpu_s": round(ref_gem_time, 6),
            # ratio from the DEVICE slope (round-5): the wall row is one
            # tunnel round-trip (~110x the device time), so a wall-based
            # ratio benchmarks the tunnel, not the framework
            "gem_vs_baseline": round(ref_gem_time / t_gem_dev, 3),
            "gem_wall_vs_baseline": round(ref_gem_time / t_gem, 3),
            # wall rows dominated by the host<->device round-trip (their
            # device cost is the matching *_device/trace slope row)
            "roundtrip_bound": ["gem_placement_20k_10sensors_s",
                                "ctc_project_wall_s",
                                "ctc_pinhole_wall_s",
                                "ctc_thinlens_wall_s", "ctc_rig4_wall_s",
                                "streaming_fit_from_disk_1p7M_rows_s"],
            **tunnel,
            "spreads": {k: v for k, v in sorted(spreads.items())},
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # The tunneled TPU backend occasionally reports a transient
        # UNAVAILABLE during init (and jax caches the failed backend for the
        # life of the process) — re-exec a fresh process a couple of times
        # before giving up so a flaky window doesn't record a bogus failure.
        import os
        import sys

        msg = repr(e)
        transient = ("UNAVAILABLE" in msg
                     or "Unable to initialize backend" in msg
                     or "DEADLINE_EXCEEDED" in msg)
        attempt = int(os.environ.get("OMTPU_BENCH_ATTEMPT", "0"))
        if transient and attempt < 2:
            os.environ["OMTPU_BENCH_ATTEMPT"] = str(attempt + 1)
            print(f"bench: transient backend failure, retrying "
                  f"(attempt {attempt + 2}/3): {msg[:200]}", file=sys.stderr)
            time.sleep(60)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
