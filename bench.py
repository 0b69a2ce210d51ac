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

    # Two-point slope: time the chained loop at K and 2K iterations and
    # difference them — the per-call fixed cost (tunnel round-trip, ~27-55
    # ms and DRIFTING between runs) cancels instead of being estimated,
    # which previously could exceed the K-amortized loop time and clamp
    # the result to 0.  The K and 2K runs are INTERLEAVED in adjacent
    # pairs so slow drift lands inside a pair and cancels; the median
    # over pairs rejects the occasional latency spike.
    def slope_per_iter(loop_fn, k, reps=5):
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
        return max(float(np.median(diffs)) / k, 1e-9)

    our_time = slope_per_iter(
        lambda k: float(bench_loop(X_train, X_test, k)), K)
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

    @jax.jit
    def bench_loop_3d(Xt, Xs, k):
        def body(i, acc):
            res = spr_end_to_end(Xt + acc * 1e-30, Xs, 9, R)
            return res.nrmse.astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t3d = slope_per_iter(
        lambda k: float(bench_loop_3d(X3, X3t, k)), K3, reps=3)
    nrmse_3d = float(spr_end_to_end(X3, X3t, 9, R).nrmse)  # unchained

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
        lambda k: float(bench_loop_gpr(X_train, k)), 2, reps=3)
    gpr_nrmse = float(gpr_end_to_end(X_train, P_train, P_test, X_test,
                                     n_features, R).nrmse)  # unchained

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
            "gpr_nrmse": round(gpr_nrmse, 6),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
