"""Temporal soft sensing: DMD spectral analysis + Kalman-filtered serving.

Beyond-reference workflow (the reference reconstructs each frame
independently): on a TIME-ORDERED snapshot series,

1. :class:`openmeasure_tpu.DMD` extracts the dynamic spectrum (growth
   rates / frequencies / modes) and forecasts beyond the training window;
2. :class:`openmeasure_tpu.DynamicSensor` packages a trained SPR together
   with identified reduced-coefficient dynamics and Kalman-filters a noisy
   measurement stream — beating the memoryless gappy solve under noise.

    python docs/examples/dynamics_example.py
"""

import time

import numpy as np

from openmeasure_tpu import SPR, DMD
from openmeasure_tpu.serving import SoftSensor, DynamicSensor
from openmeasure_tpu.utils.metrics import nrmse

# ---- synthetic time series: 3 traveling/decaying wave pairs lifted to a
# large state (the kind of series a high-rate camera or probe rig records)
rng = np.random.default_rng(0)
n_points, n_features, m_train, m_test = 50_000, 2, 60, 40
n = n_points * n_features
r_true = 6
L, _ = np.linalg.qr(rng.standard_normal((n, r_true)).astype(np.float64))
L *= np.array([[3.0, 3.0, 1.5, 1.5, 0.8, 0.8]])


def rot(th, rho):
    return rho * np.array([[np.cos(th), -np.sin(th)],
                           [np.sin(th), np.cos(th)]])


A_z = np.zeros((r_true, r_true))
A_z[0:2, 0:2] = rot(0.35, 0.998)
A_z[2:4, 2:4] = rot(0.12, 0.995)
A_z[4:6, 4:6] = rot(0.58, 0.99)
z = rng.standard_normal(r_true)
Z = []
for _ in range(m_train + m_test):
    Z.append(z)
    z = A_z @ z + 0.02 * rng.standard_normal(r_true)
Z = np.array(Z)
X = (L @ Z.T).astype(np.float32) + 5.0
X_train, X_test = X[:, :m_train], X[:, m_train:]
xyz = rng.standard_normal((n_points, 3))

# ---- DMD: spectrum + forecast ------------------------------------------
t0 = time.perf_counter()
dmd = DMD(X_train, n_features, xyz)
dmd.fit(dt=1.0, select_modes="number", n_modes=8)
print(f"DMD fit ({n}x{m_train}, r={dmd.r}): "
      f"{time.perf_counter() - t0:.2f} s")
order = np.argsort(-np.abs(dmd.amplitudes))[:3]
for j in order:
    print(f"  mode |lam|={np.abs(dmd.eigs[j]):.4f} "
          f"freq={dmd.frequencies[j]:+.4f} cycles/step "
          f"growth={dmd.growth_rates[j]:+.4f}")
X_fc = np.asarray(dmd.forecast_horizon(10))
err_fc = float(nrmse(X_fc, X_test[:, :10]))
print(f"  10-step forecast NRMSE vs truth: {err_fc:.4f}")
assert err_fc < 0.2, err_fc

# ---- Kalman-filtered serving vs the memoryless solve --------------------
spr = SPR(X_train, n_features, xyz)
spr.fit(select_modes="number", n_modes=6)
C = np.asarray(spr.optimal_placement())
spr.train(C)

rows = np.argmax(C, axis=1)
Y_clean = X_test[rows, :].T                      # (m_test, s)
sigma = 0.5 * np.std(Y_clean, axis=0)
Y_noisy = Y_clean + rng.standard_normal(Y_clean.shape) * sigma[None, :]
Y_sigma = np.broadcast_to(sigma, Y_clean.shape)

static = SoftSensor.from_spr(spr).warmup()
dyn = DynamicSensor.from_spr(spr).warmup(batch=m_test)

t0 = time.perf_counter()
X_kf, A_kf, V_kf = dyn.filter_batch(Y_noisy, Y_sigma)
X_kf = np.asarray(X_kf)
print(f"KF series ({m_test} frames): {time.perf_counter() - t0:.3f} s")
X_st = np.asarray(static.predict_batch(Y_noisy, Y_sigma)[0])

err_kf = float(nrmse(X_kf.T, X_test))
err_st = float(nrmse(X_st.T, X_test))
print(f"reconstruction NRMSE under 50% sensor noise: "
      f"filtered {err_kf:.4f} vs memoryless {err_st:.4f} "
      f"({err_st / err_kf:.1f}x better)")
assert err_kf < 0.8 * err_st, (err_kf, err_st)

# offline: RTS smoothing conditions every frame on the WHOLE series
X_sm = np.asarray(dyn.smooth_batch(Y_noisy, Y_sigma)[0])
err_sm = float(nrmse(X_sm.T, X_test))
print(f"RTS-smoothed NRMSE: {err_sm:.4f} "
      f"(filter {err_kf:.4f}, memoryless {err_st:.4f})")
assert err_sm < err_kf, (err_sm, err_kf)

# dropped sensors: NaN entries are masked (pure prediction), not propagated
Y_holes = Y_noisy.copy()
Y_holes[3, :] = np.nan                           # a whole frame lost
Y_holes[7, 0] = np.nan                           # one dead sensor
X_h = np.asarray(dyn.filter_batch(Y_holes, Y_sigma)[0])
assert np.all(np.isfinite(X_h))
print(f"with dropped frames/sensors: NRMSE {nrmse(X_h.T, X_test):.4f} "
      f"(still finite, still filtered)")

# lookahead: measurement-free rollout of the identified dynamics
X_fc2, _, V_fc2 = dyn.forecast(10)
print(f"10-frame measurement-free forecast NRMSE: "
      f"{float(nrmse(np.asarray(X_fc2).T, X_test[:, :10])):.4f}")

# streaming: one frame at a time, identical to the batch filter
dyn.reset()
x_last = None
for k in range(5):
    x_last, a, v = dyn.step(Y_noisy[k], Y_sigma[k])
drift = float(np.max(np.abs(np.asarray(x_last)
                            - X_kf[4])))
print(f"step-vs-batch max |delta| after 5 frames: {drift:.2e}")
assert drift < 1e-3, drift
print("dynamics example OK")
