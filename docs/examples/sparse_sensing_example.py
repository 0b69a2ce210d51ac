"""Sparse-sensing walkthrough on the synthetic flame-scale dataset.

Runnable equivalent of the reference README flow (README.md:157-183 there):
POD fit, QRCP and GEM sensor placement, OLS and constrained (COLS)
reconstruction of held-out snapshots.

    python docs/examples/sparse_sensing_example.py
"""

import numpy as np

from openmeasure_tpu import SPR
from openmeasure_tpu.datasets.synthetic import make_flame_dataset
from openmeasure_tpu.utils.metrics import nrmse

data = make_flame_dataset(n_cells=4000)       # 9 features x 4000 cells x 41
X_train, X_test = data["X_train"], data["X_test"]
xyz, n_features = data["xyz"], data["n_features"]
n_cells = xyz.shape[0]

# ---- POD fit + QRCP placement -------------------------------------------
spr = SPR(X_train, n_features, xyz)
n_sensors = 14
spr.fit(select_modes="number", n_modes=n_sensors)
C_qr = np.asarray(spr.optimal_placement())

sensor_rows = np.argmax(C_qr, axis=1)
print("sensor cells:", sensor_rows % n_cells)
print("sensor features:", sensor_rows // n_cells)

# ---- measure a test simulation at the sensors ---------------------------
y = np.zeros((n_sensors, 3))
y[:, 0] = C_qr @ X_test[:, 3]
y[:, 2] = sensor_rows // n_cells

# ---- OLS gappy-POD reconstruction ---------------------------------------
spr.train(C_qr)
ap, sigmap = spr.predict(y)
xp = spr.reconstruct(ap)
print("OLS reconstruction NRMSE:", float(nrmse(xp[:, 0], X_test[:, 3])))

# ---- constrained (COLS) with physical limits ----------------------------
lo = np.array([200.0] + [0.0] * (n_features - 1))      # T >= 200 K, Y >= 0
hi = np.array([3000.0] + [1.0] * (n_features - 1))     # T <= 3000 K, Y <= 1
spr.train(C_qr, method="COLS", limits=[lo, hi])
ap_c, _ = spr.predict(y)
xp_c = spr.reconstruct(ap_c)
print("COLS reconstruction NRMSE:", float(nrmse(xp_c[:, 0], X_test[:, 3])))

# ---- GEM placement with a minimum sensor distance -----------------------
C_gem = np.asarray(spr.optimal_placement(calc_type="gem", n_sensors=20,
                                         d_min=0.05, verbose=True))
print("GEM sensors:", np.argmax(C_gem, axis=1) % n_cells)
