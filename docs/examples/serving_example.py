"""Production serving walkthrough: train offline, checkpoint, serve
streaming measurements with the compiled SoftSensor.

    python docs/examples/serving_example.py
"""

import time

import numpy as np

from openmeasure_tpu import SPR
from openmeasure_tpu.datasets.synthetic import make_flame_dataset
from openmeasure_tpu.serving import SoftSensor
from openmeasure_tpu.utils.checkpoint import save_model
from openmeasure_tpu.utils.metrics import nrmse

# ---- offline: fit, place sensors, train, checkpoint ----------------------
data = make_flame_dataset(n_cells=4000)
spr = SPR(data["X_train"].astype(np.float32), data["n_features"],
          data["xyz"])
spr.fit(select_modes="number", n_modes=14)
C = np.asarray(spr.optimal_placement())
spr.train(C)
save_model(spr, "/tmp/flame_soft_sensor.npz")

# ---- online: load once, serve many -----------------------------------
sensor = SoftSensor.load("/tmp/flame_soft_sensor.npz").warmup()
rows = np.argmax(C, axis=1)

t0 = time.perf_counter()
n_requests = 50
for j in range(n_requests):
    y = data["X_test"][rows, j % 4]          # streaming sensor readings
    field = sensor(y)                         # (n,) reconstructed state
dt = time.perf_counter() - t0
print(f"{n_requests} requests in {dt:.3f}s "
      f"({dt/n_requests*1e3:.2f} ms/request incl host round-trips)")

err = nrmse(np.asarray(field), data["X_test"][:, (n_requests - 1) % 4])
print("last-request reconstruction NRMSE:", float(err))

# with measurement uncertainties -> coefficient error bars
field, coefs, coef_sigma = sensor.predict_full(
    data["X_test"][rows, 0], 0.05 * np.abs(data["X_test"][rows, 0]))
print("coefficient sigmas:", np.asarray(coef_sigma)[:4])
