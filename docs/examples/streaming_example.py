"""Out-of-core soft sensing: StreamingSPR over on-disk snapshot files.

The reference's 3D workflow writes one ``.npy`` field file per simulation and
column-stacks them in RAM (``docs/pyvista_doc.ipynb`` cell 4). This example
runs the same workflow WITHOUT ever materializing the snapshot matrix: the
per-snapshot files stay on disk, the streaming fit reads them in fixed-size
row chunks (native loader + prefetch thread), and placement / train /
predict run on the memory-resident reduced model. Parity with the in-core
class is printed at the end.

    python docs/examples/streaming_example.py
"""

import os
import tempfile

import numpy as np

from openmeasure_tpu import SPR, StreamingSPR
from openmeasure_tpu.datasets.synthetic import make_flame_dataset
from openmeasure_tpu.utils.metrics import nrmse

# ---- write the reference 3D on-disk layout: one file per snapshot --------
data = make_flame_dataset(n_cells=40_000, n_features=9, dtype=np.float32)
X_train, X_test = data["X_train"], data["X_test"]
n_features, xyz = data["n_features"], data["xyz"]

tmp = tempfile.mkdtemp(prefix="omtpu_stream_")
paths = []
for j in range(X_train.shape[1]):
    p = os.path.join(tmp, f"sim_{j:03d}.npy")
    np.save(p, X_train[:, j])
    paths.append(p)
print(f"wrote {len(paths)} snapshot files "
      f"({X_train.nbytes / 1e6:.0f} MB total) to {tmp}")

# ---- streaming fit: fixed-size host buffer, never materializes X ---------
spr = StreamingSPR(paths, n_features, xyz, chunk_rows=60_000)
spr.fit(select_modes="number", n_modes=10)
print(f"streamed fit: rank {spr.r}, Ur {tuple(spr.Ur.shape)} on device")

# ---- the standard post-fit stack (identical API to the in-core SPR) ------
C = np.asarray(spr.optimal_placement())
sensor_rows = np.argmax(C, axis=1)
y = np.zeros((10, 3))
y[:, 0] = C @ X_test[:, 0]
y[:, 2] = sensor_rows // (X_train.shape[0] // n_features)
spr.train(C)
ap, _ = spr.predict(y)
xp = spr.reconstruct(ap)
err = float(nrmse(xp[:, 0], X_test[:, 0]))
print("streamed OLS reconstruction NRMSE:", err)

# ---- parity vs the in-core class ------------------------------------------
# (mode-by-mode comparison is only meaningful below the spectrum's noise
# cluster — subspace alignment via principal angles is the robust check)
spr_ram = SPR(X_train, n_features, xyz)
spr_ram.fit(select_modes="number", n_modes=10)
cosines = np.linalg.svd(np.asarray(spr.Ur).T.astype(np.float64)
                        @ np.asarray(spr_ram.Ur, dtype=np.float64),
                        compute_uv=False)
print(f"streamed-vs-incore subspace principal-angle cosines: "
      f"min {cosines.min():.6f}")
assert cosines.min() > 0.999 and err < 1e-2

# ---- the GP family out-of-core: StreamingGPR ------------------------------
# the snapshot side of fit streams from the same per-snapshot files; the GP
# consumes only the tiny reduced quantities, so train/predict/serving are
# the in-core engines unchanged
from openmeasure_tpu import StreamingGPR

gpr = StreamingGPR(paths, n_features, xyz, data["P_train"],
                   chunk_rows=60_000)
gpr.fit(select_modes="number", n_modes=10)
gpr.train(max_iter=500)
A_pred, A_sigma = gpr.predict(data["P_test"])
xg = np.asarray(gpr.reconstruct(np.asarray(A_pred)))
err_gp = float(nrmse(xg[:, 0], X_test[:, 0]))
print("streamed GPR held-out NRMSE:", err_gp)
assert err_gp < 0.25

for p in paths:
    os.remove(p)
os.rmdir(tmp)
print("ok")
