"""3D workflow: resample unstructured CFD fields onto a voxel grid and run
the sparse-sensing pipeline there — the role of the reference's
pyvista_doc.ipynb (45 sims × ~191k cells × 9 features), without VTK.

    python docs/examples/resampling_3d_example.py
"""

import numpy as np

from openmeasure_tpu import SPR
from openmeasure_tpu.ctc import resample_to_grid
from openmeasure_tpu.utils.metrics import nrmse

rng = np.random.default_rng(0)

# ---- synthetic unstructured 3D CFD: cell centers + parameterized fields ---
n_cells, n_features, m = 20000, 3, 24
pts = rng.uniform(-1, 1, (n_cells, 3))


def fields(P):
    out = np.zeros((n_features * n_cells, len(P)))
    for j, a in enumerate(P):
        f0 = np.exp(-np.sum(pts ** 2, 1) / (0.3 + 0.4 * a))
        f1 = np.sin(np.pi * pts[:, 0] * (1 + a)) * np.cos(np.pi * pts[:, 1])
        f2 = a * pts[:, 2] ** 2
        out[:, j] = np.concatenate([f0, f1, f2])
    return out


P = np.linspace(0.2, 1.0, m)
X = fields(P)

# ---- resample everything onto a 24^3 voxel grid in one KD-tree query -----
grid, X_int, xyz_int = resample_to_grid(pts, X, [25, 25, 25])
print(f"resampled {n_features}x{n_cells} cells x {m} snapshots onto "
      f"{grid.n_cells} voxels -> X_int {X_int.shape}")

# ---- sparse sensing on the voxelized fields -------------------------------
spr = SPR(X_int[:, :20], n_features, xyz_int)
spr.fit(select_modes="number", n_modes=8)
C = np.asarray(spr.optimal_placement())
spr.train(C)

rows = np.argmax(C, axis=1)
y = np.zeros((len(rows), 3))
y[:, 0] = X_int[rows, 22]                     # held-out snapshot sampled
y[:, 2] = rows // grid.n_cells
a, _ = spr.predict(y)
x_rec = np.asarray(spr.reconstruct(a))[:, 0]
print("held-out voxelized reconstruction NRMSE:",
      float(nrmse(x_rec, X_int[:, 22])))
