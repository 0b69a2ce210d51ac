"""CTC tomography walkthrough: two cameras, device-traced projections,
sparse-sensing reconstruction of a 3D emission field.

    python docs/examples/ctc_example.py
"""

import numpy as np
import scipy.sparse as sp

from openmeasure_tpu import SPR
from openmeasure_tpu.ctc import VoxelGrid, camera
from openmeasure_tpu.utils.metrics import nrmse

# ---- reconstruction grid ------------------------------------------------
grid = VoxelGrid.from_bounds((-0.1, 0.1, -0.1, 0.1, -0.1, 0.1),
                             (16, 16, 16))
xyz = grid.cell_centers()

# ---- parameterized emission fields (gaussian blobs) ---------------------
widths = np.linspace(0.3, 1.0, 12)
X = np.stack([np.exp(-np.sum(xyz ** 2, axis=1) / (2 * (0.05 * a) ** 2))
              for a in widths], axis=1)

# ---- two cameras, orthogonal views --------------------------------------
cams = [
    camera(np.array([0, 0, 1.0, 1.0]), np.zeros(3), 0.05, 2.8, 0.06,
           np.array([16, 16]), 0.25 / 16),
    camera(np.array([1.0, 0, 0.0, 1.0]), np.array([0.0, np.pi / 2, 0.0]),
           0.05, 2.8, 0.06, np.array([16, 16]), 0.25 / 16),
]
C = sp.vstack([c.project(grid, "parallel") for c in cams]).tocsr()
C = C.astype(float)
print("projection operator:", C.shape, "nnz:", C.nnz)

# ---- sparse-sensing reconstruction of a held-out field ------------------
spr = SPR(X[:, :10], 1, xyz)
spr.fit(select_modes="number", n_modes=5)
spr.train(C)

y = np.zeros((C.shape[0], 3))
y[:, 0] = C @ X[:, 11]          # measured pixel intensities
a, _ = spr.predict(y)
x_rec = np.asarray(spr.reconstruct(a))[:, 0]
print("tomographic reconstruction NRMSE:",
      float(nrmse(x_rec, X[:, 11])))
