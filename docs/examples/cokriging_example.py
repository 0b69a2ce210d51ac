"""Multifidelity CoKriging walkthrough: fuse cheap corrupted LF fields with
few HF fields and predict HF fields at new parameters.

    python docs/examples/cokriging_example.py
"""

import numpy as np

from openmeasure_tpu import CoKriging
from openmeasure_tpu.utils.metrics import nrmse

rng = np.random.default_rng(0)
n_cells_hf, n_cells_lf, n_features = 80, 50, 2
n_linked, n_unlinked = 10, 15

xyz_hf = np.zeros((n_cells_hf, 3))
xyz_hf[:, 0] = np.linspace(0, 1, n_cells_hf)
xyz_lf = np.zeros((n_cells_lf, 3))
xyz_lf[:, 0] = np.linspace(0, 1, n_cells_lf)


def field(xyz, P, lofi):
    out = np.zeros((n_features * xyz.shape[0], P.shape[0]))
    for j in range(P.shape[0]):
        f1 = np.sin(2 * np.pi * xyz[:, 0] * (1 + P[j, 0])) \
            + P[j, 1] * xyz[:, 0]
        f2 = np.cos(np.pi * xyz[:, 0] * (2 + P[j, 1]))
        v = np.concatenate([f1, f2])
        out[:, j] = 0.6 * v + 0.1 if lofi else v
    return out


X_l = rng.random((n_linked, 2))
X_u = rng.random((n_unlinked, 2))

ck = CoKriging(X_l, X_u,
               field(xyz_lf, X_l, True), field(xyz_lf, X_u, True),
               field(xyz_hf, X_l, False),
               xyz_lf, xyz_hf, n_features)
ck.manifold_alignment(n_modes_hf=99.9, n_modes_lf=99.9)
print("latent dimensions:", ck.n_latent)
ck.fit()

X_test = rng.random((5, 2))
Y_pred, Y_mse = ck.predict(X_test)
Y_true = field(xyz_hf, X_test, False)
print("CoKriging HF prediction NRMSE:", float(nrmse(Y_pred, Y_true)))

# ---- reference-exact precision: host-f64 latent fits --------------------
# OpenMDAO's MultiFiCoKriging is f64 scipy; engine='host' reruns the
# latent kriging fits on the host CPU in float64 (the manifold alignment
# stays on device) — prediction deviation vs the reference op set drops
# from ~3e-4 (fp32) to the 1e-7 class (BENCH cokriging_pred_dev_vs_ref).
ck_h = CoKriging(X_l, X_u,
                 field(xyz_lf, X_l, True), field(xyz_lf, X_u, True),
                 field(xyz_hf, X_l, False),
                 xyz_lf, xyz_hf, n_features)
ck_h.engine = "host"
ck_h.manifold_alignment(n_modes_hf=99.9, n_modes_lf=99.9)
ck_h.fit()
Y_pred_h, _ = ck_h.predict(X_test)
print("host-f64 CoKriging NRMSE:", float(nrmse(Y_pred_h, Y_true)),
      "| max dev vs device engine:",
      float(np.max(np.abs(Y_pred_h - Y_pred))))
