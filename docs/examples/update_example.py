"""Online assimilation: incremental basis updates as new snapshots arrive.

The reference has no way to fold new snapshots into a fitted model short of
a full refit (``ROM.fit`` recomputes the SVD, ``sparse_sensing.py:463-511``);
``GPR.update`` extends only the GP training data. This example shows the
TPU-native incremental path:

1. fit an ``SPR`` soft sensor on an initial snapshot ensemble,
2. assimilate newly arrived snapshots with ``update_basis`` — three narrow
   (n, r+q) device panel passes + a tiny host-f64 core SVD, no refit, and
   the trained sensor's ``Theta = C @ Ur`` is re-derived automatically,
3. do the same out-of-core: ``StreamingSPR.update_basis`` streams ONLY the
   new snapshot files — the original store is never re-read.

    python docs/examples/update_example.py
"""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from openmeasure_tpu import SPR, StreamingSPR
from openmeasure_tpu.datasets.synthetic import make_flame_dataset

# ---- flame-scale data; hold 3 snapshots back as the "newly arrived" batch
data = make_flame_dataset(n_cells=18362, n_features=9, m_train=38,
                          m_test=5, seed=0)
X = np.asarray(data["X_train"], np.float32)          # initial ensemble
X_new = np.asarray(data["X_test"], np.float32)[:, :3]  # arrives later
X_hold = np.asarray(data["X_test"], np.float32)[:, 3:]  # never trained on
n, r = X.shape[0], 14

# the arriving snapshots carry a NEW REGIME the initial ensemble never saw —
# a coherent localized structure (e.g. a secondary reaction zone) on the
# first feature block.  Without assimilation the fitted basis cannot
# represent it; update_basis folds the new direction in without a refit.
xyz = np.asarray(data["xyz"], np.float64)
n_points = n // 9
bump = np.exp(-np.sum((xyz - xyz.mean(0) - 0.25 * xyz.std(0)) ** 2, axis=1)
              / (0.3 * xyz.std()) ** 2)
u_regime = np.zeros(n, np.float32)
u_regime[:n_points] = (bump / np.linalg.norm(bump)).astype(np.float32)
amp = np.abs(X[:n_points]).max()                     # strong, visible regime
X_new = X_new + np.outer(u_regime, amp * np.array([1.0, 0.8, 1.2],
                                                  np.float32))

# ---- 1. fit + place + train on the initial ensemble ----------------------
spr = SPR(jnp.asarray(X), 9, data["xyz"])
spr.fit(select_modes="number", n_modes=r)
C = spr.optimal_placement()
spr.train(C)


def reconstruct_from_sensors(model, x_col):
    piv = np.asarray(model.C).argmax(axis=1)         # sensor-ordered pivots
    y = np.stack([x_col[piv], np.zeros(piv.size),
                  piv // (n // 9)], axis=1)
    ar, _ = model.predict(y)
    return np.asarray(model.reconstruct(ar))[:, 0]


def nrmse(rec, truth):
    return (np.linalg.norm(rec - truth)
            / (truth.max() - truth.min()) / np.sqrt(truth.size))


print("before update: NRMSE on a new-regime snapshot "
      f"{nrmse(reconstruct_from_sensors(spr, X_new[:, 0]), X_new[:, 0]):.2e}")

# ---- 2. assimilate the new snapshots (no refit), growing the rank by one
# to CAPTURE the new direction instead of trading a fitted mode for it;
# placement is refreshed for the grown basis (microseconds — no refit)
spr.update_basis(X_new, n_modes=r + 1)
spr.train(spr.optimal_placement())
print(f"after update_basis: rank {spr.r}, ensemble now "
      f"{spr.X.shape[1]} snapshots, {spr.Theta.shape[0]} sensors")
print("  new snapshot   NRMSE "
      f"{nrmse(reconstruct_from_sensors(spr, X_new[:, 0]), X_new[:, 0]):.2e}")
print("  held-out       NRMSE "
      f"{nrmse(reconstruct_from_sensors(spr, X_hold[:, 0]), X_hold[:, 0]):.2e}")

# ---- 3. the same flow out-of-core: only the NEW files are read -----------
tmp = tempfile.mkdtemp(prefix="omtpu_update_")
np.save(os.path.join(tmp, "initial.npy"), X)
new_paths = []
for j in range(X_new.shape[1]):
    p = os.path.join(tmp, f"arrival_{j}.npy")
    np.save(p, X_new[:, j])
    new_paths.append(p)

ss = StreamingSPR(os.path.join(tmp, "initial.npy"), 9, data["xyz"],
                  chunk_rows=300_000)
ss.fit(select_modes="number", n_modes=r)
ss.train(C)
ss.update_basis(new_paths, n_modes=r + 1)   # streams ONLY the 3 new files
ss.train(ss.optimal_placement())
print(f"streaming update: rank {ss.r}; new-snapshot NRMSE "
      f"{nrmse(reconstruct_from_sensors(ss, X_new[:, 0]), X_new[:, 0]):.2e}")

# ---- 4. the parameter→field family: GPR.update_basis assimilates (P, X)
# pairs — the basis grows AND the GP training targets are re-set (the
# update rotates every right factor), with frozen parameter scaling.
# retrain=True warm-starts from the trained hyperparameters when the rank
# is kept (n_modes=None); growing the rank (as here, to capture the new
# regime) drops the per-mode stacks and retrain=True trains fresh.
from openmeasure_tpu import GPR

P_tr = np.asarray(data["P_train"])
P_new, P_hold = np.asarray(data["P_test"])[:3], np.asarray(data["P_test"])[3:]
gpr = GPR(jnp.asarray(X), 9, data["xyz"], P_tr)
gpr.fit(select_modes="number", n_modes=r)
gpr.train(max_iter=300)
gpr.update_basis(X_new, P_new, n_modes=r + 1, retrain=True)
A_pred, _ = gpr.predict(P_new)
rec = np.asarray(gpr.reconstruct(np.asarray(A_pred)))
print(f"GPR update: rank {gpr.r}, training set {gpr.P0.shape[0]} points; "
      f"assimilated-snapshot NRMSE {nrmse(rec[:, 0], X_new[:, 0]):.2e}")
