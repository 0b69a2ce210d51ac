"""GPR ROM walkthrough: parameter→state regression with uncertainty,
CPOD, constrained prediction, and online updating.

    python docs/examples/gpr_example.py
"""

import numpy as np

from openmeasure_tpu import GPR
from openmeasure_tpu.datasets.synthetic import make_flame_dataset
from openmeasure_tpu.utils.metrics import nrmse

data = make_flame_dataset(n_cells=2000)
X_train, X_test = data["X_train"], data["X_test"]
P_train, P_test = data["P_train"], data["P_test"]
xyz, n_features = data["xyz"], data["n_features"]

# ---- SingleTask GPR: r independent GPs trained as one vmapped program ---
gpr = GPR(X_train, n_features, xyz, P_train)
gpr.fit(select_modes="number", n_modes=10)
gpr.train(max_iter=500)
Ap, Sigmap = gpr.predict(P_test)
Xp = gpr.reconstruct(Ap)
print("GPR reconstruction NRMSE:", float(nrmse(Xp, X_test)))
print("coefficient uncertainties (first test point):",
      np.asarray(Sigmap)[0, :4])

# ---- CPOD: constrain the POD coefficients to physical bounds ------------
lo = np.array([200.0] + [0.0] * (n_features - 1))
hi = np.array([3000.0] + [1.0] * (n_features - 1))
gpr_c = GPR(X_train, n_features, xyz, P_train, gpr_type="MultiTask")
gpr_c.fit(select_modes="number", n_modes=5)
gpr_c.CPOD(limits=[lo, hi])
gpr_c.train(max_iter=300)

# ---- constrained prediction (Gaussian MAP under the same bounds) --------
Ap_c, _ = gpr_c.predict(P_test, limits=[lo, hi])
Xp_c = gpr_c.reconstruct(Ap_c)
print("constrained-GPR NRMSE:", float(nrmse(Xp_c, X_test)))
print("min/max reconstructed T:", Xp_c[:2000].min(), Xp_c[:2000].max())

# ---- online update with soft-sensor output ------------------------------
gpr.update(P_test[:1], np.asarray(Ap)[:1], retrain=False)
print("training set after update:", gpr._train_X.shape)

# ---- reference-exact precision: the host-f64 engine ---------------------
# The reference trains its GPs in double (gpytorch .double()); the TPU
# path is fp32.  engine='host' reruns the SAME GP programs on the host
# CPU in float64 — at flagship scale this lands the reconstruction NRMSE
# exactly on the reference's own f64 result (BASELINE.md round-5 row).
gpr_h = GPR(X_train, n_features, xyz, P_train)
gpr_h.fit(select_modes="number", n_modes=10)
gpr_h.train(max_iter=500, engine="host")
Ap_h, _ = gpr_h.predict(P_test)
print("host-f64 engine NRMSE:", float(nrmse(gpr_h.reconstruct(
    np.asarray(Ap_h, np.float32)), X_test)),
    "(posterior dtype:", np.asarray(Ap_h).dtype, ")")
