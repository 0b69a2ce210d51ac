"""Physics-informed GPR (PIGPR) walkthrough: keep the reconstructed field
physical at UNOBSERVED parameter values by adding a constraint-point loss
to the GP training objective (the reference's AddedLossTerm recipe,
gpr.py:677-889 / gpr_doc.ipynb).

    python docs/examples/pigpr_example.py

The added loss penalizes temperature-field bound violations ([200, 3000] K)
of the posterior at constraint parameter points placed where there is no
training data — the GP learns hyperparameters whose extrapolations stay
physical, instead of being corrected after the fact like constrained
`predict(limits=...)`.
"""

import jax.numpy as jnp
import numpy as np

from openmeasure_tpu import GPR, PIGPR
from openmeasure_tpu.datasets.synthetic import make_flame_dataset
from openmeasure_tpu.utils.metrics import nrmse

data = make_flame_dataset(n_cells=1500)
X_train, X_test = data["X_train"], data["X_test"]
P_train, P_test = data["P_train"], data["P_test"]
xyz, n_features = data["xyz"], data["n_features"]
n_points = X_train.shape[0] // n_features
R = 6

# Constraint points: the corners + center of the parameter box — regions
# the training LHS design covers thinly, where an unconstrained GP is free
# to extrapolate unphysically.
lo_p, hi_p = P_train.min(axis=0), P_train.max(axis=0)
corners = np.stack(np.meshgrid(*zip(lo_p, hi_p))).reshape(3, -1).T
P_cstr = np.vstack([corners, (lo_p + hi_p) / 2])

# ---- baseline: plain MultiTask GPR --------------------------------------
gpr = GPR(X_train, n_features, xyz, P_train, gpr_type="MultiTask")
gpr.fit(select_modes="number", n_modes=R)
gpr.train(max_iter=400)


def t_violation(model, P_eval):
    """Mean squared temperature bound violation (K^2) at P_eval."""
    A, _ = model.predict(P_eval)
    T = np.asarray(model.reconstruct(A))[:n_points]
    return float(np.mean(np.maximum(T - 3000.0, 0.0) ** 2
                         + np.maximum(200.0 - T, 0.0) ** 2))


# ---- PIGPR: the added loss sees the posterior at [train; constraint] ----
# Reconstruction closure: field rows of the temperature block under the
# fitted basis (x = X_scl * (Ur @ diag(Sigma_r) @ V^T) + X_cnt).
pig = PIGPR(X_train, n_features, xyz, P_train, P_cstr, None)
pig.fit(select_modes="number", n_modes=R)
UrS = jnp.asarray(np.asarray(pig.Ur)[:n_points]
                  * np.asarray(pig.Sigma_r)[None, :])   # (n_points, r)
Xc = jnp.asarray(np.asarray(pig.X_cnt)[:n_points])
Xs = jnp.asarray(np.asarray(pig.X_scl)[:n_points])
n_train = P_train.shape[0]


def added_loss(ctx):
    V = ctx["output"].mean[n_train:]                     # (n_cstr, r)
    T = Xs * (UrS @ V.T) + Xc                            # physical units
    excess = (jnp.maximum(T - 3000.0, 0.0) ** 2
              + jnp.maximum(200.0 - T, 0.0) ** 2)
    return -ctx["loss_dict"]["coef"] * jnp.mean(excess)


pig.AddedLoss = added_loss

# Calibrate the coefficient from the initial MLL scale (the reference's
# compute_mll recipe): make the two terms comparable at iteration 0.
loss_mll, V0 = pig.compute_mll()
T0 = np.asarray(Xs * (UrS @ np.asarray(V0)[n_train:].T) + Xc)
v0 = float(np.mean(np.maximum(T0 - 3000.0, 0.0) ** 2
                   + np.maximum(200.0 - T0, 0.0) ** 2))
# floor at 1 K^2 so a violation-free start still yields a finite weight
# ("one K^2 of violation weighs like the whole initial MLL")
coef = abs(float(loss_mll)) / max(v0, 1.0)
print(f"initial MLL {float(loss_mll):.1f}, initial violation {v0:.1f} K^2 "
      f"-> added-loss coef {coef:.2e}")

pig.train(max_iter=400, loss_dict={"coef": coef})

# ---- compare on held-out parameters and on the constraint points --------
for name, model in (("GPR ", gpr), ("PIGPR", pig)):
    A, _ = model.predict(P_test)
    err = float(nrmse(np.asarray(model.reconstruct(A)), X_test))
    print(f"{name}: test NRMSE {err:.4f}, "
          f"T-bound violation at constraint points "
          f"{t_violation(model, P_cstr):.3f} K^2")
