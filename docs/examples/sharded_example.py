"""Multi-chip sharding walkthrough: the flame SPR pipeline row-sharded over
a (state × mode) device mesh, with mode-parallel GP training.

Runs anywhere: when fewer than 8 real devices are present it creates 8
virtual CPU devices (the same trick the test suite and the multichip dryrun
use), so the sharded programs — psum-Gram SVD, argmax-allreduce QRCP,
sharded COLS/ADMM, mode-sharded GP training — compile and execute exactly
as they would on a real 4x2 TPU slice.

    python docs/examples/sharded_example.py
"""

import os

# Must be set before jax initializes its backends.  Default to the virtual
# CPU mesh; set OPENMEASURE_SHARDED_REAL=1 on a host with >= 8 real chips.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

if not os.environ.get("OPENMEASURE_SHARDED_REAL"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from openmeasure_tpu.datasets.synthetic import make_flame_dataset
from openmeasure_tpu.parallel import sharded

assert len(jax.devices()) >= 8, jax.devices()

# ---- a 4 (state) x 2 (mode) mesh ----------------------------------------
mesh = sharded.make_mesh(n_state=4, n_mode=2)
print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

# ---- data: flame-shaped, padded so n_points divides the state axis ------
R = 8
data = make_flame_dataset(n_cells=12000, n_features=9, m_train=41, m_test=4,
                          dtype=np.float32)
X, Xt = data["X_train"], data["X_test"]

Xb = sharded.shard_snapshots(jnp.asarray(X), 9, mesh)
Xbt = sharded.shard_snapshots(jnp.asarray(Xt), 9, mesh)
print("X sharding:", Xb.sharding.spec)

# ---- sharded SPR: scale -> psum-Gram SVD -> QRCP -> gappy solve ---------
with mesh:
    nrmse, pivots = sharded.sharded_spr_step(Xb, Xbt, R)
print(f"sharded SPR reconstruction NRMSE: {float(nrmse):.2e}; "
      f"pivots: {np.asarray(pivots).tolist()}")
assert float(nrmse) < 1e-3

# ---- sharded COLS (constrained) reconstruction --------------------------
# physical per-feature limits that bracket the data (as the reference's
# flame example uses T in [200, 3000], species in [0, 1])
Xf = X.reshape(9, -1)
lo = (Xf.min(axis=1) - 0.1 * np.ptp(Xf, axis=1)).astype(np.float32)
hi = (Xf.max(axis=1) + 0.1 * np.ptp(Xf, axis=1)).astype(np.float32)
with mesh:
    nrmse_c, _, _, _ = sharded.sharded_spr_cols_step(
        Xb, Xbt, R, jnp.asarray(lo), jnp.asarray(hi), max_iter=2000)
print(f"sharded COLS reconstruction NRMSE: {float(nrmse_c):.2e}")
assert float(nrmse_c) < 1e-3

# ---- mode-parallel GP training (same early-stop semantics as GPR.train) -
P0 = jnp.asarray(np.linspace(0, 1, 41)[:, None].astype(np.float32))
rng = np.random.default_rng(0)
Vr = jnp.asarray(rng.standard_normal((41, R)).astype(np.float32))
res = sharded.sharded_gpr_train(mesh, P0, Vr, max_iter=60)
print("per-mode GP iterations:", np.asarray(res.iterations).tolist())

# ---- multi-chip SERVING: shard a packaged soft sensor over the mesh -----
from openmeasure_tpu import SPR
from openmeasure_tpu.serving import SoftSensor

spr = SPR(X, 9, data["xyz"])
spr.fit(select_modes="number", n_modes=R)
C = np.asarray(spr.optimal_placement())
spr.train(C)
sensor = SoftSensor.from_spr(spr)
sharded_sensor = sensor.shard(mesh)            # row-sharded state, SPMD
rows = np.argmax(C, axis=1)
Y = np.asarray(Xt, np.float32)[rows].T         # (4 frames, s)
fields, A, sig = sharded_sensor.predict_batch(Y)
f_single, _, _ = sensor.predict_batch(Y)
dev = float(np.max(np.abs(np.asarray(fields) - np.asarray(f_single))))
print(f"sharded serving field sharding: {fields.sharding.spec}; "
      f"max |sharded - single| = {dev:.2e}")
assert dev <= 1e-4 * float(np.max(np.abs(np.asarray(f_single))))

# ---- out-of-core x multi-chip: the STREAMED fit on the same mesh --------
# (each disk chunk's rows upload to their state shard as the stream
# completes them; factors equal the single-device streaming fit exactly)
from openmeasure_tpu.streaming import ArrayStore, StreamingROM

s_plain = StreamingROM(ArrayStore(np.asarray(X)), 9, chunk_rows=4096)
s_plain.fit(select_modes="number", n_modes=R)
s_mesh = StreamingROM(ArrayStore(np.asarray(X)), 9, chunk_rows=4096)
s_mesh.fit(select_modes="number", n_modes=R, mesh=mesh)
d_stream = float(np.max(np.abs(np.asarray(s_mesh.Ur)
                               - np.asarray(s_plain.Ur))))
print(f"streamed sharded fit: Ur sharding {s_mesh.Ur.sharding.spec}, "
      f"max |mesh - plain| = {d_stream:.1e} (exact)")
assert d_stream == 0.0
print("OK")
