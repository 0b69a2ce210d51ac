"""Vector-probe placement + shallow-decoder reconstruction + serving.

Beyond-reference workflow: place physical PROBES (each measuring all 9
features at one cell — `optimal_placement('vdg')`, arXiv:1906.00778), train
a shallow decoder network mapping the probe readings to the full field
(arXiv:2202.05330), compare against gappy POD, then package the decoder as
a compiled `DecoderSensor` and round-trip it through a checkpoint.

    python docs/examples/decoder_example.py
"""

import os
import tempfile

import numpy as np

from openmeasure_tpu import SPR
from openmeasure_tpu.datasets.synthetic import make_flame_dataset
from openmeasure_tpu.sensing.decoder import ShallowDecoder
from openmeasure_tpu.sensing.vector import vector_feature_ids
from openmeasure_tpu.serving import DecoderSensor
from openmeasure_tpu.utils.checkpoint import save_model
from openmeasure_tpu.utils.metrics import nrmse

data = make_flame_dataset(n_cells=4000)       # 9 features x 4000 cells x 41
X_train, X_test = data["X_train"], data["X_test"]
xyz, n_features = data["xyz"], data["n_features"]
n_cells = xyz.shape[0]

# ---- POD basis + vector-probe placement ----------------------------------
spr = SPR(X_train, n_features, xyz)
spr.fit(select_modes="number", n_modes=14)
n_probes = 4                                   # 4 probes x 9 features = 36
C = np.asarray(spr.optimal_placement(calc_type="vdg", n_sensors=n_probes))
print("probe cells:", np.asarray(spr.sensor_points))

# ---- measurement vectors for the held-out snapshots ----------------------
rows = np.argmax(C, axis=1)
ys = []
for col in range(X_test.shape[1]):
    y = np.zeros((len(rows), 3))
    y[:, 0] = X_test[rows, col]
    y[:, 2] = vector_feature_ids(n_probes, n_features)
    ys.append(y)

# ---- gappy POD with the same probes (baseline) ---------------------------
spr.train(C)
ap, _ = spr.predict(ys)
x_pod = np.asarray(spr.reconstruct(np.asarray(ap)))
print("gappy-POD NRMSE:", float(nrmse(x_pod, X_test)))

# ---- shallow decoder: probes -> field -------------------------------------
dec = ShallowDecoder(X_train, n_features, xyz, hidden=(40, 45))
dec.fit(C, epochs=2000, lr=3e-3)
x_dec = np.asarray(dec.predict(ys))
print("decoder NRMSE:", float(nrmse(x_dec, X_test)))

# ---- production serving + checkpoint round-trip --------------------------
with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "decoder.npz")
    save_model(dec, path)
    sensor = DecoderSensor.load(path).warmup()
    Y = np.stack([y[:, 0] for y in ys])            # (4, 36) probe frames
    fields = np.asarray(sensor.predict_batch(Y))   # one dispatch
    print("served-batch NRMSE:", float(nrmse(fields.T, X_test)))
    assert np.allclose(fields.T, x_dec, rtol=1e-4, atol=1e-5)
print("OK")
