"""Shallow-decoder reconstruction (beyond-reference capability).

Sensor-to-field reconstruction with a *shallow decoder network* (Williams,
Zahn & Kutz, "Data-driven sensor placement with shallow decoder networks",
arXiv:2202.05330 — see PAPERS.md): a small MLP maps the s sensor readings
directly to the full n-dimensional state, trained on the snapshot columns.
Unlike gappy POD (``SPR.predict``, reference ``sparse_sensing.py:822-901``)
the reconstruction is not confined to the span of the r POD modes, so it can
recover nonlinear structure the linear basis truncates — at the price of
needing a training loop and giving no σ propagation.

TPU-native formulation: the whole training run is ONE jitted program — a
``lax.scan`` over full-batch Adam epochs (m ≈ 41 snapshots, so full batch is
the right batch), with the (hidden × n) output layer as an MXU matmul.  No
per-epoch host round-trips; the loss history comes back as one array.

Works with any placement family (``optimal_placement('qr'/'gem'/'dg'/
'vdg')``) and any C the SPR tier accepts (dense, scipy.sparse, BCOO).
Measurement convention matches the reference: y is (s, 3) = [value, σ,
feature-id] (σ is ignored here — a neural decoder has no closed-form error
propagation; use SPR for σ).
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..rom.rom import ROM, apply_sampling, scale_measurement_values


def _forward(params, y):
    """MLP forward: ReLU hidden layers, linear output.  y (..., s)."""
    *hidden, (W_out, b_out) = params
    h = y
    for W, b in hidden:
        h = jax.nn.relu(h @ W + b)
    return h @ W_out + b_out


@functools.partial(jax.jit, static_argnames=("sizes", "epochs"))
def _train(Y0t: jax.Array, X0t: jax.Array, sizes: tuple, epochs: int,
           lr: float, l2: float, key: jax.Array):
    """Full-batch Adam on MSE, one scan.  Y0t (m, s), X0t (m, n)."""
    import optax  # deferred: predict/serving/checkpoint-load never need it
    keys = jax.random.split(key, len(sizes) - 1)
    params = []
    for k, (fan_in, fan_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
        W = jax.random.normal(k, (fan_in, fan_out), X0t.dtype) \
            * jnp.sqrt(2.0 / fan_in)                      # He init
        params.append((W, jnp.zeros((fan_out,), X0t.dtype)))

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p):
        pred = _forward(p, Y0t)
        mse = jnp.mean((pred - X0t) ** 2)
        reg = sum(jnp.sum(W * W) for W, _ in p)
        return mse + l2 * reg

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None,
                                       length=epochs)
    return params, losses


class ShallowDecoder(ROM):
    """Shallow decoder network: sensors → full state.

    Same data model as :class:`ROM`/:class:`SPR` (feature-blocked X,
    reference ``sparse_sensing.py:50-81``); ``hidden`` are the widths of the
    ReLU layers between the s inputs and the n outputs (the paper's flame
    example uses two layers of ~40 units)."""

    def __init__(self, X, n_features, xyz, hidden: Sequence[int] = (40, 45)):
        super().__init__(X, n_features, xyz)
        self.hidden = tuple(int(h) for h in hidden)

    def fit(self, C, scale_type: str = "std", axis_cnt=1,
            epochs: int = 2000, lr: float = 1e-3, l2: float = 1e-6,
            seed: int = 0):
        """Train the decoder on the snapshot columns.

        C is the measurement operator from any ``optimal_placement`` family
        (dense / scipy.sparse / BCOO).  Training pairs are the SCALED sensor
        readings ``C @ X0`` → scaled snapshots ``X0`` (same statistics the
        gappy-POD path uses, so decoders and SPR share placement + scaling).
        """
        X0 = self.scale_data(scale_type, axis_cnt)        # (n, m)
        Y0 = apply_sampling(C, X0)                        # (s, m)
        self.C = C
        self._cnt_vector_cache = np.asarray(
            apply_sampling(C, self.X_cnt[:, 0]))
        sizes = (int(Y0.shape[0]),) + self.hidden + (int(X0.shape[0]),)
        params, losses = _train(Y0.T, X0.T, sizes, int(epochs),
                                float(lr), float(l2),
                                jax.random.PRNGKey(seed))
        self.params = params
        self.loss_history = losses
        return self

    def _scale_y(self, y):
        """Reference measurement-vector scaling (``sparse_sensing.py:553-
        584``), value column only — the SAME helper ``SPR.scale_vector``
        uses, so the gappy-POD and decoder families share one scaling.
        Host copies of the stats are cached like SPR's (each device
        readback is a full tunnel round-trip), and re-derived when a
        post-fit ``scale_data`` invalidated them."""
        cnt_vector = self._cnt_vector_cache
        if cnt_vector is None:          # post-fit scale_data() reset it
            cnt_vector = np.asarray(
                apply_sampling(self.C, self.X_cnt[:, 0]))
            self._cnt_vector_cache = cnt_vector
        scl_full = getattr(self, "_scl_vector_cache", None)
        if scl_full is None:
            scl_full = np.asarray(self.X_scl[:, 0])
            self._scl_vector_cache = scl_full
        vals, _ = scale_measurement_values(
            y, cnt_vector, scl_full, self.n_points)
        return vals

    def predict(self, y):
        """Reconstruct full fields from measurement vectors.

        y: (s, 3) = [value, σ, feature-id] or a list of them (σ ignored —
        documented above).  Returns the UNSCALED field(s), shape (n, n_vec)
        — unlike ``SPR.predict`` there are no POD coefficients to return.
        """
        if not hasattr(self, "params"):
            raise AttributeError("The function fit has to be called "
                                 "before calling predict.")
        if isinstance(y, (np.ndarray, jax.Array)):
            y = [y]
        s_sensors = int(self.params[0][0].shape[0])   # first layer W rows
        for yi in y:
            if yi.shape[1] != 3:
                raise ValueError("The y array has the wrong number of "
                                 "columns. y has to have dimensions (s,3).")
            if yi.shape[0] != s_sensors:
                # without this, a wrong-sized vector either crashes deep
                # in numpy or — worse — BROADCASTS (a single row against
                # the s sensor centers) into a plausible garbage field
                raise ValueError(
                    f"The number of rows of y ({yi.shape[0]}) does not "
                    f"match the number of trained sensors ({s_sensors}).")
        y0 = jnp.asarray(np.stack([self._scale_y(yi) for yi in y]))
        X0_pred = _forward(self.params, y0)               # (n_vec, n)
        # shared unscaling pass (same stats broadcast as ROM.reconstruct)
        return self.unscale_data(X0_pred.T)               # (n, n_vec)
