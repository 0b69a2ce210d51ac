"""Opt-in host-f64 compute stage (the ``engine='host'`` knob).

The TPU-native performance path runs fp32 (the MXU dtype); the reference
runs its GP hyperparameter training in DOUBLE (``gpr.py:480-481,503-504``
— gpytorch ``.double()``) and its co-kriging latent fits in f64 scipy
(OpenMDAO ``MultiFiCoKriging``).  Those stages operate on tiny
(p, p) ≈ (41, 41) matrices, so an f64 pass is nearly free while removing
the fp32 round-off that dominates the remaining accuracy gap vs the
reference (BASELINE.md round-4 decomposition: the fp32 GP stage accounts
for 0.014428 → 0.014808 of the flagship ``gpr_nrmse``; the x64
conformance probes pin f64 agreement with the reference op sets at
2.4e-12 NRMSE for GPR and 8.8e-8 for co-kriging).

Design: :func:`host_f64` runs the SAME JAX programs on the host CPU
backend under x64 semantics — there is no second f64 implementation to
drift from the device path.  Inside the context, jitted functions trace
with float64 inputs and compile for CPU; the Pallas TPU kernel gates
(``chol_pallas.kernel_path_wanted``) see float64 and fall back to the
portable cho_solve branches.  TPU f64 itself is emulated and slow, which
is why the f64 stage is HOST-side (SURVEY §7 "hard parts" #3:
conformance f64 vs performance fp32 must both exist).
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def host_f64():
    """Context: CPU backend + x64 semantics for a host-f64 compute stage.

    Composable with an ambient TPU session (``jax.default_device`` only
    redirects placements made inside the context) and idempotent under
    the CPU x64 conformance suite (x64 already on, device already CPU).
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), jax.enable_x64(True):
        yield


def tree_f64(tree):
    """Cast every floating leaf of a pytree to float64.

    Call INSIDE :func:`host_f64` so the casts land on the host CPU
    backend (outside it, x64-disabled ``jnp.asarray`` would silently
    round back to float32).  Integer/bool leaves pass through unchanged.
    """
    def cast(x):
        a = np.asarray(x)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, jnp.float64)
        return x
    return jax.tree_util.tree_map(cast, tree)


def tree_host(tree):
    """Materialize a result pytree as host numpy arrays (f64-preserving,
    device-neutral — safe to store on model objects that later feed both
    host and device consumers)."""
    return jax.tree_util.tree_map(np.asarray, tree)
