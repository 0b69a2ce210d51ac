"""Greedy entropy maximization (GEM) sensor placement.

Re-implementation of ``SPR.gem`` (``sparse_sensing.py:586-698``) as ONE
jit-compiled fixed-shape program: the per-candidate Python loop
(``:670-678``) becomes a batched einsum over all surviving candidates, and
the sensor loop is a ``lax.fori_loop`` with padded (n_sensors-sized) buffers
— so the whole selection compiles once regardless of how many sensors are
requested (the growing-shape formulation recompiles per step, which is
prohibitive on remote TPU).

Covariance bookkeeping with fixed shapes: the selected-rows buffer ``Cs``
(n_sensors, r) is zero-padded; Σ_AA = Cs Csᵀ/(r−1) + I_pad, where I_pad puts
1 on not-yet-selected diagonal slots.  Since the corresponding rows/columns
are otherwise zero, the padded inverse is block-diagonal and the conditional
variance quadratic form is exact.

Determinism: the reference adds *random* 1e-5 Gaussian noise to Σ_AA before
inverting (``sparse_sensing.py:667``); we use a deterministic 1e-5 diagonal
jitter (SURVEY §4 flags the randomness as a quirk not to replicate).

Verbose-table deviation: the reference indexes the σ²_y column of its
entropy table with a *global* row index into the masked-local ``sigma_coef``
array (``sparse_sensing.py:652,694``) — wrong values (or an IndexError) for
masked / d_min runs.  The table printed here indexes ``sigma_coef`` with the
global ``selected`` indices into the full-length array, i.e. it fixes the
reference's global-vs-masked indexing bug.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_sensors",))
def _gem_select_jit(Ur, xyz, mask, d_min, n_sensors: int):
    n, r = Ur.shape
    dtype = Ur.dtype

    var_masked = jnp.var(jnp.where(mask[:, None], Ur, jnp.nan), ddof=1,
                         axis=1)
    coef = 2.0 / jnp.sqrt(jnp.nanmax(var_masked))
    Ur_scl = Ur * coef

    row_mean = jnp.mean(Ur_scl, axis=1, keepdims=True)
    Uc = Ur_scl - row_mean                     # row-centered (np.cov style)
    sigma2y_all = jnp.sum(Uc * Uc, axis=1) / (r - 1)
    sigma_coef = jnp.var(Ur_scl, ddof=1, axis=1)

    neg_inf = jnp.asarray(-jnp.inf, dtype)
    log2pi1 = 0.5 * (jnp.log(2 * jnp.pi) + 1.0)

    def body(s, carry):
        alive, Cs, selected, H_tot, step_scores, step_H = carry

        def first_step(_):
            return jnp.where(alive, sigma_coef, neg_inf), jnp.asarray(
                0.0, dtype)

        def later_step(_):
            # Placement fidelity needs full fp32 products regardless of the
            # ambient matmul-precision default (CLAUDE.md precision rule).
            hp = jax.lax.Precision.HIGHEST
            slot = jax.lax.broadcasted_iota(jnp.int32, (n_sensors,), 0)
            pad = (slot >= s).astype(dtype)
            Sigma_aa = jnp.matmul(Cs, Cs.T, precision=hp) / (r - 1) \
                + jnp.diag(pad) + 1e-5 * jnp.eye(n_sensors, dtype=dtype)
            Sigma_aa_inv = jnp.linalg.inv(Sigma_aa)
            Sigma_ya = jnp.matmul(Uc, Cs.T, precision=hp) / (r - 1)
            cond_var = sigma2y_all - jnp.einsum(
                "ns,st,nt->n", Sigma_ya, Sigma_aa_inv, Sigma_ya,
                precision=hp)
            return jnp.where(alive, cond_var, neg_inf), jnp.asarray(
                1.0, dtype)

        scores, is_later = jax.lax.cond(s == 0, first_step, later_step, None)
        i_sensor = jnp.argmax(scores)
        H_tot = H_tot + is_later * (0.5 * jnp.log(scores[i_sensor])
                                    + log2pi1)
        Cs = Cs.at[s].set(Uc[i_sensor])
        selected = selected.at[s].set(i_sensor.astype(jnp.int32))
        step_scores = step_scores.at[s].set(scores[i_sensor])
        step_H = step_H.at[s].set(H_tot)
        d = jnp.linalg.norm(xyz - xyz[i_sensor][None, :], axis=1)
        alive = alive & (d >= d_min)
        return alive, Cs, selected, H_tot, step_scores, step_H

    carry0 = (mask,
              jnp.zeros((n_sensors, r), dtype),
              jnp.zeros((n_sensors,), jnp.int32),
              jnp.asarray(0.0, dtype),
              jnp.zeros((n_sensors,), dtype),
              jnp.zeros((n_sensors,), dtype))
    _, _, selected, H_tot, step_scores, step_H = jax.lax.fori_loop(
        0, n_sensors, body, carry0)
    return selected, step_scores, step_H, sigma_coef


def gem_select(
    Ur,
    xyz_tiled,
    n_sensors: int,
    mask=None,
    d_min: float = 0.0,
    verbose: bool = False,
) -> np.ndarray:
    """Select sensor rows of Ur by greedy conditional-entropy maximization.

    Parameters
    ----------
    Ur : (n, r) truncated basis.
    xyz_tiled : (n, 3) positions, feature-tiled to match Ur rows.
    mask : optional (n,) bool — restrict the search region.
    d_min : minimum inter-sensor distance.

    Returns global row indices, shape (n_sensors,).
    """
    Ur = jnp.asarray(Ur)
    n = Ur.shape[0]
    if mask is None:
        mask_np = np.ones((n,), dtype=bool)
    else:
        mask_np = np.asarray(mask, dtype=bool)

    out = _gem_select_jit(
        Ur, jnp.asarray(xyz_tiled), jnp.asarray(mask_np),
        jnp.asarray(float(d_min), Ur.dtype), n_sensors)
    # one fused host readback: separate np.asarray calls cost one tunnel
    # round-trip each (~27-55 ms on this device) — same fix as
    # ctc/grid.py trace_batch; measured 72 -> ~41 ms GEM wall at 20k rows
    selected, step_scores, step_H, sigma_coef = jax.device_get(out)
    selected = selected.astype(np.int64)
    scores_np = step_scores
    if not np.all(np.isfinite(scores_np)):
        bad = int(np.argmax(~np.isfinite(scores_np)))
        raise ValueError(
            f"GEM ran out of candidates at sensor {bad + 1}/{n_sensors}: "
            f"the d_min={float(d_min)} exclusion (and/or the region mask) "
            "eliminated every remaining location. Reduce d_min, enlarge the "
            "mask, or request fewer sensors.")
    if verbose:
        # Host-side entropy table (the reference prints it inline,
        # sparse_sensing.py:633-694; device callbacks are unavailable on
        # some TPU runtimes so the per-step stats return from the jit).
        scores = np.asarray(step_scores)
        Hs = np.asarray(step_H)
        sc = np.asarray(sigma_coef)
        header = ["# sensors", "sigma^2 y", "sigma^2 y|a", "Htot"]
        print(f"{'-'*70} \n {header[0]:^10} {header[1]:^10} "
              f"{header[2]:^10} {header[3]:^10} \n ")
        for s_i in range(n_sensors):
            if s_i == 0:
                print(f"{s_i+1:^10} {sc[selected[s_i]]:^10.2e} "
                      f"{'  -':^10} {'  -':^10}")
            else:
                print(f"{s_i+1:^10} {sc[selected[s_i]]:^10.2e} "
                      f"{scores[s_i]:^10.2e} {Hs[s_i]:^10.2e}")
    return selected
