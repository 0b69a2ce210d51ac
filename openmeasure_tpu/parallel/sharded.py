"""Multi-device sharded pipelines.

The reference is single-process/CPU; its scaling axis is the state dimension
n (165k–1.7M rows).  The TPU-native equivalent (SURVEY §5): shard the tall
snapshot matrix row-wise (feature-block aligned) across a
``jax.sharding.Mesh``, and let XLA insert the collectives:

* the POD Gram ``X0ᵀX0`` becomes per-shard partial Grams + one ``psum`` of an
  (m, m) block over ICI — the only communication in the fit;
* the QRCP argmax reduces per-shard column norms, an argmax-allreduce;
* reconstruction is shard-local.

A second mesh axis ``mode`` parallelizes across POD modes — the r independent
single-task GPs train as a sharded vmap (the reference trains them serially,
``gpr.py:497-509``).

Layout note: X is kept as ``(n_features, n_points, m)`` blocks sharded on
``n_points`` so per-feature scaling reductions stay shard-local.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_state: int, n_mode: int = 1,
              devices=None) -> Mesh:
    """Create a 2-D (state × mode) device mesh."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_state * n_mode]).reshape(
        n_state, n_mode)
    return Mesh(devices, axis_names=("state", "mode"))


def shard_snapshots(X: jax.Array, n_features: int, mesh: Mesh) -> jax.Array:
    """Reshape X (n, m) to feature blocks (n_features, n_points, m) and shard
    the points axis over the 'state' mesh axis.  n_points must be divisible
    by the state-axis size (pad upstream if needed)."""
    n, m = X.shape
    n_points = n // n_features
    Xb = X.reshape(n_features, n_points, m)
    sharding = NamedSharding(mesh, P(None, "state", None))
    return jax.device_put(Xb, sharding)


@functools.partial(jax.jit, static_argnames=("scale_type", "axis_cnt"))
def _scale_blocks(Xb: jax.Array, scale_type: str = "std",
                  axis_cnt=1):
    """Per-feature-block scaling on the blocked layout — ALL 14 reference
    scale types (the same ``_block_scale_factor`` the eager API uses, vmapped
    over the feature axis).  Under a state-sharded layout the block
    reductions lower to shard-local partials plus (n_features,)-sized psums;
    ``median`` is the one type whose sort gathers the block (documented
    cost — the reference quantile has no distributed formulation)."""
    from ..core.scaling import _block_scale_factor
    if axis_cnt == 1:
        cnt = jnp.mean(Xb, axis=2, keepdims=True)         # row means
    elif axis_cnt is None:
        cnt = jnp.broadcast_to(jnp.mean(Xb, axis=(1, 2), keepdims=True),
                               Xb.shape[:2] + (1,))
    else:
        raise ValueError("axis_cnt must be 1 or None")
    scl = jax.vmap(lambda b: _block_scale_factor(b, scale_type))(Xb)
    scl = scl[:, None, None]                              # (n_features, 1, 1)
    X0 = (Xb - cnt) / scl
    return X0, cnt, scl


@functools.partial(jax.jit, static_argnames=("r", "scale_type"))
def sharded_spr_step(Xb_train: jax.Array, Xb_test: jax.Array, r: int,
                     scale_type: str = "std"):
    """Full SPR training step on the blocked, sharded layout.

    scale → Gram (psum over state shards) → eigh (replicated) → Ur
    (shard-local) → QRCP pivots (argmax-allreduce) → gappy solve →
    reconstruction NRMSE.  Everything under one jit; XLA partitions it from
    the input shardings.
    """
    with jax.default_matmul_precision("highest"):
        n_features, n_points, m = Xb_train.shape
        X0, cnt, scl = _scale_blocks(Xb_train, scale_type)
        Xf = X0.reshape(n_features * n_points, m)

        G = Xf.T @ Xf                       # psum over state shards
        evals, V = jnp.linalg.eigh(G)       # replicated (m, m)
        V = V[:, ::-1]
        B = Xf @ V                          # shard-local panel pass
        S = jnp.linalg.norm(B, axis=0)
        Ur = (B / jnp.maximum(S, 1e-30)[None, :])[:, :r]

        from ..linalg.qrcp import qrcp_pivots
        pivots = qrcp_pivots(Ur.T, r)       # argmax-allreduce per step

        Theta = Ur[pivots, :]
        cnt_f = cnt.reshape(n_features * n_points, 1)
        scl_f = jnp.broadcast_to(scl, cnt.shape).reshape(
            n_features * n_points, 1)
        Xt = Xb_test.reshape(n_features * n_points, -1)
        y0 = (Xt[pivots] - cnt_f[pivots, 0][:, None]) / \
            scl_f[pivots, 0][:, None]
        Ar = jnp.linalg.solve(Theta, y0).T
        X_rec = (Ur @ Ar.T) * scl_f + cnt_f
        err = X_rec - Xt
        nrmse = jnp.sqrt(jnp.mean(err * err)) / (jnp.max(Xt) - jnp.min(Xt))
        return nrmse, pivots


@functools.partial(jax.jit,
                   static_argnames=("r", "scale_type", "max_iter", "tol"))
def sharded_spr_cols_step(Xb_train: jax.Array, Xb_test: jax.Array, r: int,
                          lo_feat: jax.Array, hi_feat: jax.Array,
                          scale_type: str = "std", max_iter: int = 500,
                          tol: float = 1e-8):
    """SPR with CONSTRAINED (COLS) reconstruction, sharded end-to-end.

    Same fit/placement as :func:`sharded_spr_step`, but the gappy solve is
    the vmapped ADMM box-QP against physical per-feature limits: the
    (n, r) constraint matvecs ``Ur g`` / ``Urᵀ(z−w)`` are shard-local with
    an (r,)-sized psum each iteration — the identical program the eager
    ``SPR.predict(method='COLS')`` runs single-device.  The ±1000 limit
    clamp matches ``ROM.scale_limits`` (``sparse_sensing.py:201-204``).
    """
    from ..linalg import boxls as _boxls
    hp = jax.lax.Precision.HIGHEST
    n_features, n_points, m = Xb_train.shape
    X0, cnt, scl = _scale_blocks(Xb_train, scale_type)
    Xf = X0.reshape(n_features * n_points, m)

    G = jnp.matmul(Xf.T, Xf, precision=hp)
    evals, V = jnp.linalg.eigh(G)
    V = V[:, ::-1]
    B = jnp.matmul(Xf, V, precision=hp)
    S = jnp.linalg.norm(B, axis=0)
    Ur = (B / jnp.maximum(S, 1e-30)[None, :])[:, :r]

    from ..linalg.qrcp import qrcp_pivots
    pivots = qrcp_pivots(Ur.T, r)

    cnt_f = cnt.reshape(n_features * n_points, 1)
    scl_f = jnp.broadcast_to(scl, cnt.shape).reshape(n_features * n_points, 1)

    from ..core.scaling import scale_limits as _scale_limits
    lo, hi = _scale_limits(lo_feat, hi_feat, cnt_f, scl_f, n_features)

    Theta = Ur[pivots, :]
    Xt = Xb_test.reshape(n_features * n_points, -1)
    y0 = (Xt[pivots] - cnt_f[pivots, 0][:, None]) / scl_f[pivots, 0][:, None]
    AtA = jnp.matmul(Ur.T, Ur, precision=jax.lax.Precision.HIGHEST)

    def cols_one(y_i):
        g, _ = _boxls.box_constrained_lstsq(
            Theta, y_i, jnp.ones_like(y_i), Ur, lo, hi, AtA=AtA,
            max_iter=max_iter, tol=tol)
        return g
    Ar = jax.vmap(cols_one, in_axes=1)(y0)      # (m_test, r)

    X_rec = jnp.matmul(Ur, Ar.T, precision=hp) * scl_f + cnt_f
    err = X_rec - Xt
    nrmse = jnp.sqrt(jnp.mean(err * err)) / (jnp.max(Xt) - jnp.min(Xt))
    return nrmse, pivots, Ar, (Ur, lo, hi)


def sharded_gem_select(Ur: jax.Array, xyz_tiled: jax.Array, n_sensors: int,
                       d_min: float = 0.0):
    """GEM placement on a row-sharded basis: the same jitted fixed-shape
    program as the eager path (``sensing.gem._gem_select_jit``) — per-step
    conditional-variance scoring is shard-local, the argmax reduces across
    shards, and the selected-row gathers are XLA collectives."""
    from ..sensing.gem import _gem_select_jit
    mask = jnp.ones((Ur.shape[0],), dtype=bool)
    selected, _, _, _ = _gem_select_jit(
        Ur, xyz_tiled, mask, jnp.asarray(float(d_min), Ur.dtype), n_sensors)
    return selected


def sharded_dg_select(Ur: jax.Array, n_sensors: int):
    """Determinant-greedy placement on a row-sharded basis (same jitted
    program as ``sensing.dg.dg_select``; per-step argmax all-reduces)."""
    from ..sensing import dg as _dg
    return _dg.dg_select(Ur, n_sensors)


def sharded_vdg_select(Ur: jax.Array, n_features: int, n_sensors: int,
                       xyz=None, d_min: float = 0.0):
    """Vector-measurement greedy placement on a sharded basis (same jitted
    program as ``sensing.vector.vector_dg_select``): the per-step
    (n_points, p, p) block scores and Cholesky logdets are shard-local on
    the points axis; the argmax and the selected block's gather
    all-reduce.  Shard Ur so the points dimension of its feature-blocked
    reshape lands on the mesh's state axis."""
    from ..sensing.vector import vector_dg_select
    return vector_dg_select(Ur, n_features, n_sensors, xyz=xyz,
                            d_min=d_min)


def sharded_update_basis(U: jax.Array, S: jax.Array, Vt: jax.Array,
                         Xn: jax.Array, reorth: bool = True):
    """Incremental thin-SVD basis update on a row-sharded basis (same
    program as ``linalg.incremental.svd_append_columns_cholqr`` — CholQR
    keeps the residual orthogonalization SPMD-partitionable: shard-local
    panel passes plus (q, q)- and (r+q, r+q)-sized psums; a Householder QR
    here would all-gather the (n, q) residual to one device).  Shard ``U``
    and ``Xn`` row-wise on the mesh's state axis; small factors replicate."""
    from ..linalg.incremental import svd_append_columns_cholqr
    return svd_append_columns_cholqr(U, S, Vt, Xn, reorth=reorth)


def sharded_gpr_train(mesh: Mesh, P0: jax.Array, Vr: jax.Array,
                      max_iter: int = 1000, rel_error: float = 1e-5,
                      lr: float = 0.1):
    """Mode-parallel GPR hyperparameter training with the SAME semantics as
    the single-device trainer — it IS ``exact_gp.adam_early_stop`` (per-mode
    early stop + freeze, reference stopping rule ``gpr.py:230``) run on
    mode-sharded stacked parameters.  Each device steps its modes; the only
    collectives are the scalar-sized convergence reductions in the
    while_loop condition.  Returns the same TrainResult as ``GPR.train``'s
    engine."""
    from ..gp import kernels as K
    from ..gp import exact_gp as E
    r = Vr.shape[1]
    d = P0.shape[1]
    mean, kernel, lik = K.ConstantMean(), K.MaternKernel(2.5), \
        K.GaussianLikelihood()
    params0 = init_mode_stacked_params(r, d)

    def mode_shard(x):
        return jax.device_put(x, NamedSharding(
            mesh, P(*(("mode",) + (None,) * (x.ndim - 1)))))
    params0 = jax.tree_util.tree_map(mode_shard, params0)
    Y = jax.device_put(jnp.asarray(Vr).T, NamedSharding(mesh, P("mode",
                                                                None)))
    loss_fn = E.make_single_task_loss(mean, kernel, lik, jnp.asarray(P0), Y)
    vag = E.make_single_task_value_and_grad(mean, kernel, lik,
                                            jnp.asarray(P0), Y)
    return E.adam_early_stop(loss_fn, params0, lr=lr, max_iter=max_iter,
                             rel_error=rel_error, value_and_grad=vag)


def sharded_gp_train_step(mesh: Mesh, params, P0: jax.Array, Vr: jax.Array,
                          opt_state=None, lr: float = 0.1):
    """One Adam step of the vmapped multi-mode GP hyperparameter training
    with the mode axis sharded over the 'mode' mesh axis.

    The r per-mode exact GPs are independent (reference trains them serially,
    ``gpr.py:497-509``); their stacked parameter pytrees shard along the
    leading mode axis, each device computes the MLL gradient for its modes,
    and no collective is needed beyond the scalar loss psum.  Returns
    (params, opt_state, per-mode losses).
    """
    import optax
    from ..gp import kernels as K
    from ..gp import exact_gp as E

    mean, kernel, lik = K.ConstantMean(), K.MaternKernel(2.5), \
        K.GaussianLikelihood()
    opt = optax.adam(lr)

    mode_sharding = NamedSharding(mesh, P("mode"))
    params = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh, P(*(("mode",) + (None,) * (x.ndim - 1))))), params)
    if opt_state is None:
        opt_state = opt.init(params)

    loss_fn = E.make_single_task_loss(mean, kernel, lik, P0, Vr.T)

    @jax.jit
    def step(params, opt_state):
        def total(p):
            losses = loss_fn(p)
            return jnp.sum(losses), losses
        (_, losses), grads = jax.value_and_grad(total, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return step(params, opt_state)


def init_mode_stacked_params(r: int, d: int):
    """Initial stacked single-task GP params (leading axis = mode)."""
    from ..gp import kernels as K
    mean, kernel, lik = K.ConstantMean(), K.MaternKernel(2.5), \
        K.GaussianLikelihood()
    p = {"mean": mean.init_params(d), "kernel": kernel.init_params(d),
         "likelihood": lik.init_params()}
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (r,) + x.shape), p)


def sharded_mfk_end_to_end(mesh: Mesh, X_lf, Y_lf, X_hf, Y_hf, X_test):
    """Two-level recursive co-kriging for K outputs with the OUTPUT axis
    sharded over the 'mode' mesh axis — the third model family's multichip
    path (SURVEY §5).

    The reference fits its K latent models serially
    (``cokriging.py:113-119``); here they are one vmapped XLA program
    (:func:`openmeasure_tpu.pipelines.mfk_end_to_end`), so sharding the
    leading output axis of ``Y_lf``/``Y_hf`` makes GSPMD place each
    device's share of the θ-multistart optimizations and GLS fits locally
    — the per-level programs need NO cross-output communication (outputs
    are independent given the shared sites), so the only collectives are
    layout bookkeeping.  Returns the same :class:`MFKResult` (mean/mse
    gathered on the output axis)."""
    from ..pipelines import mfk_end_to_end
    out_shard = NamedSharding(mesh, P("mode", None))
    repl = NamedSharding(mesh, P(None, None))
    Y_lf = jax.device_put(jnp.asarray(Y_lf), out_shard)
    Y_hf = jax.device_put(jnp.asarray(Y_hf), out_shard)
    X_lf = jax.device_put(jnp.asarray(X_lf), repl)
    X_hf = jax.device_put(jnp.asarray(X_hf), repl)
    X_test = jax.device_put(jnp.asarray(X_test), repl)
    return mfk_end_to_end(X_lf, Y_lf, X_hf, Y_hf, X_test)


def sharded_mode_lstsq(mesh: Mesh, P0: jax.Array, Vr: jax.Array):
    """Mode-parallel batched solve: one ridge LS per POD mode, sharded over
    the 'mode' mesh axis — the communication-free pattern the GP training
    step uses (each mode's hyperparameter fit is independent)."""
    r = Vr.shape[1]
    Vr_sharded = jax.device_put(
        Vr.T, NamedSharding(mesh, P("mode", None)))  # (r, p)

    @jax.jit
    def step(P0, V):
        G = P0.T @ P0 + 1e-6 * jnp.eye(P0.shape[1], dtype=P0.dtype)
        def solve_one(v):
            return jnp.linalg.solve(G, P0.T @ v)
        return jax.vmap(solve_one)(V)   # (r, d), mode-sharded

    return step(P0, Vr_sharded)
