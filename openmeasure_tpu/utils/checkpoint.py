"""Checkpoint / resume for fitted models.

The reference has no persistence — trained state lives in object attributes
and the only resume affordance is ``fit(basis=(Ur, Ar))`` (SURVEY §5).  Here
every fitted model (ROM / SPR / GPR / PIGPR / ShallowDecoder / CoKriging) serializes to a single ``.npz``
archive: array attributes flattened under path-like keys, scalars/specs in an
embedded JSON header.  ``load_model`` reconstructs a ready-to-predict object
without re-running the SVD or GP training.

GP mean/kernel/likelihood specs are frozen dataclasses; they round-trip by
class name + field dict (nested specs like ScaleKernel recurse).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional

import numpy as np

from ..rom.rom import ROM
from ..sensing.spr import SPR
from ..gp import kernels as K

_SPEC_CLASSES = {
    cls.__name__: cls for cls in (
        K.ZeroMean, K.ConstantMean, K.LinearMean,
        K.RBFKernel, K.MaternKernel, K.ScaleKernel, K.LinearKernel,
        K.GaussianLikelihood, K.FixedNoiseGaussianLikelihood,
        K.MultitaskGaussianLikelihood,
    )
}


def _spec_to_json(spec) -> Optional[Dict]:
    if spec is None:
        return None
    fields = {}
    name = type(spec).__name__
    if name not in _SPEC_CLASSES:
        raise ValueError(
            f"cannot checkpoint unregistered spec class {name!r} — "
            "register it in openmeasure_tpu.utils.checkpoint._SPEC_CLASSES "
            "so load_model can rebuild it (failing at save beats a "
            "KeyError after the training investment).")
    for f in dataclasses.fields(spec):
        v = getattr(spec, f.name)
        if dataclasses.is_dataclass(v):
            v = _spec_to_json(v)
            fields[f.name] = {"__spec__": v}
        else:
            fields[f.name] = v
    return {"cls": type(spec).__name__, "fields": fields}


def _spec_from_json(d: Optional[Dict]):
    if d is None:
        return None
    cls = _SPEC_CLASSES[d["cls"]]
    kw = {}
    for k, v in d["fields"].items():
        if isinstance(v, dict) and "__spec__" in v:
            v = _spec_from_json(v["__spec__"])
        kw[k] = v
    return cls(**kw)


def _flatten_tree(tree, prefix, out):
    if isinstance(tree, dict):
        if not tree:
            # an EMPTY params subtree (e.g. ZeroMean.init_params() == {})
            # must survive the round trip — dropping it loses the 'mean'
            # key and predict crashes after reload
            out[f"{prefix}/__empty__"] = np.zeros(0, dtype=np.uint8)
            return
        for k, v in tree.items():
            _flatten_tree(v, f"{prefix}/{k}", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten_tree(arrays: Dict[str, np.ndarray], prefix: str):
    tree: Dict[str, Any] = {}
    plen = len(prefix) + 1
    for key, v in arrays.items():
        if not key.startswith(prefix + "/"):
            continue
        parts = key[plen:].split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        if parts[-1] == "__empty__":
            continue                     # marker: the walk above already
                                         # materialized the empty dict
        d[parts[-1]] = v
    return tree


_ARRAY_ATTRS = [
    "X_cnt", "X_scl", "Ur", "Ar", "Vr", "Sigma_r", "xyz", "Theta",
    "P", "P_cnt", "P_scl", "P0", "Vr_sigma", "_train_X", "_train_Y",
]
_META_ATTRS = ["r", "n_features", "n_points", "scale_type", "method",
               "solver", "gpr_type", "d", "max_iter", "rel_error", "lr",
               "scaleX_type", "scaleP_type", "admm_max_iter", "admm_tol",
               "admm_over_relax", "verbose", "engine"]


def save_model(obj, path: str, include_data: bool = False,
               backend: str = "npz") -> None:
    """Serialize a fitted ROM/SPR/GPR/PIGPR/CoKriging/ShallowDecoder/DMD.

    backend='npz' (default): single compressed archive at ``path``.
    backend='orbax': an orbax-checkpoint directory at ``path`` — atomic
    writes and async-friendly for production serving fleets (SURVEY §5's
    suggested persistence layer); same payload, restored identically by
    :func:`load_model`.
    """
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {"class": type(obj).__name__}

    if type(obj).__name__ == "CoKriging":
        _save_cokriging(obj, arrays, meta)
        _write_arrays(arrays, meta, path, backend)
        return

    for a in _ARRAY_ATTRS:
        if hasattr(obj, a) and getattr(obj, a) is not None:
            arrays[f"attr/{a}"] = np.asarray(getattr(obj, a))
    if "attr/X_cnt" not in arrays:
        raise ValueError(
            f"{type(obj).__name__} must be fit() before saving "
            "(no fitted state to serialize).")
    for a in _META_ATTRS:
        if hasattr(obj, a):
            meta[a] = getattr(obj, a)
    if include_data and hasattr(obj, "X"):
        if not isinstance(obj.X, (np.ndarray,)) and not hasattr(obj.X,
                                                                "__array__"):
            raise ValueError(
                "include_data=True needs an in-core X; streaming models "
                "keep snapshots on disk — save with include_data=False.")
        arrays["attr/X"] = np.asarray(obj.X)

    if hasattr(obj, "limits") and getattr(obj, "limits") is not None:
        arrays["limits/lo"] = np.asarray(obj.limits[0])
        arrays["limits/hi"] = np.asarray(obj.limits[1])
    if getattr(obj, "constraints", None) is not None:
        arrays["constraints/A"] = np.asarray(obj.constraints.A)
        arrays["constraints/lo"] = np.asarray(obj.constraints.lo)
        arrays["constraints/hi"] = np.asarray(obj.constraints.hi)

    if hasattr(obj, "C"):
        C = obj.C
        try:
            import scipy.sparse as sp
            if sp.issparse(C):
                Cc = C.tocsr()
                arrays["C_sparse/data"] = Cc.data
                arrays["C_sparse/indices"] = Cc.indices
                arrays["C_sparse/indptr"] = Cc.indptr
                meta["C_sparse_shape"] = list(Cc.shape)
                C = None
        except ImportError:  # pragma: no cover
            pass
        try:
            from jax.experimental import sparse as jsparse
            if isinstance(C, jsparse.BCOO):
                # np.asarray(BCOO) yields a pickled OBJECT array that
                # np.load(allow_pickle=False) can never restore — store the
                # COO triplets like the CSR branch instead
                arrays["C_bcoo/data"] = np.asarray(C.data)
                arrays["C_bcoo/indices"] = np.asarray(C.indices)
                meta["C_bcoo_shape"] = list(C.shape)
                C = None
        except ImportError:  # pragma: no cover
            pass
        if C is not None:
            arrays["attr/C"] = np.asarray(C)

    if type(obj).__name__ in ("DMD", "StreamingDMD"):
        # complex spectral state (npz stores complex128 natively); the
        # streaming fit restores as the in-core DMD like the other
        # streaming families
        for a in ("eigs", "W", "amplitudes", "_b_exact"):
            arrays[f"dmd/{a}"] = np.asarray(getattr(obj, a))
        arrays["dmd/A_tilde"] = np.asarray(obj.A_tilde, dtype=np.float64)
        arrays["dmd/B"] = np.asarray(obj._B)
        meta["dt"] = float(obj.dt)
        meta["m"] = int(obj._m)

    if type(obj).__name__ == "ShallowDecoder":
        # MLP layers are a LIST of (W, b) tuples, not the GP dict pytree
        if not hasattr(obj, "params"):
            raise ValueError("ShallowDecoder must be fit() before saving")
        for i, (W, b) in enumerate(obj.params):
            arrays[f"decoder/layer{i}/W"] = np.asarray(W)
            arrays[f"decoder/layer{i}/b"] = np.asarray(b)
        meta["hidden"] = [int(h) for h in obj.hidden]
    elif hasattr(obj, "params"):
        _flatten_tree(obj.params, "params", arrays)
        meta["mean_spec"] = _spec_to_json(getattr(obj, "mean", None))
        meta["kernel_spec"] = _spec_to_json(getattr(obj, "kernel", None))
        meta["likelihood_spec"] = _spec_to_json(
            getattr(obj, "likelihood", None))

    _write_arrays(arrays, meta, path, backend)


def _write_arrays(arrays: Dict[str, np.ndarray], meta: Dict[str, Any],
                  path: str, backend: str) -> None:
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    if backend == "npz":
        # through a file OBJECT so numpy does not append '.npz' to
        # suffixless paths (save/load with the same string must work)
        with open(path, "wb") as f:
            np.savez_compressed(f, **arrays)
    elif backend == "orbax":
        import os
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), dict(arrays),
                   force=True)  # overwrite like the npz backend
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")


_COK_BATCH_SCALARS = ["_X_mean", "_X_std", "_y_mean", "_y_std"]
_COK_LEVEL_KEYS = ["X", "Y", "F", "theta", "beta", "gamma", "sigma2",
                   "L", "G"]


def _save_cokriging(obj, arrays: Dict[str, np.ndarray],
                    meta: Dict[str, Any]) -> None:
    """Fitted-state persistence for CoKriging: HF scaling stats + aligned
    basis + every level of the batched kriging model — enough to predict
    without the training snapshot sets."""
    if not hasattr(obj, "_batch"):
        raise ValueError("CoKriging must be fit() before saving")
    arrays["attr/Ur_hf"] = np.asarray(obj.Ur_hf)
    arrays["attr/Zr_hf"] = np.asarray(obj.Zr_hf)
    arrays["attr/Zr_aligned"] = np.asarray(obj.Zr_aligned)
    arrays["romhf/X_cnt"] = np.asarray(obj.rom_hf.X_cnt)
    arrays["romhf/X_scl"] = np.asarray(obj.rom_hf.X_scl)
    arrays["romhf/xyz"] = np.asarray(obj.xyz_hf)
    meta["n_features"] = obj.n_features
    meta["n_latent"] = obj.n_latent
    meta["regr_type"] = obj.regr_type
    meta["rho_regr"] = obj.rho_regr
    meta["normalize"] = obj.normalize
    meta["engine"] = getattr(obj, "engine", "device")

    b = obj._batch
    meta["batch"] = {"n_levels": b.n_levels, "K": b.K,
                     "rho_cols": [lev["rho_cols"] for lev in b.levels]}
    for name in _COK_BATCH_SCALARS:
        arrays[f"batch/{name}"] = np.asarray(getattr(b, name))
    for l, lev in enumerate(b.levels):
        for key in _COK_LEVEL_KEYS:
            arrays[f"batch/level{l}/{key}"] = np.asarray(lev[key])


def _load_cokriging(arrays: Dict[str, np.ndarray], meta: Dict[str, Any]):
    import jax.numpy as jnp
    from ..multifi.cokriging import CoKriging
    from ..multifi.mfk import BatchedMFK, MultiFiCoKriging, _BatchedMFKView

    obj = object.__new__(CoKriging)
    obj.n_features = int(meta["n_features"])
    obj.n_latent = int(meta["n_latent"])
    obj.regr_type = meta["regr_type"]
    obj.rho_regr = meta["rho_regr"]
    obj.normalize = meta["normalize"]
    obj.engine = meta.get("engine", "device")
    obj.Ur_hf = jnp.asarray(arrays["attr/Ur_hf"])
    obj.Zr_hf = jnp.asarray(arrays["attr/Zr_hf"])
    obj.Zr_aligned = jnp.asarray(arrays["attr/Zr_aligned"])
    obj.xyz_hf = arrays["romhf/xyz"]

    # prediction-time rom_hf only needs the scaling stats
    n = arrays["romhf/X_cnt"].shape[0]
    rom = ROM(np.zeros((n, 1)), obj.n_features, obj.xyz_hf)
    rom.X_cnt = jnp.asarray(arrays["romhf/X_cnt"])
    rom.X_scl = jnp.asarray(arrays["romhf/X_scl"])
    obj.rom_hf = rom

    bm = meta["batch"]
    batch = object.__new__(BatchedMFK)
    batch._proto = MultiFiCoKriging(obj.regr_type, obj.rho_regr,
                                    normalize=obj.normalize,
                                    engine=obj.engine)
    # the level state below is (re)built on this engine's backend —
    # predict must re-enter the same context (mfk._engine_ctx)
    batch._proto._fit_engine = obj.engine
    batch.regr = obj.regr_type
    batch.rho_regr = obj.rho_regr
    batch.normalize = obj.normalize
    batch.n_levels = int(bm["n_levels"])
    batch.K = int(bm["K"])
    for name in _COK_BATCH_SCALARS:
        setattr(batch, name, np.asarray(arrays[f"batch/{name}"]))
    batch.levels = []
    host = obj.engine == "host"
    for l in range(batch.n_levels):
        # host engine: keep the f64 level arrays as device-neutral numpy
        # (an ambient jnp conversion would round them to fp32 AND commit
        # them to the accelerator — predict's host-f64 context would then
        # mix backends); the prediction ops convert them inside the
        # context on first use
        lev = {key: (np.asarray(arrays[f"batch/level{l}/{key}"]) if host
                     else jnp.asarray(arrays[f"batch/level{l}/{key}"]))
               for key in _COK_LEVEL_KEYS}
        lev["rho_cols"] = int(bm["rho_cols"][l])
        batch.levels.append(lev)
    obj._batch = batch
    obj.model_list = [_BatchedMFKView(batch, k) for k in range(obj.n_latent)]
    return obj


def load_model(path: str):
    """Reconstruct a fitted model saved by :func:`save_model`.  The returned
    object supports predict/reconstruct without retraining."""
    import os
    if os.path.isdir(path):  # orbax checkpoint directory
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        arrays = {k: np.asarray(v) for k, v in restored.items()}
    else:
        with np.load(path, allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays.pop("__meta__")).decode())

    cls_name = meta["class"]
    if cls_name == "CoKriging":
        return _load_cokriging(arrays, meta)
    n_features = int(meta["n_features"])
    xyz = arrays.get("attr/xyz")
    X = arrays.get("attr/X")
    if X is None:
        # placeholder with correct row count so __init__ validation passes
        n = int(arrays["attr/X_cnt"].shape[0])
        m = int(arrays["attr/Ar"].shape[0]) if "attr/Ar" in arrays else 1
        X = np.zeros((n, m))

    # streaming classes hold no in-core X; after fit they ARE their in-core
    # equivalents (all reduced state memory-resident), so they restore as
    # the in-core class — loading never needs the original snapshot store
    if cls_name in ("ROM", "StreamingROM"):
        obj = ROM(X, n_features, xyz)
    elif cls_name in ("SPR", "StreamingSPR"):
        obj = SPR(X, n_features, xyz)
    elif cls_name in ("GPR", "PIGPR", "StreamingGPR", "StreamingPIGPR"):
        from ..gp.gpr import GPR
        P = arrays.get("attr/P")
        obj = GPR(X, n_features, xyz,
                  P if P is not None else np.zeros((X.shape[1], 1)),
                  gpr_type=meta.get("gpr_type", "SingleTask"))
    elif cls_name in ("DMD", "StreamingDMD"):
        from ..dynamics.dmd import DMD
        obj = object.__new__(DMD)
        ROM.__init__(obj, X, n_features, xyz)
    elif cls_name == "ShallowDecoder":
        from ..sensing.decoder import ShallowDecoder
        obj = ShallowDecoder(X, n_features, xyz,
                             hidden=tuple(meta["hidden"]))
    else:
        raise ValueError(f"unknown checkpointed class {cls_name!r}")

    import jax.numpy as jnp
    for a in _ARRAY_ATTRS:
        key = f"attr/{a}"
        if key in arrays:
            setattr(obj, a, jnp.asarray(arrays[key]))
    for a in _META_ATTRS:
        if a in meta:
            setattr(obj, a, meta[a])
    if meta.get("engine") == "host" and "attr/Vr_sigma" in arrays:
        # Vr_sigma belongs to the host-f64 GP state (prior stddevs at the
        # f64-trained hyperparameters) — same keep-as-numpy rationale as
        # the params below: the jnp conversion above rounds it to fp32 in
        # a no-x64 session, and a later fixed-noise retrain would build
        # its likelihood from the rounded values
        obj.Vr_sigma = arrays["attr/Vr_sigma"]

    spr_like = cls_name in ("SPR", "StreamingSPR")
    if "limits/lo" in arrays:
        obj.limits = [arrays["limits/lo"], arrays["limits/hi"]]
    elif spr_like:
        obj.limits = None
    if "constraints/A" in arrays:
        from ..linalg.boxls import LinearConstraints
        obj.constraints = LinearConstraints(
            jnp.asarray(arrays["constraints/A"]),
            jnp.asarray(arrays["constraints/lo"]),
            jnp.asarray(arrays["constraints/hi"]))
    elif spr_like:
        obj.constraints = None
    # per-attribute back-compat defaults: the old all-or-nothing guard
    # keyed on hasattr(verbose) clobbered restored admm knobs (verbose
    # was never serialized) and skipped StreamingSPR checkpoints entirely
    if spr_like:
        for attr, default in (("verbose", False), ("admm_max_iter", 4000),
                              ("admm_tol", 1e-9),
                              ("admm_over_relax", 1.6)):
            if not hasattr(obj, attr):
                setattr(obj, attr, default)

    if "C_sparse_shape" in meta:
        import scipy.sparse as sp
        obj.C = sp.csr_matrix(
            (arrays["C_sparse/data"], arrays["C_sparse/indices"],
             arrays["C_sparse/indptr"]),
            shape=tuple(meta["C_sparse_shape"]))
    elif "C_bcoo_shape" in meta:
        from jax.experimental import sparse as jsparse
        obj.C = jsparse.BCOO(
            (jnp.asarray(arrays["C_bcoo/data"]),
             jnp.asarray(arrays["C_bcoo/indices"])),
            shape=tuple(meta["C_bcoo_shape"]))
    elif "attr/C" in arrays:
        obj.C = jnp.asarray(arrays["attr/C"])
    if spr_like and getattr(obj, "C", None) is not None and \
            getattr(obj, "Theta", None) is not None:
        # rebuild the train-time measurement-center cache (spr.py trains
        # it; a reloaded CTC-scale sparse C would otherwise pay one full
        # SpMV per predict forever)
        from ..rom.rom import apply_sampling
        obj._cnt_vector_cache = np.asarray(
            apply_sampling(obj.C, np.asarray(obj.X_cnt)[:, 0]))

    if cls_name in ("DMD", "StreamingDMD"):
        for a in ("eigs", "W", "amplitudes", "_b_exact"):
            setattr(obj, a, arrays[f"dmd/{a}"])
        obj.A_tilde = arrays["dmd/A_tilde"]
        obj._B = jnp.asarray(arrays["dmd/B"])
        obj.dt = float(meta["dt"])
        obj._m = int(meta["m"])
        with np.errstate(divide="ignore", invalid="ignore"):
            obj.omega = np.log(obj.eigs.astype(np.complex128)) / obj.dt
        return obj

    if cls_name == "ShallowDecoder":
        import jax.numpy as jnp
        from ..rom.rom import apply_sampling
        layers = []
        i = 0
        while f"decoder/layer{i}/W" in arrays:
            layers.append((jnp.asarray(arrays[f"decoder/layer{i}/W"]),
                           jnp.asarray(arrays[f"decoder/layer{i}/b"])))
            i += 1
        obj.params = layers
        obj._cnt_vector_cache = np.asarray(
            apply_sampling(obj.C, np.asarray(obj.X_cnt)[:, 0]))
        return obj

    if any(k.startswith("params/") for k in arrays):
        import jax
        params = _unflatten_tree(arrays, "params")
        if meta.get("engine") == "host":
            # host-f64 engine: keep the trained hyperparameters as host
            # numpy float64 (a jnp conversion under an x64-disabled
            # session would silently round them to fp32, degrading every
            # posterior of the reloaded model)
            obj.params = params
        else:
            obj.params = _tree_to_jnp(params)
        obj.mean = _spec_from_json(meta.get("mean_spec"))
        obj.kernel = _spec_from_json(meta.get("kernel_spec"))
        obj.likelihood = _spec_from_json(meta.get("likelihood_spec"))
        if obj.gpr_type == "MultiTask":
            obj.models = [obj.params]
            obj.likelihoods = [obj.likelihood]
        else:
            obj.models = [
                jax.tree_util.tree_map(lambda x: x[i], obj.params)
                for i in range(obj.r)]
            obj.likelihoods = [obj.likelihood] * obj.r
    return obj


def _tree_to_jnp(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: _tree_to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)
