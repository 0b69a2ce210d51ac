"""Dataclass configs.

The reference has no config system — plain keyword arguments with defaults
scattered per method (SURVEY §5).  These dataclasses collect those defaults
1:1 and thread through the eager API: ``ROM.fit(config=FitConfig(...))``,
``GPR.fit(config=...)``, ``GPR.train(config=GPTrainConfig(...))``,
``SPR.optimal_placement(config=PlacementConfig(...))``,
``SPR.train(solver_config=SolverConfig(...))``,
``ROM.CPOD(solver_config=...)``, and
``CoKriging(..., config=CoKrigingConfig(...))``.  A config object overrides
the individual kwargs of the call it is passed to.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union


@dataclasses.dataclass
class FitConfig:
    """ROM/SPR/GPR fit knobs (reference sparse_sensing.py:463, gpr.py:337)."""
    scale_type: str = "std"
    axis_cnt: Optional[int] = 1
    select_modes: str = "variance"   # 'variance' | 'number'
    n_modes: Union[int, float] = 99


@dataclasses.dataclass
class PlacementConfig:
    """Sensor placement knobs (reference sparse_sensing.py:700)."""
    calc_type: str = "qr"            # 'qr' | 'gem'
    n_sensors: int = 10
    d_min: float = 0.0
    verbose: bool = False


@dataclasses.dataclass
class SolverConfig:
    """ADMM box-QP solver knobs (replaces the CVXPY solver choice)."""
    max_iter: int = 4000
    tol: float = 1e-9
    over_relax: float = 1.6


@dataclasses.dataclass
class GPTrainConfig:
    """GP hyperparameter training knobs (reference gpr.py:404-453).

    ``engine``: 'device' (ambient fp32 path) or 'host' (host-CPU f64 GP
    stage — the reference's gpytorch-double numerics; core.host64)."""
    max_iter: int = 1000
    rel_error: float = 1e-5
    lr: float = 0.1
    verbose: bool = False
    engine: str = "device"


@dataclasses.dataclass
class CoKrigingConfig:
    """Multifidelity knobs (reference cokriging.py:33-42)."""
    scale_type: str = "std"
    regr_type: str = "linear"
    rho_regr: str = "constant"
    normalize: bool = True
    theta: Optional[Sequence[float]] = None
    theta0: Optional[Sequence[float]] = None
    thetaL: Optional[Sequence[float]] = None
    thetaU: Optional[Sequence[float]] = None
    initial_range: float = 0.3
    tol: float = 1e-6
    # 'host': f64 latent kriging fits on the host CPU (OpenMDAO's own
    # numerics; core.host64) — maps onto CoKriging.engine
    engine: str = "device"
