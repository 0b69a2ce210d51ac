"""openmeasure-tpu: TPU-native soft-sensing framework.

A ground-up JAX/XLA/Pallas re-design of the OpenMEASURE soft-sensing library
(POD/constrained-POD reduction, optimal sensor placement, gappy-POD
reconstruction, GP ROMs, multifidelity co-kriging, computed tomography of
chemiluminescence), built TPU-first: Gram-route SVD, on-device pivoted QR,
ADMM box-QP solvers, vmapped Cholesky GPs, and sharding-aware row-parallel
pipelines over `jax.sharding.Mesh`.

Top-level API mirrors the reference package layout:

    from openmeasure_tpu import ROM, SPR, GPR, PIGPR, CoKriging
    from openmeasure_tpu.ctc import camera, resample_to_grid
"""

import jax as _jax

# TPU matmuls default to bf16 operands, which alone caps reconstruction
# accuracy at ~1e-4 NRMSE (measured: the flagship pipeline's final
# ``Ur @ Ar.T`` at default precision).  This is a numerics library: full
# fp32 products are the correct default — but only when the user has not
# chosen their own: an explicit user setting (before import) is respected,
# and every precision-critical contraction in this package carries its own
# per-op ``precision=HIGHEST`` / ``default_matmul_precision`` scope, so
# library numerics do not depend on this ambient default.  Cost on the
# flagship bench: none measurable — every large matmul was already
# explicitly HIGHEST.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from .rom.rom import ROM
from .sensing.spr import SPR

__all__ = ["ROM", "SPR"]
__version__ = "0.1.0"

# GPR / PIGPR / CoKriging are imported lazily to keep base import light.
def __getattr__(name):
    if name in ("GPR", "PIGPR"):
        from .gp.gpr import GPR, PIGPR
        return {"GPR": GPR, "PIGPR": PIGPR}[name]
    if name == "CoKriging":
        from .multifi.cokriging import CoKriging
        return CoKriging
    if name == "MultiFiCoKriging":
        from .multifi.mfk import MultiFiCoKriging
        return MultiFiCoKriging
    if name == "SoftSensor":
        from .serving import SoftSensor
        return SoftSensor
    if name == "GPRSensor":
        from .serving import GPRSensor
        return GPRSensor
    if name == "CoKrigingSensor":
        from .serving import CoKrigingSensor
        return CoKrigingSensor
    if name in ("StreamingROM", "StreamingSPR", "StreamingGPR",
                "StreamingPIGPR", "StreamingDMD"):
        from . import streaming
        return getattr(streaming, name)
    if name == "ShallowDecoder":
        from .sensing.decoder import ShallowDecoder
        return ShallowDecoder
    if name == "DecoderSensor":
        from .serving import DecoderSensor
        return DecoderSensor
    if name == "DMD":
        from .dynamics.dmd import DMD
        return DMD
    if name == "DynamicSensor":
        from .serving import DynamicSensor
        return DynamicSensor
    raise AttributeError(f"module 'openmeasure_tpu' has no attribute {name!r}")
