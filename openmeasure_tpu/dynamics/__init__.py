"""Reduced-coefficient dynamics: DMD analysis and Kalman measurement fusion.

Capability beyond the reference (it has no temporal model at all — every
``SPR.predict`` is memoryless, ``sparse_sensing.py:806-895``): this package
identifies linear dynamics on the POD coefficients and uses them to analyse
(:class:`DMD`) and to filter time series of noisy sparse measurements
(:func:`kalman_filter`, served by
:class:`openmeasure_tpu.serving.DynamicSensor`).
"""

from .dmd import DMD
from .kalman import (fit_reduced_operator, estimate_process_noise,
                     stationary_covariance, kalman_filter, kalman_smoother)

__all__ = ["DMD", "fit_reduced_operator", "estimate_process_noise",
           "stationary_covariance", "kalman_filter", "kalman_smoother"]
