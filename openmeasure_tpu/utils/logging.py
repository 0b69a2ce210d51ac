"""Structured logging and profiling hooks.

The reference's only observability is ``print(..., end='\\r')`` progress
lines and GP-loss prints (SURVEY §5).  Here: a stdlib-logging based logger
(respecting each class's ``verbose=`` kwarg for parity) plus a context
manager around ``jax.profiler`` for capturing device traces of the hot
pipelines.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

logger = logging.getLogger("openmeasure_tpu")
if not logger.handlers:  # don't double-configure under pytest reimports
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.WARNING)


def set_verbosity(level: int) -> None:
    """level: logging.DEBUG/INFO/WARNING/..."""
    logger.setLevel(level)


@contextlib.contextmanager
def timed(label: str, verbose: bool = True) -> Iterator[None]:
    """Wall-clock a block; logs at INFO."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if verbose:
        logger.info("%s: %.4f s", label, dt)


@contextlib.contextmanager
def device_trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler device trace (view with TensorBoard or
    Perfetto).  No-op if logdir is None."""
    if logdir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
