"""Test configuration.

Conformance tests run on CPU with float64 enabled (TPU fp64 is emulated and
slow; the reference numerics are LAPACK float64).  A virtual 8-device CPU
mesh validates the multi-chip sharding paths without TPU hardware.

Setting ``OMTPU_TEST_PLATFORM=tpu`` leaves the backend selection alone so the
TPU-only kernel tests can actually run on a TPU host::

    OMTPU_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_kernels.py -q

(without it, ``test_tpu_kernels.py``'s "self-skips on CPU" gating would be
dead code — the unconditional CPU pin here would force the skip everywhere).

These environment variables must be set before jax initializes its backends,
hence the module-level placement.
"""

import os

_platform = os.environ.get("OMTPU_TEST_PLATFORM", "cpu")

if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's TPU platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if _platform == "cpu":
    # jaxtyping's pytest plugin imports jax before this conftest runs, so the
    # env var alone can be read too late — set the config directly as well
    # (backends are not initialized until first use, so this still takes
    # effect).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# On OMTPU_TEST_PLATFORM=tpu, x64 stays off: the Pallas/Mosaic kernels are
# float32/int32 programs and TPU f64 is emulated — the kernel-parity tests
# pin their dtypes explicitly.


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the live-compiled-executable count of one long pytest process.

    The full suite compiles thousands of XLA CPU programs; keeping every
    executable alive for the whole run exhausts the JIT's code address
    space and reproducibly SEGFAULTS a LATE compile (observed twice at
    ~95% of the suite inside ``backend_compile_and_load`` — the same test
    passes in isolation).  Dropping the caches between modules keeps the
    in-flight footprint at single-module scale; compile-sharing
    assertions (``_cache_size``) all live within one module, so they are
    unaffected.
    """
    yield
    jax.clear_caches()
