"""Test configuration.

Conformance tests run on CPU with float64 enabled (TPU fp64 is emulated and
slow; the reference numerics are LAPACK float64).  A virtual 8-device CPU
mesh validates the multi-chip sharding paths without TPU hardware.

These environment variables must be set before jax initializes its backends,
hence the module-level placement.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# jaxtyping's pytest plugin imports jax before this conftest runs, so the env
# var alone can be read too late — set the config directly as well (backends
# are not initialized until first use, so this still takes effect).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
