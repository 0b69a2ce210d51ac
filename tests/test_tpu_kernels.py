"""TPU-only Pallas kernel parity tests.

The CI suite runs on CPU (conftest pins the platform), where Mosaic kernels
cannot execute — these tests self-skip there.  On a TPU host
(``JAX_PLATFORMS`` unset / axon) they assert pivot parity of both Pallas
QRCP kernels against the jnp sweep, which is itself scipy-diff-tested in
``test_linalg.py``.  The verify drive scripts exercise the same kernels at
flagship/3D scale with timing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas TPU kernels need a TPU backend")


@pytest.mark.parametrize("shape", [(14, 5000), (8, 20000)])
def test_in_vmem_kernel_matches_jnp(shape):
    from openmeasure_tpu.linalg import qrcp as Q, qrcp_pallas as QP
    rng = np.random.default_rng(0)
    A = rng.standard_normal(shape).astype(np.float32)
    r = shape[0]
    piv_v = np.asarray(QP.qrcp_pivots_pallas(jnp.asarray(A), r))
    piv_j = np.asarray(Q.qrcp_pivots(jnp.asarray(A), r))
    np.testing.assert_array_equal(piv_v, piv_j)


@pytest.mark.parametrize("shape,bn", [((14, 50000), 8192),
                                      ((8, 20000), 4096)])
def test_streamed_kernel_matches_jnp(shape, bn):
    from openmeasure_tpu.linalg import qrcp as Q, qrcp_pallas as QP
    rng = np.random.default_rng(1)
    A = rng.standard_normal(shape).astype(np.float32)
    r = shape[0]
    piv_s = np.asarray(QP.qrcp_pivots_streamed(jnp.asarray(A), r,
                                               block_cols=bn))
    piv_j = np.asarray(Q.qrcp_pivots(jnp.asarray(A), r))
    np.testing.assert_array_equal(piv_s, piv_j)
