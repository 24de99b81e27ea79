"""Physics-likelihood cross-checks: PAGANI vs VEGAS vs the CPU oracle.

The reference's strongest correctness tests: a real physics model
evaluated on CPU and GPU must agree (test_cpu_vs_gpu.cu:12-23), and its
hybrid demo cross-checks PAGANI against VEGAS (cuda/pagani/demos/
hybrid.cu).  Same pattern here on the 6D cluster-likelihood workload.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow   # ~7 min of the suite's runtime; the
# default selection (pytest.ini addopts) skips it -- run `pytest -m slow`

from gpuintegration_tpu import Workspace  # noqa: E402
from gpuintegration_tpu.mcubes import vegas as V
from gpuintegration_tpu.models.physics import ClusterLikelihood
from gpuintegration_tpu.utils import cpu_oracle


@pytest.fixture(scope="module")
def model():
    return ClusterLikelihood()


@pytest.fixture(scope="module")
def pagani_result(model):
    ws = Workspace(6, chunk_size=1024)
    return ws.integrate(model, epsrel=3e-4, epsabs=1e-40)


def test_pointwise_twins_agree(model):
    """JAX and numpy implementations of the model agree to 1e-12 relative
    (the test_cpu_vs_gpu.cu:12-23 contract)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    xs = rng.random((200, 6))
    f_np = model.numpy_pointwise()
    want = np.array([f_np(x) for x in xs])
    got = np.asarray(model(jnp.asarray(xs)))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_pagani_converges(pagani_result):
    assert pagani_result.status == 0


def test_pagani_matches_cpu_oracle(model, pagani_result):
    cpu = cpu_oracle.cuhre_cpu(model.numpy_pointwise(), 6, epsrel=1e-2,
                               max_evals=3_000_000)
    tol = 3 * (pagani_result.errorest + cpu.errorest) \
        + 1e-3 * abs(cpu.estimate)
    assert abs(pagani_result.estimate - cpu.estimate) < tol


def test_vegas_cross_check(model, pagani_result):
    """PAGANI and VEGAS agree within combined error bars (hybrid.cu)."""
    r = V.integrate(model, epsrel=2e-3, ncall=2e5, total_iters=12,
                    adjust_iters=8, seed=5)
    assert r.status == 0
    tol = 5 * (r.errorest + pagani_result.errorest)
    assert abs(r.estimate - pagani_result.estimate) < tol
