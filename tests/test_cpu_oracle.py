"""Cross-implementation equivalence: TPU path vs native CPU oracle.

The template is the reference's test_cpu_vs_gpu.cu:12-23 (CPU and GPU
evaluations of the same model must agree) and its use of cubacpp/CUBA as
the accuracy reference; plus the C-ABI driver test
(test_integration_from_c.c:1-24).
"""
import math
import subprocess
import os

import numpy as np
import pytest

from gpuintegration_tpu.ops.genz_malik import feval_per_region
from gpuintegration_tpu.utils import cpu_oracle

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module", autouse=True)
def lib():
    return cpu_oracle.load_library()


def test_rule_feval_parity():
    """The C++ rule builder and the NumPy rule builder agree on point
    counts for every dimension."""
    for n in range(2, 11):
        assert cpu_oracle.rule_feval(n) == feval_per_region(n)


def test_cuhre_cpu_product_peak():
    a, b = 5.0, 0.5

    def f(x):
        return float(np.prod(1.0 / (1.0 / a ** 2 + (x - b) ** 2)))

    truth = (a * (math.atan(a * (1 - b)) - math.atan(-a * b))) ** 3
    r = cpu_oracle.cuhre_cpu(f, 3, epsrel=1e-7)
    assert r.status == 0
    assert abs(r.estimate - truth) / truth < 1e-6


def test_cuhre_cpu_volume_transform():
    def f(x):
        return float(x[0] * x[1])

    r = cpu_oracle.cuhre_cpu(f, 2, lows=[0, 1], highs=[2, 3], epsrel=1e-9)
    assert r.estimate == pytest.approx(2.0 * 4.0, rel=1e-9)


def test_vegas_cpu_gaussian():
    a = 5.0

    def g(x):
        return float(np.exp(-a * a * np.sum((x - 0.5) ** 2)))

    truth = (math.sqrt(math.pi) / a * math.erf(a / 2)) ** 3
    r = cpu_oracle.vegas_cpu(g, 3, epsrel=5e-3, ncall=5e4, seed=1)
    assert r.status == 0
    assert abs(r.estimate - truth) / truth < 2e-2


def test_suave_cpu_product_peak():
    """The Suave oracle converges to the closed form and its error bar
    covers the true error (subregion importance MC with grid inheritance,
    reference algorithm behind cubacpp/suave.hh)."""
    a, b = 5.0, 0.5

    def f(x):
        return float(np.prod(1.0 / (1.0 / a ** 2 + (x - b) ** 2)))

    truth = (a * (math.atan(a * (1 - b)) - math.atan(-a * b))) ** 3
    r = cpu_oracle.suave_cpu(f, 3, epsrel=1e-3, seed=3)
    assert r.status == 0
    assert abs(r.estimate - truth) <= 3 * r.errorest
    assert abs(r.estimate - truth) / truth < 1e-3


def test_suave_cpu_sign_changing_subdivides():
    """epsabs-driven run on a zero integral: the pool must actually
    subdivide (fluctuation splitting) and the estimate stay within error
    bars of zero."""

    def s(x):
        return float(math.sin(2 * math.pi * x[0]) * (x[1] + 0.5))

    r = cpu_oracle.suave_cpu(s, 2, epsrel=0.0, epsabs=2e-4, seed=0)
    assert r.status == 0
    assert r.nregions > 10
    assert abs(r.estimate) <= 3 * r.errorest


def test_suave_tpu_matches_cpu_oracle():
    """The TPU batch Suave and the serial CPU Suave oracle agree within
    combined error bars on a peaked integrand (the test_cpu_vs_gpu.cu
    contract applied to the third CUBA algorithm)."""
    from gpuintegration_tpu.pagani.suave import suave

    a = 5.0

    def g_np(x):
        return float(np.exp(-a * a * np.sum((x - 0.5) ** 2)))

    import jax.numpy as jnp

    def g_jax(x, y, z):
        s = (x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2
        return jnp.exp(-a * a * s)

    truth = (math.sqrt(math.pi) / a * math.erf(a / 2)) ** 3
    cpu = cpu_oracle.suave_cpu(g_np, 3, epsrel=2e-3, seed=1)
    tpu = suave(g_jax, epsrel=2e-3, epsabs=1e-40, nnew=512, seed=2)
    assert cpu.status == 0 and tpu.status == 0
    assert abs(cpu.estimate - tpu.estimate) <= 3 * (cpu.errorest
                                                    + tpu.errorest)
    assert abs(cpu.estimate - truth) <= 3 * cpu.errorest


def test_tpu_matches_cpu_oracle():
    """The headline cross-check: adaptive runs on both implementations of
    the same algorithm family agree within combined error bars."""
    import jax.numpy as jnp
    from gpuintegration_tpu import Workspace

    a = 10.0

    def f_np(x):
        return float(np.exp(-a * np.sum(np.abs(x - 0.5))))

    def f_jax(x, y, z):
        return jnp.exp(-a * (jnp.abs(x - .5) + jnp.abs(y - .5)
                             + jnp.abs(z - .5)))

    cpu = cpu_oracle.cuhre_cpu(f_np, 3, epsrel=1e-6)
    ws = Workspace(3)
    tpu = ws.integrate(f_jax, epsrel=1e-6, epsabs=1e-40)
    assert cpu.status == 0 and tpu.status == 0
    tol = 3 * (cpu.errorest + tpu.errorest)
    assert abs(cpu.estimate - tpu.estimate) < tol


def test_c_abi_driver():
    """Compile and run the plain-C driver against the shared library."""
    exe = os.path.join(NATIVE, "test_from_c")
    subprocess.run(
        ["gcc", os.path.join(NATIVE, "test_from_c.c"), "-o", exe,
         "-L" + NATIVE, "-lcpu_quad", "-lm",
         "-Wl,-rpath," + NATIVE],
        check=True, capture_output=True)
    out = subprocess.run([exe], capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "status=0" in out.stdout
