"""Genz integrand family battery with analytic truths.

Re-expression of the reference's integrand zoo
(reference: common/cuda/integrands.cuh:12-1934 -- F_1..F_6 at 5D-8D plus
_alt variants; analytic-truth helpers in
cuda/pagani/demos/compute_genz_integrals.cuh).  Each family is a batched
JAX callable over (..., ndim) arrays plus a closed-form ``true_value``.

Default parameters match the reference's 8D/7D/6D/5D instances:
  F1 oscillatory:   cos(sum (i+1) x_i)              (integrands.cuh:1303-1326)
  F2 product peak:  prod 1/(a^-2 + (x_i-b)^2), a=50, b=.5   (:1328-1366)
  F3 corner peak:   (1 + sum (i+1) x_i)^-(n+1)      (:1368-1393)
  F4 gaussian:      exp(-sum a^2 (x_i-b)^2), a=25, b=.5     (:1395-1425)
  F5 c0-continuous: exp(-sum a |x_i-b|), a=10, b=.5         (:1427-1457)
  F6 discontinuous: exp(sum a_i x_i) on x_i <= b_i else 0,
                    a_i = i+3, b_i = (i+2)/10               (:1459-1487)
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GenzIntegrand:
    """A batched integrand together with its exact integral over [0,1]^n.

    ``truth_exact``: False when ``true_value`` is a high-accuracy numeric
    estimate rather than a closed form (accuracy analyses below ~1e-6
    relative must not treat such a truth as exact)."""

    name: str
    ndim: int
    f: Callable
    true_value: float
    truth_exact: bool = True

    def __call__(self, x):
        return self.f(x)


# ---------------------------------------------------------------------------
# closed forms (unit cube)

def _osc_truth(coeffs: np.ndarray, offset: float = 0.0) -> float:
    """Integral of cos(offset + sum a_i x_i) over [0,1]^n:
    Re[ e^{i offset} prod_j (e^{i a_j} - 1)/(i a_j) ]."""
    z = np.exp(1j * offset)
    for a in coeffs:
        z = z * (np.exp(1j * a) - 1.0) / (1j * a)
    return float(z.real)


def _sin_sum_truth(coeffs: np.ndarray, offset: float = 0.0) -> float:
    z = np.exp(1j * offset)
    for a in coeffs:
        z = z * (np.exp(1j * a) - 1.0) / (1j * a)
    return float(z.imag)


def _product_peak_truth(a: float, b: float, ndim: int) -> float:
    per_dim = a * (math.atan(a * (1.0 - b)) - math.atan(a * (0.0 - b)))
    return per_dim ** ndim


def _corner_peak_truth(coeffs: np.ndarray) -> float:
    """Integral of (1 + sum a_i x_i)^-(n+1) over [0,1]^n by
    inclusion-exclusion:
      1/(n! prod a_i) * sum_{S subset [n]} (-1)^{|S|} / (1 + sum_{i in S} a_i)
    """
    n = len(coeffs)
    total = 0.0
    for mask in range(1 << n):
        s = 1.0 + sum(coeffs[i] for i in range(n) if mask >> i & 1)
        sign = -1.0 if bin(mask).count("1") % 2 else 1.0
        total += sign / s
    return total / (math.factorial(n) * float(np.prod(coeffs)))


def _gaussian_truth(a: float, b: float, ndim: int) -> float:
    per_dim = (math.sqrt(math.pi) / (2 * a)) * (
        math.erf(a * (1.0 - b)) + math.erf(a * b))
    return per_dim ** ndim


def _c0_truth(a: float, b: float, ndim: int) -> float:
    per_dim = (2.0 - math.exp(-a * b) - math.exp(-a * (1.0 - b))) / a
    return per_dim ** ndim


def _discontinuous_truth(coeffs: np.ndarray, bounds: np.ndarray) -> float:
    total = 1.0
    for a, b in zip(coeffs, bounds):
        # the integration domain is [0,1]: a bound past 1 contributes
        # only up to 1 (the default b_i = (i+2)/10 exceeds 1 at ndim >=
        # 9, where the unclamped formula overstated the truth 3.3x)
        total *= (math.exp(a * min(b, 1.0)) - 1.0) / a
    return total


# ---------------------------------------------------------------------------
# families

def f1_oscillatory(ndim: int, coeffs: Sequence[float] | None = None,
                   offset: float = 0.0) -> GenzIntegrand:
    a = np.asarray(coeffs if coeffs is not None
                   else np.arange(1, ndim + 1), dtype=np.float64)

    def f(x):
        return jnp.cos(offset + jnp.sum(x * a, axis=-1))

    return GenzIntegrand("f1_oscillatory", ndim, f, _osc_truth(a, offset))


def f2_product_peak(ndim: int, a: float = 50.0, b: float = 0.5) -> GenzIntegrand:
    def f(x):
        # one f64 division of the denominator product instead of ndim
        # divisions (f64 divide is the most expensive emulated VPU op)
        return 1.0 / jnp.prod(1.0 / a ** 2 + (x - b) ** 2, axis=-1)

    return GenzIntegrand("f2_product_peak", ndim, f,
                         _product_peak_truth(a, b, ndim))


def f3_corner_peak(ndim: int, coeffs: Sequence[float] | None = None) -> GenzIntegrand:
    a = np.asarray(coeffs if coeffs is not None
                   else np.arange(1, ndim + 1), dtype=np.float64)

    def f(x):
        # integer exponent -> lax.integer_pow (squared-multiply chain +
        # one divide); a float exponent lowers to exp(y*log(x)), ~5x the
        # cost under f64 emulation
        return (1.0 + jnp.sum(x * a, axis=-1)) ** (-(ndim + 1))

    return GenzIntegrand("f3_corner_peak", ndim, f, _corner_peak_truth(a))


def f4_gaussian(ndim: int, a: float = 25.0, b: float = 0.5) -> GenzIntegrand:
    def f(x):
        return jnp.exp(-jnp.sum((a * a) * (x - b) ** 2, axis=-1))

    return GenzIntegrand("f4_gaussian", ndim, f, _gaussian_truth(a, b, ndim))


def f5_c0_continuous(ndim: int, a: float = 10.0, b: float = 0.5) -> GenzIntegrand:
    def f(x):
        return jnp.exp(-a * jnp.sum(jnp.abs(x - b), axis=-1))

    return GenzIntegrand("f5_c0", ndim, f, _c0_truth(a, b, ndim))


def f6_discontinuous(ndim: int, coeffs: Sequence[float] | None = None,
                     bounds: Sequence[float] | None = None) -> GenzIntegrand:
    a = np.asarray(coeffs if coeffs is not None
                   else np.arange(3, ndim + 3), dtype=np.float64)
    b = np.asarray(bounds if bounds is not None
                   else (np.arange(2, ndim + 2)) / 10.0, dtype=np.float64)

    def f(x):
        inside = jnp.all(x <= b, axis=-1)
        return jnp.where(inside, jnp.exp(jnp.sum(x * a, axis=-1)), 0.0)

    return GenzIntegrand("f6_discontinuous", ndim, f,
                         _discontinuous_truth(a, b))


def genz_suite(ndim: int) -> list[GenzIntegrand]:
    """The full F1..F6 battery at a given dimension (reference demo set:
    cuda/pagani/demos/new_interface_Genz*_*.cu)."""
    return [
        f1_oscillatory(ndim),
        f2_product_peak(ndim),
        f3_corner_peak(ndim),
        f4_gaussian(ndim),
        f5_c0_continuous(ndim),
        f6_discontinuous(ndim),
    ]
