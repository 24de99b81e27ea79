"""Unit tests of the Genz-Malik rule tables.

Mirrors the reference's implicit rule validation (constant integrands give
exact estimates with zero error, test/cuda/pagani/RegionSampling.cu:47+)
plus direct mathematical checks: polynomial exactness of the degree-9 rule
and annihilation by the null rules.
"""
import itertools

import numpy as np
import pytest

from gpuintegration_tpu.ops.genz_malik import (
    NRULES, NSETS, feval_per_region, genz_malik_rule)


@pytest.mark.parametrize("ndim", [2, 3, 5, 7, 8, 10])
def test_feval_count(ndim):
    rule = genz_malik_rule(ndim)
    assert rule.points.shape == (feval_per_region(ndim), ndim)
    assert rule.point_weights.shape == (feval_per_region(ndim), NRULES)
    assert rule.counts.sum() == feval_per_region(ndim)


@pytest.mark.parametrize("ndim", [2, 3, 5, 8])
def test_weights_integrate_constant_exactly(ndim):
    rule = genz_malik_rule(ndim)
    # Main rule integrates f=1 exactly over any region; null rules kill it.
    sums = rule.point_weights.sum(axis=0)
    assert abs(sums[0] - 1.0) < 1e-13
    np.testing.assert_allclose(sums[1:], 0.0, atol=5e-13)


def _integrate_monomial(rule, powers):
    """Apply the rule to x^powers over [-0.5, 0.5]^n (points are centered)."""
    vals = np.prod(rule.points ** np.asarray(powers), axis=1)
    return rule.point_weights[:, 0] @ vals


def _exact_monomial(powers):
    # integral of x^p over [-1/2, 1/2] = (1/2)^p / (p+1) for even p, else 0
    total = 1.0
    for p in powers:
        if p % 2 == 1:
            return 0.0
        total *= (0.5 ** p) / (p + 1)
    return total


@pytest.mark.parametrize("ndim", [2, 3, 5])
def test_degree9_polynomial_exactness(ndim):
    """A degree-9 rule must integrate all monomials of total degree <= 9
    exactly (the defining property of the Genz-Malik degree-9 family)."""
    rule = genz_malik_rule(ndim)
    rng = np.random.default_rng(0)
    exps = [e for e in itertools.product(range(10), repeat=ndim)
            if sum(e) <= 9]
    if len(exps) > 80:
        exps = [exps[i] for i in rng.choice(len(exps), 80, replace=False)]
    for powers in exps:
        got = _integrate_monomial(rule, powers)
        want = _exact_monomial(powers)
        assert abs(got - want) < 1e-12, (powers, got, want)


@pytest.mark.parametrize("ndim", [3, 5])
def test_null_rules_annihilate_low_degree(ndim):
    """Null rule r=1 has degree 7: it must annihilate monomials of degree
    <= 7 (it measures the degree-8+ content used for error estimation)."""
    rule = genz_malik_rule(ndim)
    for powers in [(0,) * ndim, (2,) + (0,) * (ndim - 1),
                   (4,) + (0,) * (ndim - 1), (2, 2) + (0,) * (ndim - 2),
                   (6,) + (0,) * (ndim - 1), (4, 2) + (0,) * (ndim - 2)]:
        vals = np.prod(rule.points ** np.asarray(powers), axis=1)
        null1 = rule.point_weights[:, 1] @ vals
        assert abs(null1) < 1e-12, (powers, null1)


@pytest.mark.parametrize("ndim", [2, 4, 6])
def test_point_ordering_contract(ndim):
    """The fourth-difference logic requires: index 0 = center, 1..2n = a1
    orbit as (dim, +/-) pairs, 2n+1..4n = a2 orbit likewise
    (reference: Sample.cuh:194-218 walks this exact layout)."""
    rule = genz_malik_rule(ndim)
    pts = rule.points
    np.testing.assert_array_equal(pts[0], np.zeros(ndim))
    a1 = 0.4779536579022695061928604197171830064732
    a2 = 0.2030285873691198677998034402373279133258
    for d in range(ndim):
        plus = pts[1 + 2 * d]
        minus = pts[2 + 2 * d]
        assert plus[d] == pytest.approx(a1) and minus[d] == pytest.approx(-a1)
        assert np.count_nonzero(plus) == 1 and np.count_nonzero(minus) == 1
        plus2 = pts[1 + 2 * ndim + 2 * d]
        minus2 = pts[2 + 2 * ndim + 2 * d]
        assert plus2[d] == pytest.approx(a2)
        assert minus2[d] == pytest.approx(-a2)


def test_scale_norm_shapes():
    rule = genz_malik_rule(5)
    assert rule.scale.shape == (NSETS, NRULES)
    assert rule.norm.shape == (NSETS, NRULES)
    # norms are positive reciprocals of weighted sums
    assert np.all(rule.norm[:, 1:4] > 0)


def test_padding():
    rule = genz_malik_rule(6)
    pts, wts = rule.padded(128)
    assert pts.shape[0] % 128 == 0
    assert pts.shape[0] >= rule.feval
    np.testing.assert_array_equal(wts[rule.feval:], 0.0)
