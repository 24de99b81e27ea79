"""Polynomial inverse-CDF importance sampling (the gather-free VEGAS
path).  Unbiasedness holds for ANY monotone map -- these tests check the
map construction and end-to-end statistics."""
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu.mcubes import grid as vgrid
from gpuintegration_tpu.mcubes import vegas as V
from gpuintegration_tpu.mcubes.poly_importance import (
    clenshaw, eval_map_and_weight, fit_importance_poly)
from gpuintegration_tpu.models import genz


def test_uniform_grid_fits_identity():
    xi = np.asarray(vgrid.uniform_grid(3, 100))
    p, q = fit_importance_poly(xi, 10)
    s = np.linspace(0, 1, 41)
    t = 2 * s - 1
    for d in range(3):
        fitted = np.polynomial.chebyshev.chebval(t, p[d])
        np.testing.assert_allclose(fitted, s, atol=1e-12)
        deriv = np.polynomial.chebyshev.chebval(t, q[d]) ** 2  # P' = q^2
        np.testing.assert_allclose(deriv, 1.0, atol=1e-12)


def test_map_endpoints_and_monotonicity():
    """P(0)=0, P(1)=1, P' >= 0 even for a strongly adapted grid."""
    rng = np.random.default_rng(1)
    # a peaked grid: most mass near s=0.3
    edges = np.cumsum(np.concatenate([[0], rng.random(200) ** 4 + 1e-4]))
    edges /= edges[-1]
    xi = edges[None, :]
    p, q = fit_importance_poly(xi, 14)
    s = np.linspace(0, 1, 1001)
    t = 2 * s - 1
    P = np.polynomial.chebyshev.chebval(t, p[0])
    dP = np.polynomial.chebyshev.chebval(t, q[0]) ** 2  # P' = q^2
    assert abs(P[0]) < 1e-10 and abs(P[-1] - 1) < 1e-10
    assert (dP >= 0).all()                      # q^2 construction
    assert (np.diff(P) >= -1e-12).all()


def test_clenshaw_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    c = rng.normal(size=12)
    t = jnp.asarray(np.linspace(-1, 1, 33))
    got = np.asarray(clenshaw(jnp.asarray(c), 12, t))
    want = np.polynomial.chebyshev.chebval(np.asarray(t), c)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_weight_is_map_derivative():
    """E[w] over uniform s must be exactly P(1)-P(0)=1 per dim (weights
    self-normalise); numeric check by trapezoid."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    edges = np.cumsum(np.concatenate([[0], rng.random(100) + 0.1]))
    edges /= edges[-1]
    xi = np.stack([edges, np.linspace(0, 1, 101)])
    p, q = fit_importance_poly(xi, 12)
    s = np.linspace(0, 1, 20001)
    grid = np.stack([s, s], axis=-1)
    coords, w = eval_map_and_weight(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(grid))
    mean_w = float(np.trapezoid(np.asarray(w), s))
    assert mean_w == pytest.approx(1.0, abs=2e-3)


def test_vegas_poly_converges():
    g = genz.f4_gaussian(3, a=5.0)
    r = V.integrate(g, epsrel=2e-3, ncall=1e5, total_iters=12,
                    adjust_iters=8, seed=4, importance="poly")
    assert r.status == 0
    assert abs(r.estimate - g.true_value) / g.true_value < 5e-3


def test_vegas_poly_deterministic():
    g = genz.f4_gaussian(2, a=3.0)
    r1 = V.integrate(g, ncall=1e4, total_iters=6, adjust_iters=4, seed=42,
                     importance="poly")
    r2 = V.integrate(g, ncall=1e4, total_iters=6, adjust_iters=4, seed=42,
                     importance="poly")
    assert r1.estimate == r2.estimate


def test_device_fit_matches_host_fit():
    """fit_importance_poly_device (the fixed-linear-map fit that lets
    refine='device' re-fit inside the fused loop, round 5) must equal
    the host least-squares fit to lstsq roundoff on a realistic
    nonuniform refined grid."""
    from gpuintegration_tpu.mcubes.poly_importance import (
        fit_importance_poly, fit_importance_poly_device)
    rng = np.random.default_rng(0)
    ndim, nbins = 4, 500
    w = rng.dirichlet(np.full(nbins, 0.7), size=ndim)
    xi = np.concatenate([np.zeros((ndim, 1)), np.cumsum(w, axis=1)],
                        axis=1)
    xi[:, -1] = 1.0
    p_h, q_h = fit_importance_poly(xi)
    p_d, q_d = (np.asarray(a)
                for a in fit_importance_poly_device(jnp.asarray(xi)))
    assert p_h.shape == p_d.shape and q_h.shape == q_d.shape
    np.testing.assert_allclose(p_d, p_h, atol=1e-10)
    np.testing.assert_allclose(q_d, q_h, atol=1e-10)
