"""Differentiable integration (gpuintegration_tpu.diff).

Beyond-reference capability: the reference answers parameter-sensitivity
questions by re-running demo executables over parameter grids
(SURVEY.md section 2.6); here the estimator is a JAX function of theta,
so gradients are one backward pass and scans one vmap.  Tests validate:
the frozen-mesh estimate against closed forms, autodiff gradients
against (a) the analytic parameter derivative and (b) central finite
differences of the SAME estimator (which must agree to roundoff), vmap
batching against a Python loop, and the checkpoint-mesh pipeline.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu import (Volume, Workspace, fixed_mesh_integral,
                                frozen_grid_estimate, mesh_from_checkpoint,
                                train_grid)


def gauss(x, a):
    """f(x, a) = exp(-a * sum((x - 1/2)^2)); closed form on [0,1]^d:
    I(a) = (sqrt(pi/a) * erf(sqrt(a)/2))^d."""
    return jnp.exp(-a * jnp.sum((x - 0.5) ** 2, axis=-1))


def gauss_truth(a, ndim):
    return (math.sqrt(math.pi / a) * math.erf(math.sqrt(a) / 2.0)) ** ndim


def gauss_dtruth(a, ndim, h=1e-6):
    return (gauss_truth(a + h, ndim) - gauss_truth(a - h, ndim)) / (2 * h)


class TestFixedMesh:
    def test_estimate_matches_closed_form(self):
        est_fn = fixed_mesh_integral(gauss, 3, partitions_per_axis=6)
        est, err = est_fn(4.0)
        truth = gauss_truth(4.0, 3)
        assert abs(float(est) - truth) <= max(float(err), 1e-7 * truth)

    def test_grad_matches_analytic_derivative(self):
        est_fn = fixed_mesh_integral(gauss, 3, partitions_per_axis=6)
        g = jax.grad(lambda a: est_fn(a)[0])(4.0)
        assert abs(float(g) - gauss_dtruth(4.0, 3)) < 1e-6 * abs(
            gauss_dtruth(4.0, 3))

    def test_grad_is_exact_derivative_of_estimator(self):
        """Autodiff == central finite difference of the SAME estimator to
        roundoff (differentiation correctness, independent of mesh
        fineness)."""
        est_fn = fixed_mesh_integral(gauss, 2, partitions_per_axis=3)
        g = float(jax.grad(lambda a: est_fn(a)[0])(5.0))
        h = 1e-5
        fd = (float(est_fn(5.0 + h)[0]) - float(est_fn(5.0 - h)[0])) / (2 * h)
        assert abs(g - fd) < 1e-7 * abs(g)

    def test_vmap_parameter_scan(self):
        est_fn = fixed_mesh_integral(gauss, 2, partitions_per_axis=4)
        a_batch = jnp.asarray([1.0, 3.0, 9.0])
        ests, errs = jax.vmap(est_fn)(a_batch)
        for i, a in enumerate([1.0, 3.0, 9.0]):
            e1, r1 = est_fn(a)
            np.testing.assert_allclose(float(ests[i]), float(e1), rtol=1e-14)

    def test_pytree_theta_and_volume(self):
        """theta as a pytree; non-unit volume through the same transform
        the drivers use."""
        def f(x, th):
            return th["scale"] * jnp.exp(
                -th["a"] * jnp.sum((x - 0.5) ** 2, axis=-1))

        v = Volume([0.0, 0.0], [2.0, 2.0])
        est_fn = fixed_mesh_integral(f, 2, partitions_per_axis=8, vol=v)
        th = {"a": 2.0, "scale": 3.0}
        est, err = est_fn(th)
        grads = jax.grad(lambda t: est_fn(t)[0])(th)
        # d/dscale = est/scale exactly (linearity)
        np.testing.assert_allclose(float(grads["scale"]),
                                   float(est) / 3.0, rtol=1e-12)
        # I(a, scale) on [0,2]^2 = scale * (sqrt(pi/a) erf(...)) closed
        # form: erf over [-1/2, 3/2] halves
        half = (math.erf(math.sqrt(2.0) * 0.5)
                + math.erf(math.sqrt(2.0) * 1.5))
        truth = 3.0 * (0.5 * math.sqrt(math.pi / 2.0) * half) ** 2
        assert abs(float(est) - truth) <= max(float(err), 1e-6 * truth)

    def test_checkpoint_mesh_pipeline(self):
        """Adapted mesh from a Workspace checkpoint drives the frozen
        estimator; estimate stays accurate at the training theta.
        Tolerances out of reach -> no region retires -> the checkpoint is
        a complete partition (mesh_from_checkpoint docstring recipe)."""
        from gpuintegration_tpu.models import genz
        g = genz.f4_gaussian(3, a=5.0)
        ws = Workspace(3, chunk_size=1024)
        ws.integrate(g, epsrel=1e-12, epsabs=1e-200, max_iterations=6,
                     fused=False)
        ck = ws.make_checkpoint()
        regions = mesh_from_checkpoint(ck)
        assert regions[0].shape[1] == 3

        # genz f4 with a=5 is exp(-25 * sum (x-1/2)^2): theta = 25
        est_fn2 = fixed_mesh_integral(gauss, 3, regions=regions)
        est2, err2 = est_fn2(25.0)
        truth = gauss_truth(25.0, 3)
        assert abs(float(est2) - truth) <= max(3 * float(err2),
                                               1e-5 * truth)
        # and the gradient is available on the adapted mesh
        gr = jax.grad(lambda a: est_fn2(a)[0])(25.0)
        assert np.isfinite(float(gr))

    def test_rejects_bad_region_shapes(self):
        with pytest.raises(ValueError):
            fixed_mesh_integral(gauss, 3, regions=(np.zeros((4, 2)),
                                                   np.ones((4, 2))))
        with pytest.raises(ValueError):
            fixed_mesh_integral(gauss, 3)


class TestFrozenGrid:
    def test_unbiased_estimate_and_crn_gradient(self):
        xi = train_grid(gauss, 2, theta=6.0, ncall=2e4, adjust_iters=6,
                        seed=3)
        est_fn = jax.jit(frozen_grid_estimate(gauss, xi, 2, ncall=2e5))
        key = jax.random.PRNGKey(7)
        est, err = est_fn(6.0, key)
        truth = gauss_truth(6.0, 2)
        assert abs(float(est) - truth) <= max(5 * float(err), 5e-3 * truth)
        # autodiff == common-random-number finite difference (same key)
        g = float(jax.grad(lambda a: est_fn(a, key)[0])(6.0))
        h = 1e-4
        fd = (float(est_fn(6.0 + h, key)[0])
              - float(est_fn(6.0 - h, key)[0])) / (2 * h)
        assert abs(g - fd) < 1e-5 * max(1.0, abs(g))
        # and the gradient estimates the analytic derivative
        d_truth = gauss_dtruth(6.0, 2)
        assert abs(g - d_truth) < 0.05 * abs(d_truth)

    def test_uniform_grid_plain_mc(self):
        """With a uniform grid the estimator is plain MC (weights 1)."""
        from gpuintegration_tpu.mcubes import grid as vgrid
        xi = vgrid.uniform_grid(2, 50)
        est_fn = frozen_grid_estimate(gauss, xi, 2, ncall=1e5)
        est, err = est_fn(1.0, jax.random.PRNGKey(0))
        truth = gauss_truth(1.0, 2)
        assert abs(float(est) - truth) <= max(5 * float(err), 1e-2 * truth)
