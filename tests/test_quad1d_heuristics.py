"""1-D Gauss-Kronrod quadrature + legacy heuristic policies."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu.ops.quad1d import integrate1d
from gpuintegration_tpu.pagani.heuristics import apply_heuristic


class TestQuad1D:
    def test_polynomial_exact(self):
        r = integrate1d(lambda x: x ** 7 - 3 * x ** 2 + 1, 0.0, 2.0,
                        epsrel=1e-12)
        truth = 2 ** 8 / 8 - 2 ** 3 + 2
        assert r.status == 0
        assert r.estimate == pytest.approx(truth, rel=1e-12)

    def test_oscillatory(self):
        r = integrate1d(lambda x: jnp.cos(50 * x), 0.0, 1.0, epsrel=1e-10)
        assert r.status == 0
        assert r.estimate == pytest.approx(math.sin(50.0) / 50.0, rel=1e-9)

    def test_peaked(self):
        a = 200.0
        r = integrate1d(lambda x: jnp.exp(-a * jnp.abs(x - 0.37)), 0.0, 1.0,
                        epsrel=1e-7)
        truth = (2 - math.exp(-a * 0.37) - math.exp(-a * 0.63)) / a
        assert r.status == 0
        assert r.estimate == pytest.approx(truth, rel=1e-6)

    def test_reversed_interval_by_sign(self):
        r = integrate1d(lambda x: x, -1.0, 1.0, epsrel=1e-10, epsabs=1e-14)
        assert abs(r.estimate) < 1e-13

    def test_nonconvergence_flagged(self):
        # 1/sqrt(x) is integrable but needs extreme refinement at 0
        r = integrate1d(lambda x: 1.0 / jnp.sqrt(jnp.abs(x) + 1e-300),
                        0.0, 1.0, epsrel=1e-14, max_intervals=64)
        assert r.status == 1


class TestHeuristicPolicies:
    def _args(self, **over):
        base = dict(
            leaves_estimate=10.0, finished_estimate=1.0,
            queued_estimate=1.0, finished_errorest=0.001,
            queued_errorest=0.001, curr_iter_regions=100,
            total_nregions=1000, min_iter_reached=True,
            par_res=jnp.asarray([1.0]), par_err=jnp.asarray([0.5]),
            depth=3, self_res=jnp.asarray([0.001]),
            self_err=jnp.asarray([1e-6]), epsrel=1e-3, epsabs=1e-12)
        base.update(over)
        return base

    def test_policy_0_never_finishes(self):
        out = apply_heuristic(0, **self._args())
        assert not bool(out[0])

    def test_policy_9_small_contribution(self):
        out = apply_heuristic(9, **self._args(
            self_res=jnp.asarray([1e-6]), self_err=jnp.asarray([1e-9])))
        assert bool(out[0])

    def test_zero_region_finishes(self):
        out = apply_heuristic(0, **self._args(
            self_res=jnp.asarray([0.0]), self_err=jnp.asarray([1e-14])))
        assert bool(out[0])

    def test_min_iter_gate(self):
        out = apply_heuristic(9, **self._args(
            self_res=jnp.asarray([1e-6]), self_err=jnp.asarray([1e-9]),
            min_iter_reached=False))
        assert not bool(out[0])

    def test_unknown_policy_raises(self):
        with pytest.raises(ValueError):
            apply_heuristic(3, **self._args())


class TestHeuristicPipeline:
    """classify_with_heuristic: the phase-1 wiring of the policy switch
    over a one-shot evaluated pool (Phases.cuh:71-155 placement)."""

    def _pool(self):
        from gpuintegration_tpu.pagani import oneshot, region_pool
        lows, lengths, n = region_pool.uniform_split(3, 4, 64)

        def f(x, y, z):
            return jnp.exp(-50.0 * ((x - .1) ** 2 + (y - .1) ** 2
                                    + (z - .1) ** 2))
        res, est, err, _ = oneshot.apply_cubature_rules(f, lows, lengths)
        return res, est, err

    def test_small_contribution_policies_finish_far_regions(self):
        from gpuintegration_tpu.pagani.oneshot import classify_with_heuristic
        res, est, err = self._pool()
        for hid in (8, 9):
            fin = np.asarray(classify_with_heuristic(
                hid, est, err, epsrel=1e-3))
            # far-from-peak regions contribute ~0 and must classify
            # finished; the peak region must stay active
            assert fin.sum() > 0
            assert not fin[int(np.argmax(np.asarray(est)))]

    def test_policy_0_keeps_everything_active(self):
        from gpuintegration_tpu.pagani.oneshot import classify_with_heuristic
        res, est, err = self._pool()
        fin = np.asarray(classify_with_heuristic(0, est, err, epsrel=1e-3))
        assert not fin.any()

    def test_min_iter_gate(self):
        from gpuintegration_tpu.pagani.oneshot import classify_with_heuristic
        res, est, err = self._pool()
        fin = np.asarray(classify_with_heuristic(
            8, est, err, epsrel=1e-3, min_iter_reached=False))
        assert not fin.any()

    def test_depth_scaled_policy(self):
        from gpuintegration_tpu.pagani.oneshot import classify_with_heuristic
        res, est, err = self._pool()
        shallow = np.asarray(classify_with_heuristic(
            10, est, err, epsrel=1e-3, depth=1))
        deep = np.asarray(classify_with_heuristic(
            10, est, err, epsrel=1e-3, depth=12))
        # the 2/2^depth budget tightens with depth: deeper levels finish
        # at most as many regions
        assert deep.sum() <= shallow.sum()
