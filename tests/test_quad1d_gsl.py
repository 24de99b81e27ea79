"""The GSL 1-D surface: computed GK tables, QNG, QAG keys, CQUAD, QAWO/QAWF.

Mirrors the capability of the reference's GSL binding
(reference: cubacpp/cubacpp/gsl.hh).  Table correctness is pinned two
ways: degree-of-exactness (a property no transcription error survives)
and a match against the classic GK15 constants.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu.ops import quad1d
from gpuintegration_tpu.ops.quad1d import (
    KEY_TO_GAUSS_N, cc_rule, cquad, gk_pair, integrate1d, qawf, qawo, qng,
    _wynn_epsilon)


class TestComputedTables:
    def test_gk15_matches_published_constants(self):
        xk, wk, _ = gk_pair(7)
        # published tables list the non-negative nodes descending
        pos = xk[xk >= -1e-15][::-1]
        w_pos = wk[xk >= -1e-15][::-1]
        np.testing.assert_allclose(pos, quad1d._XGK15, atol=1e-12)
        np.testing.assert_allclose(w_pos, quad1d._WGK15, atol=1e-12)

    @pytest.mark.parametrize("key", sorted(KEY_TO_GAUSS_N))
    def test_degree_of_exactness(self, key):
        """Gauss-n exact to 2n-1; Kronrod-(2n+1) exact to 3n+1 -- the
        property that uniquely pins the Laurie construction."""
        n = KEY_TO_GAUSS_N[key]
        xk, wk, wg = gk_pair(n)
        for deg in range(0, 2 * n):
            truth = 2.0 / (deg + 1) if deg % 2 == 0 else 0.0
            assert np.sum(wg * xk ** deg) == pytest.approx(truth, abs=1e-12)
        for deg in range(0, 3 * n + 2):
            truth = 2.0 / (deg + 1) if deg % 2 == 0 else 0.0
            assert np.sum(wk * xk ** deg) == pytest.approx(truth, abs=1e-11)

    @pytest.mark.parametrize("m", [4, 8, 16, 32, 64])
    def test_cc_exactness_and_nesting(self, m):
        x, w = cc_rule(m)
        for deg in range(0, m + 1):
            truth = 2.0 / (deg + 1) if deg % 2 == 0 else 0.0
            assert np.sum(w * x ** deg) == pytest.approx(truth, abs=1e-12)
        if m >= 8:
            x_half, _ = cc_rule(m // 2)
            np.testing.assert_allclose(x[::2], x_half, atol=1e-14)


class TestQNG:
    def test_smooth_converges_cheaply(self):
        r = qng(lambda x: jnp.exp(x), 0.0, 1.0, epsrel=1e-10)
        assert r.status == 0
        assert r.estimate == pytest.approx(math.e - 1.0, rel=1e-10)
        assert r.neval <= 15 + 21   # first or second rung of the cascade

    def test_hard_integrand_flagged(self):
        r = qng(lambda x: 1.0 / jnp.sqrt(jnp.abs(x) + 1e-300), 0.0, 1.0,
                epsrel=1e-10)
        assert r.status == 1        # non-adaptive cannot resolve x^-1/2


class TestQAGKeys:
    def test_key6_oscillatory_cheaper_than_key1(self):
        f = lambda x: jnp.cos(50 * x)
        r1 = integrate1d(f, 0.0, 1.0, epsrel=1e-10, key=1)
        r6 = integrate1d(f, 0.0, 1.0, epsrel=1e-10, key=6)
        truth = math.sin(50.0) / 50.0
        for r in (r1, r6):
            assert r.status == 0
            assert r.estimate == pytest.approx(truth, rel=1e-9)
        assert r6.nregions < r1.nregions   # higher-order rule subdivides less

    def test_invalid_key(self):
        with pytest.raises(ValueError):
            integrate1d(lambda x: x, 0.0, 1.0, key=7)

    def test_singular_pool_stays_small(self):
        """Active-only bisection: on a kink integrand the pool must track
        the refinement depth, not explode exponentially (the old
        split-everything loop hit max_intervals=64 on this integrand)."""
        a = 200.0
        r = integrate1d(lambda x: jnp.exp(-a * jnp.abs(x - 0.37)), 0.0, 1.0,
                        epsrel=1e-10, max_intervals=4096)
        truth = (2 - math.exp(-a * 0.37) - math.exp(-a * 0.63)) / a
        assert r.status == 0
        assert r.estimate == pytest.approx(truth, rel=1e-9)
        assert r.nregions < 512


class TestCQUAD:
    def test_smooth(self):
        r = cquad(lambda x: jnp.exp(x), 0.0, 1.0, epsrel=1e-10)
        assert r.status == 0
        assert r.estimate == pytest.approx(math.e - 1.0, rel=1e-10)

    def test_sqrt_derivative_singularity(self):
        r = cquad(lambda x: jnp.sqrt(jnp.abs(x)), 0.0, 1.0, epsrel=1e-8)
        assert r.status == 0
        assert r.estimate == pytest.approx(2.0 / 3.0, rel=1e-7)

    def test_escalation_beats_naive_split(self):
        """An analytic but stiff integrand should converge mostly through
        degree escalation (few regions), not subdivision."""
        r = cquad(lambda x: 1.0 / (1e-2 + x ** 2), -1.0, 1.0, epsrel=1e-9)
        truth = 2.0 * math.atan(10.0) / 0.1
        assert r.status == 0
        assert r.estimate == pytest.approx(truth, rel=1e-8)
        assert r.nregions <= 64


class TestFourier:
    def test_wynn_accelerates_log2(self):
        s = np.cumsum([(-1.0) ** k / (k + 1) for k in range(12)])
        best, _ = _wynn_epsilon(list(s))
        assert best == pytest.approx(math.log(2.0), abs=1e-8)

    def test_qawo_x_sin(self):
        c = 10.0 * math.pi
        r = qawo(lambda x: x, 0.0, 1.0, omega=c, sin_or_cos="sin",
                 epsrel=1e-10)
        assert r.status == 0
        assert r.estimate == pytest.approx(-math.cos(c) / c, rel=1e-9)

    def test_qawf_damped_sin(self):
        om = 2.0
        r = qawf(lambda x: jnp.exp(-x), 0.0, omega=om, sin_or_cos="sin",
                 epsabs=1e-10)
        assert r.status == 0
        assert r.estimate == pytest.approx(om / (1.0 + om * om), abs=1e-8)

    def test_qawf_algebraic_decay(self):
        # int_0^inf cos(x)/(1+x^2) dx = pi/(2e): 1/x^2 tails genuinely
        # need the epsilon acceleration (raw partial sums converge ~1/k)
        r = qawf(lambda x: 1.0 / (1.0 + x * x), 0.0, omega=1.0,
                 sin_or_cos="cos", epsabs=1e-8)
        assert r.status == 0
        assert r.estimate == pytest.approx(math.pi / (2.0 * math.e),
                                           abs=1e-7)

    def test_qawf_zero_omega_raises(self):
        with pytest.raises(ValueError):
            qawf(lambda x: x, 0.0, omega=0.0)


class TestErrorHonesty:
    """Reported errors must cover the truth (review regressions)."""

    def test_qawf_peaked_cycle_not_confidently_wrong(self):
        """A sharp feature inside one half-cycle: the old code ran one
        non-adaptive GK61 and THREW AWAY its error, reporting 4e-17
        against a true error of 8e-3."""
        from gpuintegration_tpu.ops.quad1d import qawf

        def f(x):
            return 1.0 / (1.0 + (50.0 * (x - 4.0)) ** 2) * jnp.exp(-0.05 * x)

        r = qawf(f, 0.0, 1.0, "sin", epsabs=1e-8)
        # verified against qag over [0, 400] at epsrel 1e-13 (this repo)
        truth = -0.03810737676239791
        assert abs(r.estimate - truth) <= max(10 * r.errorest, 1e-10), (
            r.estimate, r.errorest)

    def test_gk_roundoff_floor(self):
        """Large-magnitude cancelling integrand: the error can never be
        reported below the f64 roundoff of |f| (QUADPACK 50*eps*resabs)."""
        from gpuintegration_tpu.ops.quad1d import _eval_gk
        import numpy as np
        lo = jnp.asarray([0.0])
        ln = jnp.asarray([2.0 * np.pi])
        e, r = _eval_gk(lambda x: 1e16 * jnp.cos(x), lo, ln, 30)
        # true integral 0; resabs ~ 4e16 -> floor ~ 4.4e2
        assert float(r[0]) >= 50 * np.finfo(np.float64).eps * 1e16

    def test_poly_map_stays_in_unit_cube(self):
        from gpuintegration_tpu.mcubes import grid as vgrid
        from gpuintegration_tpu.mcubes.poly_importance import (
            eval_map_and_weight, fit_importance_poly)
        rng = np.random.RandomState(0)
        d = rng.rand(2, 500) ** 4
        xi = vgrid.smooth_and_refine(np.asarray(vgrid.uniform_grid(2, 500)),
                                     d)
        pc, qc = fit_importance_poly(xi, 14)
        s = jnp.asarray(np.linspace(0.0, 1.0, 4001)[:, None]
                        * np.ones((1, 2)), jnp.float32)
        coords, _ = eval_map_and_weight(
            jnp.asarray(pc, jnp.float32), jnp.asarray(qc, jnp.float32), s)
        assert float(jnp.min(coords)) >= 0.0
        assert float(jnp.max(coords)) <= 1.0


def test_cquad_escalation_reuses_nested_nodes():
    """CC nodes nest: a degree escalation evaluates only the m/2 NEW
    nodes (regression: all m+1 were re-evaluated, ~2x the necessary
    integrand work), and neval matches the actual evaluation count."""
    from gpuintegration_tpu.ops.quad1d import cquad
    calls = {"n": 0}

    def f(x):
        calls["n"] += int(np.prod(x.shape))
        return jnp.cos(8.0 * x)     # escalates 8->16->32, never splits

    r = cquad(f, 0.0, 1.0, epsrel=1e-10)
    assert r.status == 0 and r.nregions == 1
    assert calls["n"] == r.neval
    # escalating 8->16->32 costs 9+8+16 = 33 evals; the non-nested
    # version cost 9+17+33 = 59
    assert r.neval == 33, r.neval
