"""mcubes/VEGAS tests.

The reference exercises mcubes via demos asserting relative-error ladders
with the sequential CPU implementation as oracle (SURVEY.md section 4.8);
here we add what it lacks: seeded-PRNG statistical tests (pull
distributions against analytic truths) and unit tests of the grid
machinery against a direct transcription-free NR-style reference
implementation in pure Python.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu.mcubes import grid as vgrid
from gpuintegration_tpu.mcubes import vegas as V
from gpuintegration_tpu.models import genz, misc


class TestSetupMath:
    def test_ncubes_npg(self):
        # parity with ng = floor((ncall/2+.25)^(1/ndim)), npg = max(ncall/ncubes, 2)
        ng, ncubes = V.compute_ncubes(1e6, 5)
        assert ng == int((1e6 / 2 + 0.25) ** 0.2)
        assert ncubes == ng ** 5
        assert V.samples_per_cube(1e6, ncubes) == max(int(1e6 / ncubes), 2)

    def test_adjust_params_schedule(self):
        # (vegas_utils.cuh:272-296)
        nc, it, ok = V.adjust_params(1e6, 15)
        assert (nc, it, ok) == (1e7, 15, True)
        nc, it, ok = V.adjust_params(2e9, 15)
        assert (nc, it, ok) == (3e9, 15, True)
        nc, it, ok = V.adjust_params(9e9, 15)
        assert (nc, it, ok) == (9e9, 25, True)
        nc, it, ok = V.adjust_params(9e9, 100)
        assert ok is False

    def test_status_needs_five_iters(self):
        assert V.get_status(1.0, 1e-9, 3, 1e-3, 1e-12) == 1
        assert V.get_status(1.0, 1e-9, 5, 1e-3, 1e-12) == 0
        assert V.get_status(1.0, 0.5, 7, 1e-3, 1e-12) == 1

    def test_decode_cube_bijective(self):
        ng, ndim = 7, 3
        ids = jnp.arange(ng ** ndim)
        kg = np.asarray(V._decode_cube(ids, ng, ndim))
        assert kg.min() == 1 and kg.max() == ng
        # distinct coordinates for distinct cubes
        assert len({tuple(row) for row in kg}) == ng ** ndim
        # odometer order parity: last dim varies fastest (get_indx,
        # vegasT.cuh:141-162 with dp[0]=1 on the last decoded digit)
        np.testing.assert_array_equal(kg[1] - kg[0], [0, 0, 1])


class TestEdgeLookup:
    # The two-level (hi*32+lo) MXU edge fetch must reproduce direct
    # indexing xi[d, ia-1], xi[d, ia] bit-for-bit: one-hot rows select
    # exactly at HIGHEST precision, so any mismatch is an indexing bug,
    # not rounding.
    @pytest.mark.parametrize("nbins", [5, 32, 63, 500])
    def test_bitwise_vs_direct_indexing(self, nbins):
        rng = np.random.default_rng(nbins)
        ndim, C, npg = 3, 4, 17
        xi = np.sort(rng.random((ndim, nbins + 1)), axis=1).astype(
            np.float32)
        ia = rng.integers(1, nbins + 1,
                          size=(C, npg, ndim)).astype(np.int32)
        lo, hi = V._edge_lookup(jnp.asarray(xi), jnp.asarray(ia), nbins)
        lo, hi = np.asarray(lo), np.asarray(hi)
        for d in range(ndim):
            np.testing.assert_array_equal(lo[..., d], xi[d, ia[..., d] - 1])
            np.testing.assert_array_equal(hi[..., d], xi[d, ia[..., d]])


class TestGrid:
    def test_uniform_grid_edges(self):
        xi = np.asarray(vgrid.uniform_grid(3, 10))
        assert xi.shape == (3, 11)
        np.testing.assert_allclose(xi[0], np.linspace(0, 1, 11))

    def test_rebin_uniform_weights_keep_grid(self):
        nb = 50
        xi = np.linspace(0, 1, nb + 1)
        r = np.ones(nb)
        out = vgrid.rebin_row(xi, r)
        np.testing.assert_allclose(out, xi, atol=1e-14)

    def test_rebin_concentrates_where_weight_is(self):
        nb = 100
        xi = np.linspace(0, 1, nb + 1)
        r = np.ones(nb) * 1e-12
        r[:10] = 1.0  # all the weight in [0, 0.1]
        out = vgrid.rebin_row(xi, r)
        # most new edges must land inside [0, 0.1]
        assert np.sum(out < 0.1) > nb * 0.9
        assert out[0] == 0.0 and out[-1] == 1.0
        assert np.all(np.diff(out) >= -1e-15)

    def test_rebin_matches_scalar_reference(self):
        """Cross-check the vectorised rebin against a direct loop
        implementation of the NR algorithm."""
        rng = np.random.default_rng(3)
        nb = 37
        xi = np.concatenate([[0.0], np.sort(rng.random(nb - 1)), [1.0]])
        r = rng.random(nb) + 1e-3

        def scalar_rebin(rc, nd, r, xi):
            xin = np.zeros(nd + 1)
            dr = 0.0
            k = 0
            xo = 0.0
            out = xi.copy()
            for i in range(1, nd):
                while rc > dr:
                    dr += r[k]
                    k += 1
                xo = xi[k - 1] if k > 1 else 0.0
                xn = xi[k]
                dr -= rc
                xin[i] = xn - (xn - xo) * dr / r[k - 1]
            out[1:nd] = xin[1:nd]
            out[nd] = 1.0
            return out

        want = scalar_rebin(np.sum(r) / nb, nb, r, xi)
        got = vgrid.rebin_row(xi, r)
        np.testing.assert_allclose(got, want, atol=1e-13)

    def test_smooth_and_refine_preserves_invariants(self):
        rng = np.random.default_rng(0)
        xi = np.asarray(vgrid.uniform_grid(4, 60))
        d = rng.random((4, 60))
        out = vgrid.smooth_and_refine(xi, d)
        assert out.shape == xi.shape
        np.testing.assert_allclose(out[:, 0], 0.0)
        np.testing.assert_allclose(out[:, -1], 1.0)
        assert np.all(np.diff(out, axis=1) > -1e-14)

    def test_narrow_peak_keeps_outside_resolution(self):
        """NR's TINY floor: a histogram concentrated in 3 of 500 bins
        must NOT collapse every edge into the hot zone -- zero-mass bins
        keep a floor weight so the rest of the domain retains resolution
        (a second mode found later would otherwise be unrecoverable)."""
        xi = np.asarray(vgrid.uniform_grid(1, 500))
        d = np.zeros((1, 500))
        d[0, 200:203] = 1.0
        out = vgrid.smooth_and_refine(xi, d)
        frac_outside = np.mean((out[0] < 0.39) | (out[0] > 0.42))
        assert frac_outside > 0.2, frac_outside

    def test_zero_mass_dim_keeps_grid(self):
        xi = np.asarray(vgrid.uniform_grid(2, 30))
        d = np.zeros((2, 30))
        d[0] = np.linspace(1, 2, 30)
        out = vgrid.smooth_and_refine(xi, d)
        np.testing.assert_array_equal(out[1], xi[1])
        assert not np.allclose(out[0], xi[0])


class TestVegasIntegration:
    def test_addition_3d_exact_mean(self):
        """Linear integrand: importance sampling is unbiased; tight check."""
        m = misc.addition(3)
        r = V.integrate(m, epsrel=1e-3, ncall=4e4, total_iters=10,
                        adjust_iters=5, seed=11)
        assert r.status == 0
        assert abs(r.estimate - m.true_value) / m.true_value < 5e-3

    def test_gaussian_3d_converges(self):
        g = genz.f4_gaussian(3, a=5.0)
        r = V.integrate(g, epsrel=5e-3, ncall=5e4, total_iters=12,
                        adjust_iters=8, seed=1)
        assert r.status == 0
        assert abs(r.estimate - g.true_value) / g.true_value < 2e-2
        assert r.chi_sq < 10.0

    def test_prob_uses_exact_chi2_divisor(self):
        """prob must invert chi2a with the SAME (n_acc - 0.9999) factor
        the accumulator divided by (vegasT.cuh:859) — reconstructing
        with (n_acc - 1) was systematically low and inconsistent with
        suave's exact factor."""
        from gpuintegration_tpu.utils.stats import chi2_prob
        g = genz.f4_gaussian(3, a=3.0)
        r = V.integrate(g, epsrel=0.0, epsabs=0.0, ncall=2e4, seed=5,
                        total_iters=6, adjust_iters=3, skip_iters=0)
        n_acc = r.iters          # skip_iters=0: every iteration counts
        assert n_acc >= 2
        assert r.prob == pytest.approx(
            chi2_prob(r.chi_sq * (n_acc - 0.9999), n_acc - 1), abs=1e-12)

    def test_reported_error_is_calibrated(self):
        """Pull distribution: |est - truth| should rarely exceed 3 sigma."""
        g = genz.f4_gaussian(2, a=3.0)
        pulls = []
        for seed in range(5):
            r = V.integrate(g, epsrel=1e-4, ncall=2e4, total_iters=8,
                            adjust_iters=5, seed=seed)
            pulls.append((r.estimate - g.true_value) / r.errorest)
        assert np.max(np.abs(pulls)) < 5.0

    def test_deterministic_given_seed(self):
        g = genz.f4_gaussian(2, a=3.0)
        r1 = V.integrate(g, ncall=1e4, total_iters=6, adjust_iters=4, seed=42)
        r2 = V.integrate(g, ncall=1e4, total_iters=6, adjust_iters=4, seed=42)
        assert r1.estimate == r2.estimate
        assert r1.errorest == r2.errorest

    def test_fused_frozen_phase_matches_per_iteration(self):
        """The single-dispatch frozen phase (vegas._frozen_phase) must
        reproduce the per-iteration host loop exactly (same fold_in keys,
        same accumulation order).  A debug logger forces the host loop."""
        from gpuintegration_tpu.mcubes.debug import VegasDebugLogger
        g = genz.f4_gaussian(3, a=5.0)
        kw = dict(epsrel=1e-9, epsabs=1e-300, ncall=2e4, total_iters=9,
                  adjust_iters=3, skip_iters=3, seed=13)
        fused = V.integrate(g, **kw)
        logged = V.integrate(g, debug_logger=VegasDebugLogger(), **kw)
        # identical sampling streams; accumulation differs only by XLA FMA
        # contraction in the on-device combine (observed: 1 ULP)
        assert fused.estimate == pytest.approx(logged.estimate, rel=1e-14)
        assert fused.errorest == pytest.approx(logged.errorest, rel=1e-14)
        # chi2 = (schi - si*tgral)/(it-1) is cancellation-amplified
        assert fused.chi_sq == pytest.approx(logged.chi_sq, abs=1e-6)
        assert fused.status == logged.status
        assert fused.iters == logged.iters

    def test_frozen_phase_slicing_bit_identical(self, monkeypatch):
        """Dispatch-bounded slicing of the fused frozen phase must be
        BIT-identical to one long dispatch: the carry round-trips
        through exact f64 scalars and the PRNG folds on the absolute
        iteration index (vegas._iters_per_dispatch -- the remote TPU
        worker crashes on single ~2e10-eval dispatches, so production
        ncall re-enters the while_loop in bounded slices)."""
        g = genz.f4_gaussian(3, a=5.0)
        kw = dict(epsrel=1e-9, epsabs=1e-300, ncall=2e4, total_iters=9,
                  adjust_iters=3, skip_iters=3, seed=13)
        one = V.integrate(g, **kw)
        monkeypatch.setenv("GPUINT_TPU_FROZEN_EVALS_PER_DISPATCH", "1")
        sliced = V.integrate(g, **kw)   # block=1: one iteration per slice
        assert sliced.estimate == one.estimate
        assert sliced.errorest == one.errorest
        assert sliced.chi_sq == one.chi_sq
        assert sliced.iters == one.iters and sliced.neval == one.neval
        assert sliced.status == one.status

    def test_adjust_phase_slicing_bit_identical(self, monkeypatch):
        """Same dispatch-bounding discipline for the fused
        refine='device' adjustment phase (xi round-trips f32-exactly
        between slices)."""
        g = genz.f4_gaussian(3, a=5.0)
        kw = dict(epsrel=1e-9, epsabs=1e-300, ncall=2e4, total_iters=8,
                  adjust_iters=6, skip_iters=2, seed=7,
                  refine="device", importance="grid")
        one = V.integrate(g, **kw)
        monkeypatch.setenv("GPUINT_TPU_FROZEN_EVALS_PER_DISPATCH", "1")
        sliced = V.integrate(g, **kw)
        assert sliced.estimate == one.estimate
        assert sliced.errorest == one.errorest
        assert sliced.chi_sq == one.chi_sq
        assert sliced.iters == one.iters and sliced.neval == one.neval

    def test_volume_transform(self):
        from gpuintegration_tpu.types import Volume
        s = misc.sin_sum(2, lows=[0.0, 0.0], highs=[2.0, 2.0])
        vol = Volume([0.0, 0.0], [2.0, 2.0])
        r = V.integrate(s, epsrel=1e-3, ncall=5e4, vol=vol,
                        total_iters=10, adjust_iters=6, seed=3)
        assert abs(r.estimate - s.true_value) / abs(s.true_value) < 2e-2

    def test_one_dimensional(self):
        """1-D falls out of the same implementation (the reference needs a
        dedicated vegasT1D.cuh:389-800 specialization)."""
        def f(x):
            return jnp.cos(x[..., 0])
        truth = math.sin(1.0)
        r = V.integrate(f, ndim=1, epsrel=1e-3, ncall=2e4,
                        total_iters=10, adjust_iters=6, seed=5)
        assert abs(r.estimate - truth) / truth < 1e-2

    def test_importance_sampling_beats_uniform(self):
        """The adapted grid must reduce variance on a peaked integrand."""
        # sharply peaked integrand (a=25): importance sampling matters.
        # epsrel=0 prevents early convergence so both runs count the same
        # number of iterations and sqrt(1/swgt) errors are comparable.
        g = genz.f4_gaussian(2, a=25.0)
        r_flat = V.integrate(g, epsrel=0.0, epsabs=0.0, ncall=1e5,
                             total_iters=4, adjust_iters=0, skip_iters=0,
                             seed=9)
        r_adapt = V.integrate(g, epsrel=0.0, epsabs=0.0, ncall=1e5,
                              total_iters=12, adjust_iters=8, skip_iters=8,
                              seed=9)
        assert r_adapt.errorest < r_flat.errorest


class TestEvalDtype:
    """eval_dtype=float32: integrand evaluated in f32, accumulators in f64.
    The f32 rounding is far below MC noise, so results must agree with the
    f64-eval run within combined statistical error and stay deterministic."""

    @pytest.mark.parametrize("importance", ["grid", "poly"])
    def test_converges_and_agrees_with_f64(self, importance):
        import jax.numpy as jnp
        g = genz.f4_gaussian(3, a=5.0)
        kw = dict(epsrel=5e-3, ncall=5e4, total_iters=12, adjust_iters=8,
                  seed=1, importance=importance)
        r32 = V.integrate(g, eval_dtype=jnp.float32, **kw)
        r64 = V.integrate(g, **kw)
        assert r32.status == 0
        assert abs(r32.estimate - g.true_value) / g.true_value < 2e-2
        # statistical agreement: identical streams, only f(x) rounding
        tol = 3.0 * max(r32.errorest, r64.errorest)
        assert abs(r32.estimate - r64.estimate) < max(tol, 1e-6)

    def test_deterministic(self):
        import jax.numpy as jnp
        g = genz.f4_gaussian(2, a=3.0)
        kw = dict(ncall=1e4, total_iters=6, adjust_iters=4, seed=42,
                  eval_dtype=jnp.float32)
        r1 = V.integrate(g, **kw)
        r2 = V.integrate(g, **kw)
        assert r1.estimate == r2.estimate

    def test_frozen_phase_honors_eval_dtype(self):
        """Fused frozen phase with eval_dtype must match the per-iteration
        host loop with the same eval_dtype (debug logger forces the host
        loop), exactly as the f64 equivalence test does."""
        import jax.numpy as jnp
        from gpuintegration_tpu.mcubes.debug import VegasDebugLogger
        g = genz.f4_gaussian(3, a=5.0)
        kw = dict(epsrel=1e-9, epsabs=1e-300, ncall=2e4, total_iters=9,
                  adjust_iters=4, seed=3, eval_dtype=jnp.float32)
        fused = V.integrate(g, **kw)
        host = V.integrate(g, debug_logger=VegasDebugLogger(), **kw)
        np.testing.assert_allclose(fused.estimate, host.estimate, rtol=1e-12)
        np.testing.assert_allclose(fused.errorest, host.errorest, rtol=1e-12)

    def test_sharded_accepts_eval_dtype(self, ):
        import jax
        import jax.numpy as jnp
        from gpuintegration_tpu.parallel.mesh import make_mesh
        from gpuintegration_tpu.parallel.sharded import vegas_sharded
        mesh = make_mesh(len(jax.devices()))
        g = genz.f4_gaussian(2, a=3.0)
        r = vegas_sharded(g, epsrel=5e-3, ncall=2e4, mesh=mesh,
                          total_iters=10, adjust_iters=6, seed=5,
                          eval_dtype=jnp.float32)
        assert r.status == 0
        assert abs(r.estimate - g.true_value) / g.true_value < 3e-2


class TestDeviceRefine:
    """refine='device': all adjustment iterations fused in one dispatch
    with the f32 scatter-free on-device rebin.  Same sampling streams and
    combination as the host path; only the grid's refinement precision
    differs (variance, never bias)."""

    def test_converges_and_tracks_host(self):
        g = genz.f4_gaussian(3, a=5.0)
        kw = dict(epsrel=5e-3, ncall=5e4, total_iters=12, adjust_iters=8,
                  seed=1)
        rh = V.integrate(g, refine="host", **kw)
        rd = V.integrate(g, refine="device", **kw)
        assert rd.status == 0
        assert abs(rd.estimate - g.true_value) / g.true_value < 2e-2
        assert abs(rd.estimate - rh.estimate) < 5 * max(rd.errorest,
                                                        rh.errorest)

    def test_deterministic(self):
        g = genz.f4_gaussian(2, a=3.0)
        kw = dict(ncall=1e4, total_iters=6, adjust_iters=4, seed=42,
                  refine="device")
        assert V.integrate(g, **kw).estimate == V.integrate(g, **kw).estimate

    def test_poly_device_refine_converges(self):
        """Round 5: refine='device' composes with importance='poly' --
        the Chebyshev re-fit (a fixed linear map) runs on device inside
        the fused adjustment loop, so on-device refinement is no longer
        locked to the slow grid map (VERDICT r4 weak #4)."""
        g = genz.f4_gaussian(3, a=5.0)
        kw = dict(epsrel=5e-3, ncall=5e4, total_iters=12, adjust_iters=8,
                  seed=3, importance="poly")
        rh = V.integrate(g, refine="host", **kw)
        rd = V.integrate(g, refine="device", **kw)
        assert rd.status == 0
        assert abs(rd.estimate - g.true_value) / g.true_value < 2e-2
        assert abs(rd.estimate - rh.estimate) < 5 * max(rd.errorest,
                                                        rh.errorest)

    def test_poly_device_refine_deterministic(self):
        g = genz.f4_gaussian(2, a=3.0)
        kw = dict(ncall=1e4, total_iters=6, adjust_iters=4, seed=42,
                  refine="device", importance="poly")
        assert V.integrate(g, **kw).estimate == V.integrate(g, **kw).estimate

    def test_early_convergence_during_adjustment(self):
        """Convergence reached inside the fused adjustment window stops
        the on-device while_loop: iters and neval match the host loop
        exactly (no over-refinement, no phantom evaluations)."""
        m = misc.addition(3)
        kw = dict(epsrel=5e-3, ncall=4e4, total_iters=10, adjust_iters=10,
                  seed=11)
        rh = V.integrate(m, refine="host", **kw)
        rd = V.integrate(m, refine="device", **kw)
        assert rd.status == rh.status == 0
        assert (rd.iters, rd.neval) == (rh.iters, rh.neval)
        assert abs(rd.estimate - m.true_value) / m.true_value < 5e-3


class TestStateResume:
    """VegasState continuation: resumed iterations must draw INDEPENDENT
    streams (regression: a resume restarted it=1 with the same base key,
    replaying bit-identical samples into the accumulators -- swgt doubled
    on duplicates and sd shrank sqrt(2) with zero new information)."""

    def test_resume_draws_fresh_streams(self):
        from gpuintegration_tpu.mcubes.vegas import VegasState, vegas
        from gpuintegration_tpu.mcubes import grid as vgrid
        g = genz.f4_gaussian(3, a=3.0)
        kw = dict(epsrel=0.0, epsabs=0.0, ncall=2e4, seed=9,
                  adjust_iters=0, skip_iters=0, nbins=64)
        st = VegasState(xi=vgrid.uniform_grid(3, 64))
        r1 = vegas(g, total_iters=4, state=st, **kw)
        assert st.it0 == r1.iters
        si1, swgt1 = float(np.asarray(st.si)), float(np.asarray(st.swgt))
        r2 = vegas(g, total_iters=4, state=st, **kw)
        assert st.it0 == r1.iters + r2.iters
        # replayed streams would make the resumed si increment EXACTLY
        # equal the first run's (same grid, same keys)
        d_si = float(np.asarray(st.si)) - si1
        assert d_si != pytest.approx(si1, rel=1e-12)
        # and the combined estimate stays statistically sound
        est = float(np.asarray(st.si)) / float(np.asarray(st.swgt))
        sd = (1.0 / float(np.asarray(st.swgt))) ** 0.5
        assert abs(est - g.true_value) < 6 * sd

    def test_resume_chi2_counts_all_segments(self):
        """chi2/dof on a resumed run divides by the iterations
        accumulated across ALL segments (regression: only the current
        segment's count was used, inflating chi2 ~2x after one resume;
        a no-accumulation segment even hit a negative denominator)."""
        from gpuintegration_tpu.mcubes.vegas import VegasState, vegas
        from gpuintegration_tpu.mcubes import grid as vgrid
        g = genz.f4_gaussian(3, a=3.0)
        kw = dict(epsrel=0.0, epsabs=0.0, ncall=2e4, seed=9,
                  adjust_iters=0, skip_iters=0, nbins=64)
        st = VegasState(xi=vgrid.uniform_grid(3, 64))
        vegas(g, total_iters=4, state=st, **kw)
        r2 = vegas(g, total_iters=4, state=st, **kw)
        assert st.n_acc == 8
        # independent chi2 over all 8 accumulated iterations (NR
        # divisor: n_accumulated - 0.9999) from the state's accumulators
        si, swgt, schi = (float(np.asarray(v))
                          for v in (st.si, st.swgt, st.schi))
        expect = max((schi - si * (si / swgt)) / (8 - 0.9999), 0.0)
        assert r2.chi_sq == pytest.approx(expect, rel=1e-10), (
            r2.chi_sq, expect)

    def test_resume_with_device_refine_carries_accumulators(self):
        """A resumed refine='device' run must seed the fused adjustment
        phase with the state's accumulators (regression: they were
        zero-initialised inside the dispatch, silently discarding the
        prior segment's si/swgt/schi)."""
        from gpuintegration_tpu.mcubes.vegas import VegasState, vegas
        from gpuintegration_tpu.mcubes import grid as vgrid
        g = genz.f4_gaussian(3, a=3.0)
        kw = dict(epsrel=0.0, epsabs=0.0, ncall=2e4, seed=9,
                  adjust_iters=4, skip_iters=0, total_iters=4, nbins=64,
                  refine="device", importance="grid")
        st = VegasState(xi=vgrid.uniform_grid(3, 64))
        vegas(g, state=st, **kw)
        si1 = float(np.asarray(st.si))
        vegas(g, state=st, **kw)
        # both segments' positive contributions present (~2x one segment)
        assert float(np.asarray(st.si)) > 1.5 * si1
        assert st.n_acc == 8

    def test_resume_deterministic(self):
        from gpuintegration_tpu.mcubes.vegas import VegasState, vegas
        from gpuintegration_tpu.mcubes import grid as vgrid
        g = genz.f4_gaussian(2, a=3.0)

        def run_two_segments():
            st = VegasState(xi=vgrid.uniform_grid(2, 64))
            kw = dict(epsrel=0.0, epsabs=0.0, ncall=1e4, seed=5,
                      adjust_iters=0, skip_iters=0, total_iters=3,
                      nbins=64)
            vegas(g, state=st, **kw)
            vegas(g, state=st, **kw)
            return float(np.asarray(st.si)), float(np.asarray(st.swgt))

        assert run_two_segments() == run_two_segments()


class TestHugeMagnitudeHistogram:
    def test_no_nan_from_f32_histogram_overflow(self):
        """f2-10D class regression: per-sample f^2 past f32 max used to
        cast to inf and meet one-hot ZEROS inside the histogram matmul
        (inf*0 = NaN), poisoning the grid and the estimate (the first
        mcubes_ladders_10d f2 row was NaN).  The per-sample clamp +
        saturating accumulation (vegas._HIST_CAP) and the f64 sanitize
        in grid.smooth_and_refine must keep everything finite on BOTH
        importance paths."""
        def big(x):
            return (1e25 * jnp.exp(-50.0 * jnp.sum((x - 0.5) ** 2,
                                                   axis=-1)) + 1e22)
        big.ndim = 4
        for imp in ("grid", "poly"):
            r = V.vegas(big, epsrel=1e-2, epsabs=0.0, ncall=2e4, ndim=4,
                        total_iters=8, adjust_iters=5, seed=3,
                        importance=imp)
            assert np.isfinite(r.estimate), imp
            assert np.isfinite(r.errorest), imp
            assert r.estimate > 1e22, (imp, r.estimate)

    def test_smooth_and_refine_sanitizes_saturated_hist(self):
        xi = np.asarray(vgrid.uniform_grid(2, 16))
        d = np.full((2, 16), np.float32(3.0e37))
        d[0, 3] = np.inf                    # saturated accumulator relic
        out = vgrid.smooth_and_refine(xi, d)
        assert np.isfinite(out).all()
        assert (np.diff(out, axis=1) > 0).all()


class TestDispatchSplit:
    """An adjust/frozen-host iteration whose calls x eval_cost exceed
    GPUINT_TPU_FROZEN_EVALS_PER_DISPATCH is sliced into several
    dispatch-bounded kernel calls (the escalated-ncall crash fix).
    Per-chunk PRNG streams key on the GLOBAL chunk id, so the split
    changes only accumulator reassociation, never the samples."""

    def test_split_matches_single_dispatch(self, monkeypatch):
        import math

        from gpuintegration_tpu.mcubes import vegas as V
        from gpuintegration_tpu.models import genz

        g = genz.f2_product_peak(3)
        kw = dict(epsrel=1e-2, epsabs=1e-40, ncall=4e4, total_iters=6,
                  adjust_iters=3, skip_iters=1, seed=11, sampler="xla")
        monkeypatch.delenv("GPUINT_TPU_FROZEN_EVALS_PER_DISPATCH",
                           raising=False)
        r_one = V.integrate(g, **kw)
        # force ~8-way splitting of every iteration
        monkeypatch.setenv("GPUINT_TPU_FROZEN_EVALS_PER_DISPATCH", "5000")
        r_split = V.integrate(g, **kw)
        assert r_split.iters == r_one.iters
        assert r_split.neval == r_one.neval
        # identical streams; only f64/f32 reassociation differs, and the
        # f32 histogram difference feeds the grid so later iterations
        # drift at roundoff scale, not at sample scale
        assert math.isclose(r_split.estimate, r_one.estimate,
                            rel_tol=1e-6)
        assert math.isclose(r_split.errorest, r_one.errorest,
                            rel_tol=1e-4, abs_tol=1e-30)

    def test_split_matches_poly_path(self, monkeypatch):
        import math

        from gpuintegration_tpu.mcubes import vegas as V
        from gpuintegration_tpu.models import genz

        g = genz.f4_gaussian(3)
        kw = dict(epsrel=1e-2, epsabs=1e-40, ncall=4e4, total_iters=5,
                  adjust_iters=3, skip_iters=1, seed=7,
                  importance="poly", sampler="xla")
        monkeypatch.delenv("GPUINT_TPU_FROZEN_EVALS_PER_DISPATCH",
                           raising=False)
        r_one = V.integrate(g, **kw)
        monkeypatch.setenv("GPUINT_TPU_FROZEN_EVALS_PER_DISPATCH", "5000")
        r_split = V.integrate(g, **kw)
        assert r_split.iters == r_one.iters
        assert math.isclose(r_split.estimate, r_one.estimate,
                            rel_tol=1e-6)


    def test_chunk_ranges_partition(self, monkeypatch):
        from gpuintegration_tpu.mcubes.vegas import _chunk_ranges

        monkeypatch.setenv("GPUINT_TPU_FROZEN_EVALS_PER_DISPATCH", "1e9")
        assert _chunk_ranges(7, 5e8) == [(0, 7)]           # under budget
        for nc, calls, cost in [(7, 8e9, 1.0), (1, 8e9, 1.0),
                                (4000, 8e9, 1.0), (5, 4e9, 7.3),
                                (3, 1e12, 1.0)]:
            rs = _chunk_ranges(nc, calls, cost)
            # exact disjoint cover of [0, nc)
            assert rs[0][0] == 0
            assert sum(n for _, n in rs) == nc
            assert all(rs[i][0] + rs[i][1] == rs[i + 1][0]
                       for i in range(len(rs) - 1))
            assert all(n >= 1 for _, n in rs)
            # at most two distinct lengths (compile-shape bound)
            assert len({n for _, n in rs}) <= 2


class TestF1WallLaw:
    """The f1 10D statistical-wall law (docs/results/run_f1_10d_wall.py)
    rests on closed-form moments of cos(sum i*x_i); pin them against the
    integrand registry so the law can't silently drift from the truth
    machinery."""

    def test_analytic_moments_match_registry(self):
        import cmath

        from gpuintegration_tpu.models import genz

        a = np.arange(1, 11, dtype=np.float64)
        ef = np.prod([(cmath.exp(1j * ai) - 1) / (1j * ai)
                      for ai in a]).real
        ef2 = 0.5 + 0.5 * np.prod(
            [(cmath.exp(2j * ai) - 1) / (2j * ai) for ai in a]).real
        g = genz.f1_oscillatory(10)
        assert abs(ef - g.true_value) <= 1e-18 + 1e-12 * abs(ef)
        var = ef2 - ef * ef
        assert abs(var - 0.5) < 1e-10          # cancellation: Var ~ 1/2
        # optimal-importance Cauchy-Schwarz floor (E|f|)^2 - I^2 stays
        # O(0.4): the wall is 1e5x-class above the escalation cap
        floor = (2.0 / np.pi) ** 2 - ef * ef
        n_floor = floor / (1e-3 * abs(ef)) ** 2
        assert n_floor > 1e4 * 8e9 * 100

