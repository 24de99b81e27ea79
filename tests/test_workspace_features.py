"""Workspace feature tests: one-shot rule API, feval capture,
predict-split snapshotting, VEGAS-assisted hybrid, max-iteration exits.
"""
import io
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu import Workspace, Volume
from gpuintegration_tpu.models import genz
from gpuintegration_tpu.ops.genz_malik import feval_per_region
from gpuintegration_tpu.pagani import oneshot, region_pool


class TestOneShot:
    def test_constant_integrand_exact(self):
        """One rule application on a constant: exact estimate, zero error
        (reference: RegionSampling.cu:47+)."""
        lows, lengths, n = region_pool.uniform_split(3, 2, 8)

        def f(x, y, z):
            return 1.0 + 0.0 * x

        res, est, err, sdim = oneshot.apply_cubature_rules(f, lows, lengths)
        assert res.estimate == pytest.approx(1.0, abs=1e-13)
        assert res.errorest == pytest.approx(0.0, abs=1e-12)
        np.testing.assert_allclose(np.asarray(est), 0.125, atol=1e-14)

    def test_signed_constant(self):
        lows, lengths, n = region_pool.uniform_split(2, 2, 4)

        def f(x, y):
            return -3.0 + 0.0 * x

        res, est, err, _ = oneshot.apply_cubature_rules(f, lows, lengths)
        assert res.estimate == pytest.approx(-3.0, abs=1e-13)

    def test_compute_error_false(self):
        lows, lengths, _ = region_pool.uniform_split(2, 2, 4)
        res, *_ = oneshot.apply_cubature_rules(
            lambda x, y: x * y, lows, lengths, compute_error=False)
        assert math.isinf(res.errorest)

    def test_neval_accounting(self):
        lows, lengths, _ = region_pool.uniform_split(4, 2, 16)
        res, *_ = oneshot.apply_cubature_rules(
            lambda x, y, z, w: x, lows, lengths)
        assert res.neval == 16 * feval_per_region(4)


class TestFuncEvalCapture:
    def test_capture_points_and_values(self):
        lows = np.array([[0.0, 0.0], [0.5, 0.5]])
        lengths = np.array([[0.5, 0.5], [0.5, 0.5]])

        def f(x, y):
            return x + 10.0 * y

        fev = oneshot.capture_func_evals(f, lows, lengths)
        assert fev.points.shape == (2, feval_per_region(2), 2)
        # center point of region 0 is (0.25, 0.25)
        np.testing.assert_allclose(fev.points[0, 0], [0.25, 0.25])
        np.testing.assert_allclose(fev.values[0, 0], 0.25 + 2.5)
        # all points inside their region
        for r in range(2):
            lo = lows[r]
            hi = lo + lengths[r]
            assert (fev.points[r] >= lo - 1e-12).all()
            assert (fev.points[r] <= hi + 1e-12).all()

    def test_csv_dump(self):
        lows = np.array([[0.0, 0.0]])
        lengths = np.array([[1.0, 1.0]])
        fev = oneshot.capture_func_evals(lambda x, y: x, lows, lengths)
        buf = io.StringIO()
        fev.to_csv(buf)
        lines = buf.getvalue().strip().splitlines()
        assert len(lines) == 1 + feval_per_region(2)
        assert lines[0].startswith("reg,fid,")

    def test_region_cap(self):
        lows = np.zeros((2000, 2))
        lengths = np.ones((2000, 2))
        with pytest.raises(ValueError):
            oneshot.capture_func_evals(lambda x, y: x, lows, lengths)


class TestPredictSplit:
    def test_snapshot_taken(self):
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        ws.integrate(g, epsrel=1e-14, epsabs=1e-300, predict_split=True,
                     max_iterations=17, partitions_per_axis=2)
        assert hasattr(ws, "last_snapshot")
        lows, lengths, n, blocked = ws.last_snapshot
        assert lows.shape[0] == 3 and n > 0  # dims-major pool
        assert blocked  # post-split pools use the blocked half layout


class TestVegasAssisted:
    def test_hybrid_converges_statistically(self):
        g = genz.f4_gaussian(2, a=5.0)
        ws = Workspace(2, chunk_size=1024)
        r = ws.integrate(g, epsrel=5e-3, epsabs=1e-40, vegas_assisted=True,
                         max_iterations=8, vegas_passes=4,
                         vegas_samples_per_pass=256, seed=3)
        # MC error bars: within 5 combined sigma of truth
        assert abs(r.estimate - g.true_value) < 5 * max(r.errorest, 1e-6)

    def test_huge_magnitude_keeps_adaptation(self):
        """Round-5 advisor fix: per-region max-NORMALIZED f^2 histograms
        keep grid adaptation exact for |f|~1e22 integrands (raw f^2
        overflows f32 to inf and one-hot inf*0 NaN-poisoned the grids;
        a raw clamp saturates every bin -> uniform grids -> pool
        explosion, measured on TPU).  The scaled run must match the
        unit-scale run's estimate exactly up to the factor (identical
        streams, scale-invariant rebin)."""
        g = genz.f4_gaussian(2, a=5.0)
        scale = 2.0 ** 73          # ~9.4e21; a power of two scales f64
                                   # EXACTLY, so the normalized
                                   # histograms (and hence grids and
                                   # streams) are bit-identical

        def gs(x, y):
            return scale * g(jnp.stack([x, y], axis=-1))

        kw = dict(epsrel=5e-3, epsabs=1e-40, vegas_assisted=True,
                  max_iterations=8, vegas_passes=4,
                  vegas_samples_per_pass=256, seed=3)
        r1 = Workspace(2, chunk_size=1024).integrate(g, **kw)
        r2 = Workspace(2, chunk_size=1024).integrate(gs, **kw)
        assert math.isfinite(r2.estimate) and r2.estimate != 0.0
        assert r2.estimate / scale == pytest.approx(r1.estimate,
                                                    rel=1e-12)
        assert r2.errorest / scale == pytest.approx(r1.errorest,
                                                    rel=1e-9)


class TestMaxIterExit:
    def test_estimate_complete_on_nonconvergence(self):
        """Even when max_iterations exhausts, the returned estimate must
        include the in-flight active regions (deviation from the
        reference, which drops them at its 700-iteration exit)."""
        g = genz.f4_gaussian(3, a=5.0)
        ws = Workspace(3, chunk_size=1024)
        r = ws.integrate(g, epsrel=1e-12, epsabs=1e-300, max_iterations=3)
        assert r.status == 1
        assert abs(r.estimate - g.true_value) / g.true_value < 1e-2


class TestF32AndPallasBackend:
    def test_f32_workspace_converges(self):
        import math
        g = genz.f4_gaussian(3, a=5.0)
        ws = Workspace(3, dtype=jnp.float32, chunk_size=1024)
        r = ws.integrate(g, epsrel=1e-4, epsabs=1e-30)
        assert r.status == 0
        assert abs(r.estimate - g.true_value) / g.true_value < 1e-4

    def test_pallas_backend_matches_xla(self):
        def g3(x, y, z):
            return jnp.exp(-25.0 * ((x - .5) ** 2 + (y - .5) ** 2
                                    + (z - .5) ** 2))
        r_x = Workspace(3, dtype=jnp.float32, chunk_size=1024).integrate(
            g3, epsrel=1e-4, epsabs=1e-30)
        r_p = Workspace(3, dtype=jnp.float32, chunk_size=1024,
                        rule_backend="pallas").integrate(
            g3, epsrel=1e-4, epsabs=1e-30)
        assert r_p.status == 0
        assert abs(r_p.estimate - r_x.estimate) < 1e-5 * abs(r_x.estimate)

    def test_pallas_backend_needs_f32(self):
        import pytest as _pytest
        with _pytest.raises(ValueError):
            Workspace(3, rule_backend="pallas")

    def test_pallas_backend_needs_per_axis_integrand(self):
        import pytest as _pytest
        ws = Workspace(3, dtype=jnp.float32, rule_backend="pallas",
                       chunk_size=1024)
        with _pytest.raises(ValueError):
            ws.integrate(lambda x: x[..., 0], epsrel=1e-3)


class TestVectorIntegrands:
    def test_vector_rule_application(self):
        """Three components integrated in one sweep: 1, x0, x0*x1."""
        lows, lengths, n = region_pool.uniform_split(2, 2, 4)

        def f(x):
            return jnp.stack([jnp.ones(x.shape[:-1]), x[..., 0],
                              x[..., 0] * x[..., 1]], axis=-1)

        est, per_region = oneshot.apply_cubature_rules_vector(
            f, lows, lengths, ndim=2, ncomp=3)
        np.testing.assert_allclose(est, [1.0, 0.5, 0.25], atol=1e-13)
        assert per_region.shape == (4, 3)

    def test_bad_shape_raises(self):
        lows, lengths, _ = region_pool.uniform_split(2, 2, 4)
        with pytest.raises(ValueError):
            oneshot.apply_cubature_rules_vector(
                lambda x: x[..., 0], lows, lengths, ndim=2, ncomp=3)


class TestSuave:
    """The real Suave (subregion-adaptive importance MC with sample
    reuse and fluctuation splits), validated against closed forms."""

    def test_suave_sign_changing_integrand(self):
        """Child seeding must apportion by SIGNED half mass: |.|-mass
        apportionment seeds the wrong sign when the integrand changes
        sign inside a split region (regression)."""
        from gpuintegration_tpu.pagani.suave import suave

        def f(x, y):
            # int over [0,1]^2 of sin(2 pi x) * (1 + 4(y-1/2)^2) has
            # truth 0 by x-antisymmetry; per-half-x masses are +/- and
            # large, so |.|-seeding biases children visibly
            return jnp.sin(2 * jnp.pi * x) * (1.0 + 4.0 * (y - 0.5) ** 2)

        r = suave(f, epsrel=1e30, epsabs=2e-4, nnew=1024, seed=4,
                  max_cycles=24)
        assert abs(r.estimate) < 6 * max(r.errorest, 1e-5), (
            r.estimate, r.errorest)

    def test_suave_converges(self):
        from gpuintegration_tpu.pagani.suave import suave
        g = genz.f4_gaussian(2, a=5.0)
        r = suave(g, epsrel=5e-3, epsabs=1e-40, nnew=512, seed=2)
        assert r.status == 0
        assert abs(r.estimate - g.true_value) < 5 * max(r.errorest, 1e-5)
        assert r.nregions > 1          # it actually subdivided
        assert r.neval > 0 and r.iters > 0
        # inter-cycle chi2 probability (cubacpp/CUBA prob surface): the
        # cycle estimates of a smooth Gaussian must be self-consistent
        assert 0.0 <= r.prob < 0.999
        if r.iters >= 2:
            from gpuintegration_tpu.utils.stats import chi2_prob
            dof = r.iters - 1
            assert r.prob == pytest.approx(
                chi2_prob(r.chi_sq * (r.iters - 0.9999), dof), abs=1e-6)

    def test_suave_subdivision_beats_single_region(self):
        """A peaked 3D integrand: the subdivision + per-region grids must
        reach an accuracy a single-region run with the SAME sample
        budget cannot (the defining Suave capability)."""
        from gpuintegration_tpu.pagani.suave import suave
        g = genz.f2_product_peak(3)
        r = suave(g, epsrel=1e-3, epsabs=1e-40, nnew=1024, seed=3,
                  max_cycles=24)
        rel = abs(r.estimate - g.true_value) / g.true_value
        assert rel < 1e-2, (r.estimate, g.true_value, rel)
        # reported error is honest (covers the actual deviation)
        assert abs(r.estimate - g.true_value) < 6 * r.errorest

    def test_suave_fluctuation_split_targets_peaked_dim(self):
        """An integrand peaked ONLY along axis 0 must drive most splits
        into that axis (fluctuation criterion)."""
        import jax.numpy as jnp
        from gpuintegration_tpu.pagani.suave import suave

        def ridge(x0, x1):
            return 1.0 / (1e-3 + (x0 - 0.3) ** 2) + 0.0 * x1
        r = suave(ridge, epsrel=1e-4, epsabs=1e-40, nnew=1024, seed=1,
                  max_cycles=12)
        truth = float(jnp.arctan(0.7 / jnp.sqrt(1e-3))
                      + jnp.arctan(0.3 / jnp.sqrt(1e-3))) / (1e-3 ** 0.5)
        assert abs(r.estimate - truth) / truth < 1e-2


class TestFusedAdaptivePhase:
    """pagani.fused_loop runs whole iterations on device; it must agree
    with the host loop iteration-for-iteration (same neval/iters/status,
    estimates to reassociation-level roundoff)."""

    def _compare(self, g, ndim, eps, **kw):
        ws = Workspace(ndim, chunk_size=1024)
        rh = ws.integrate(g, epsrel=eps, epsabs=1e-40, fused=False, **kw)
        rf = ws.integrate(g, epsrel=eps, epsabs=1e-40, fused=True, **kw)
        assert (rh.status, rh.iters, rh.neval, rh.nregions) == \
               (rf.status, rf.iters, rf.neval, rf.nregions)
        assert abs(rh.estimate - rf.estimate) <= 1e-12 * abs(rh.estimate)
        assert abs(rh.errorest - rf.errorest) <= \
            1e-9 * max(abs(rh.errorest), 1e-300)
        return rh, rf

    def test_equivalence_3d(self):
        self._compare(genz.f4_gaussian(3, a=5.0), 3, 1e-6)

    def test_equivalence_with_bucket_growth(self):
        self._compare(genz.f2_product_peak(4), 4, 1e-6)

    def test_equivalence_under_dispatch_eval_cap(self, monkeypatch):
        """Bursts capped at the per-dispatch eval ceiling (the remote
        worker crashes past ~2e10 evals in one dispatch, DESIGN.md 3b)
        exit with the gate-crossing status and the host resumes; the
        trajectory must stay identical to the host loop even when the
        cap forces an exit after every single burst iteration."""
        monkeypatch.setenv("GPUINT_TPU_FUSED_EVALS_PER_DISPATCH", "1")
        self._compare(genz.f4_gaussian(3, a=5.0), 3, 1e-6)

    def test_maxiter_exit_and_checkpoint(self):
        """Fused and host max-iteration exits agree on the result; both
        checkpoints resume to the truth.  (The snapshots themselves differ
        by one split: the host saves the last-evaluated pool with its
        sweep excluded from the ledger, the fused phase the just-split
        children with the full ledger -- both are consistent.)"""
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        rh = ws.integrate(g, epsrel=1e-12, epsabs=1e-300,
                          max_iterations=6, fused=False)
        ch = ws.make_checkpoint()
        rf = ws.integrate(g, epsrel=1e-12, epsabs=1e-300,
                          max_iterations=6, fused=True)
        cf = ws.make_checkpoint()
        assert rh.status == rf.status == 1
        assert (rh.iters, rh.neval) == (rf.iters, rf.neval)
        assert abs(rh.estimate - rf.estimate) <= 1e-12 * abs(rh.estimate)
        for c in (ch, cf):
            r2 = ws.integrate(g, epsrel=1e-7, epsabs=1e-40,
                              initial_regions=(c.lows, c.lengths))
            total = c.estimate + r2.estimate
            assert r2.status == 0
            assert abs(total - g.true_value) <= max(
                c.errorest + r2.errorest, 1e-6 * abs(g.true_value))

    def test_zero_integrand_epsabs(self):
        from gpuintegration_tpu import Workspace as W
        r = W(3, chunk_size=1024).integrate(
            lambda a, b, c: a * 0.0, epsrel=1e-6, epsabs=1e-12, fused=True)
        assert r.status == 0 and r.estimate == 0.0

    def test_constant_integrand_scalar_return(self):
        """A true Python-constant return (rank 0 under trace) must
        integrate, not trip ncomp deduction (verify-recipe probe)."""
        from gpuintegration_tpu import Workspace as W
        r = W(3, chunk_size=1024).integrate(
            lambda a, b, c: 0.0, epsrel=1e-6, epsabs=1e-12)
        assert r.status == 0 and r.estimate == 0.0
        r2 = W(2, chunk_size=1024).integrate(
            lambda a, b: 2.0, epsrel=1e-6)
        assert r2.status == 0 and abs(r2.estimate - 2.0) < 1e-12

    def test_f32_workspace_fused_matches_host(self):
        """f32 pools: the fused ledger runs in f64 like the host's Python
        floats (and epsabs must not be truncated to f32, where 1e-40
        underflows to 0)."""
        g = genz.f4_gaussian(3, a=5.0)
        ws = Workspace(3, dtype=jnp.float32, chunk_size=1024)
        rh = ws.integrate(g, epsrel=1e-4, epsabs=1e-30, fused=False)
        rf = ws.integrate(g, epsrel=1e-4, epsabs=1e-30, fused=True)
        assert (rh.status, rh.iters, rh.neval) == \
               (rf.status, rf.iters, rf.neval)
        assert abs(rh.estimate - rf.estimate) <= 1e-6 * abs(rh.estimate)

    def test_pallas_backend_fused_matches_host(self):
        """The f32 Pallas kernel serves the fused while_loop body
        (fused_loop.eval_pool): fused and host trajectories must agree
        iteration-for-iteration just like the XLA backend's."""
        def g3(x, y, z):
            return jnp.exp(-25.0 * ((x - .5) ** 2 + (y - .5) ** 2
                                    + (z - .5) ** 2))
        ws = Workspace(3, dtype=jnp.float32, chunk_size=1024,
                       rule_backend="pallas")
        rh = ws.integrate(g3, epsrel=1e-4, epsabs=1e-30, fused=False)
        rf = ws.integrate(g3, epsrel=1e-4, epsabs=1e-30, fused=True)
        assert rf.status == 0
        assert (rh.status, rh.iters, rh.neval, rh.nregions) == \
               (rf.status, rf.iters, rf.neval, rf.nregions)
        assert abs(rh.estimate - rf.estimate) <= 1e-6 * abs(rh.estimate)


class TestNanIntegral:
    """A NaN-returning integrand must terminate with status != 0 and must
    not report a bogus converged result (reference:
    test/cuda/pagani/NanIntegral.cu:25)."""

    def test_nan_never_reports_success(self):
        def nanf(x, y, z):
            return jnp.where(x > 0.5, jnp.nan, 1.0)

        # small pool budget: NaN errors keep every region active, so the
        # pool doubles every iteration -- bound the test's growth
        ws = Workspace(3, chunk_size=1024, max_pool_regions=1 << 15)
        r = ws.integrate(nanf, epsrel=1e-6, epsabs=1e-40,
                         max_iterations=12)
        assert r.status == 1

    def test_nan_fused_and_host_agree(self):
        def nanf(x, y, z):
            return jnp.where(x > 0.5, jnp.nan, 1.0)

        ws = Workspace(3, chunk_size=1024, max_pool_regions=1 << 15)
        rh = ws.integrate(nanf, epsrel=1e-6, epsabs=1e-40,
                          max_iterations=8, fused=False)
        rf = ws.integrate(nanf, epsrel=1e-6, epsabs=1e-40,
                          max_iterations=8, fused=True)
        assert rh.status == 1 and rf.status == 1


class TestAccuracyImprovesWithEpsrel:
    """Tighter epsrel must give (weakly) smaller achieved error
    (reference: test/cuda/pagani/accuracy_improves_with_epsrel.cu:38)."""

    def test_monotone_errorest(self):
        g = genz.f4_gaussian(3, a=5.0)
        ws = Workspace(3, chunk_size=1024)
        errs, errorests = [], []
        for eps in (1e-3, 1e-4, 1e-5, 1e-6):
            r = ws.integrate(g, epsrel=eps, epsabs=1e-40)
            assert r.status == 0
            errs.append(abs(r.estimate - g.true_value))
            errorests.append(r.errorest)
        # certified errors shrink strictly; achieved errors never grow
        # beyond the certified band
        assert all(b <= a for a, b in zip(errorests, errorests[1:]))
        for e, c in zip(errs, errorests):
            assert e <= max(c, 1e-15)


class TestContinuation:
    """Checkpoint-resume continuation (integrate_to_convergence) and the
    ledger= seed of integrate()."""

    def test_ledger_seeded_resume_reaches_truth(self):
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        r1 = ws.integrate(g, epsrel=1e-9, epsabs=1e-40, max_iterations=5)
        assert r1.status == 1
        ck = ws.make_checkpoint()
        assert ck.neval > 0
        r2 = ws.integrate(g, epsrel=1e-7, epsabs=1e-40,
                          initial_regions=(ck.lows, ck.lengths),
                          ledger=ck.ledger)
        # seeded ledger: r2 IS the total (no post-hoc composition needed)
        assert r2.status == 0
        assert abs(r2.estimate - g.true_value) <= max(
            r2.errorest, 1e-6 * abs(g.true_value))
        assert r2.iters > r1.iters and r2.neval > r1.neval

    def test_integrate_to_convergence_rounds(self):
        """Rounds with a tiny per-round iteration budget must stitch into
        a converged run: the continuation driver grants fresh budgets and
        the seeded ledger keeps the accuracy test honest."""
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        r = ws.integrate_to_convergence(g, epsrel=1e-7, epsabs=1e-40,
                                        max_iterations=4)
        assert r.status == 0
        assert r.iters > 4          # needed more than one round
        assert abs(r.estimate - g.true_value) <= max(
            r.errorest, 1e-6 * abs(g.true_value))

    def test_no_progress_guard_terminates(self):
        """A budget too small for the tolerance must stop after the
        no-progress guard, not loop forever."""
        g = genz.f2_product_peak(3)
        ws = Workspace(3, max_pool_regions=1024, chunk_size=256)
        r = ws.integrate_to_convergence(g, epsrel=1e-9, epsabs=1e-40,
                                        max_rounds=50)
        assert r.status == 1

    def test_partitioned_continuation_certifies(self):
        """A pool cap too small for a single run (split-starved resume)
        must flow into the partitioned continuation and come back with
        an honest certificate that covers the true value -- the flagship
        8D mechanism at CPU scale (4D sharp Gaussian, 4k-region cap)."""
        g = genz.f4_gaussian(4, a=15.0)
        ws = Workspace(4, max_pool_regions=4096, chunk_size=128)
        r1 = ws.integrate(g, epsrel=1e-6, epsabs=1e-40)
        assert r1.status == 1          # single round walls at the cap
        r = ws.integrate_to_convergence(g, epsrel=1e-6, epsabs=1e-40)
        assert r.status == 0
        cert = r.errorest / abs(r.estimate)
        assert 0 < cert <= 1e-6
        rel = abs(r.estimate - g.true_value) / abs(g.true_value)
        assert rel <= max(cert, 1e-7), (rel, cert)

    def test_continuation_state_roundtrip(self, tmp_path):
        """ContinuationState must round-trip the live queue exactly
        (region blocks, stored sums, depth/exact flags, queue order)."""
        from gpuintegration_tpu.utils.checkpoint import ContinuationState
        rng = np.random.default_rng(3)
        work = [
            (rng.random((5, 3)), rng.random((5, 3)), 1.5, 0.25, 0, True),
            (rng.random((2, 3)), rng.random((2, 3)), -0.5, 0.125, 2,
             False),
        ]
        st = ContinuationState.from_queue(
            work, 2.0, 0.5, 7, 1000, 64, 60, False, 1e-6, 1e-40)
        st.save(str(tmp_path / "st"))
        st2 = ContinuationState.load(str(tmp_path / "st"))
        back = st2.to_queue()
        assert len(back) == 2 and not st2.vec
        for (a, b) in zip(work, back):
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_array_equal(a[1], b[1])
            assert a[2] == b[2] and a[3] == b[3]
            assert a[4] == b[4] and a[5] == b[5]
        assert st2.iters == 7 and st2.neval == 1000
        assert st2.nregions == 64 and st2.nfinished == 60
        # vector queue: (ncomp,) sums survive
        workv = [(rng.random((4, 2)), rng.random((4, 2)),
                  np.array([1.0, 2.0]), np.array([0.1, 0.2]), 1, True)]
        stv = ContinuationState.from_queue(
            workv, np.array([3.0, 4.0]), np.array([0.3, 0.4]),
            1, 10, 8, 8, True, 1e-5, 1e-40)
        stv.save(str(tmp_path / "stv"))
        b = ContinuationState.load(str(tmp_path / "stv")).to_queue()[0]
        np.testing.assert_array_equal(b[2], workv[0][2])
        np.testing.assert_array_equal(b[3], workv[0][3])

    def test_state_path_interrupt_resume_bit_identical(self, tmp_path):
        """A continuation interrupted at a deadline and resumed from its
        disk state must certify the IDENTICAL result as an uninterrupted
        run: the saved queue/banked ledger pin the whole remaining
        trajectory (integral additivity + deterministic slice runs)."""
        import time as _time
        g = genz.f4_gaussian(4, a=15.0)
        sp = str(tmp_path / "cont_state")
        ws = Workspace(4, max_pool_regions=4096, chunk_size=128)
        r1 = ws.integrate(g, epsrel=1e-6, epsabs=1e-40)
        assert r1.status == 1
        ckpt = ws.make_checkpoint()
        ws.final_pool = None
        ws.final_pool_errors = None
        assert 4 * ckpt.lows.shape[0] > ws.max_pool_regions  # starved
        # interrupted leg: deadline already passed -> saves the queue
        # untouched and returns the stored-sum composition
        r_cut = ws._partitioned_continuation(
            g, 1e-6, 1e-40, None, ckpt, r1, 15,
            deadline=_time.monotonic() - 1.0, state_path=sp)
        assert r_cut.status == 1
        import os
        assert os.path.exists(sp + ".npz")
        # resume through the PUBLIC path; compare against the same ckpt
        # run uninterrupted
        r_resumed = ws.integrate_to_convergence(
            g, epsrel=1e-6, epsabs=1e-40, state_path=sp)
        ws2 = Workspace(4, max_pool_regions=4096, chunk_size=128)
        r_full = ws2._partitioned_continuation(
            g, 1e-6, 1e-40, None, ckpt, r1, 15)
        assert r_resumed.status == 0 == r_full.status
        assert r_resumed.estimate == r_full.estimate
        assert r_resumed.errorest == r_full.errorest
        assert r_resumed.nregions == r_full.nregions
        assert r_resumed.neval == r_full.neval
        # certified: the state file is spent
        assert not os.path.exists(sp + ".npz")
        rel = abs(r_resumed.estimate - g.true_value) / abs(g.true_value)
        assert rel <= max(r_resumed.errorest / abs(r_resumed.estimate),
                          1e-7)

    def test_state_path_saves_from_whole_pool_exit(self, tmp_path):
        """A deadline exit BEFORE split starvation (whole-pool phase)
        must also persist a resumable state, and resuming must certify."""
        import os
        g = genz.f4_gaussian(4, a=15.0)
        sp = str(tmp_path / "wp_state")
        ws = Workspace(4, max_pool_regions=1 << 15, chunk_size=128)
        # iteration-starved first leg: exits in the whole-pool phase
        # (pool NOT split-starved) with survivors -> state must be saved
        r = ws.integrate_to_convergence(
            g, epsrel=1e-6, epsabs=1e-40, max_rounds=2, max_iterations=6,
            state_path=sp)
        assert r.status == 1
        assert os.path.exists(sp + ".npz")
        # resume with full budgets: certifies through the queue
        r = ws.integrate_to_convergence(
            g, epsrel=1e-6, epsabs=1e-40, state_path=sp)
        assert r.status == 0
        assert not os.path.exists(sp + ".npz")
        rel = abs(r.estimate - g.true_value) / abs(g.true_value)
        assert rel <= max(r.errorest / abs(r.estimate), 1e-7)

    def test_errorest_never_negative(self):
        """The classifier's banked error must be the EXACT refined-error
        sum of dropped regions.  The reference's extra_f_errorest
        (heuristic_classifier.cuh:317-324) double-subtracts
        relative-finished regions above the threshold -- reproducing it
        produced a NEGATIVE cumulative errorest on this exact config."""
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, max_pool_regions=4096, chunk_size=512)
        r = ws.integrate(g, epsrel=1e-6, epsabs=1e-40)
        assert r.status == 0
        assert r.errorest > 0

    def test_continuation_checkpoint_stash(self):
        """Wall exits stash per-region (est, refined) and the checkpoint
        surfaces them in pool order for the continuation's error sort."""
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        ws.integrate(g, epsrel=1e-9, epsabs=1e-40, max_iterations=5,
                     fused=False)
        ck = ws.make_checkpoint()
        assert ck.region_errorests is not None
        assert ck.region_errorests.shape == (ck.lows.shape[0],)
        assert ck.region_estimates.shape == (ck.lows.shape[0],)
        assert (ck.region_errorests >= 0).all()
        # the stash must track the pool: the sum of stored errors is the
        # final sweep's in-flight error (what the queue accounting uses)
        assert ck.region_errorests.sum() > 0

    def test_convergence_driver_accepts_resume_seed(self):
        """integrate_to_convergence(initial_regions=, ledger=) must resume
        a saved checkpoint: the seed feeds round 1 only (regression: later
        rounds re-passed it -> TypeError; a leftover ledger= would be
        re-banked once per continuation slice)."""
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        r1 = ws.integrate(g, epsrel=1e-7, epsabs=1e-40, max_iterations=3)
        assert r1.status == 1
        ck = ws.make_checkpoint()
        r = ws.integrate_to_convergence(
            g, epsrel=1e-7, epsabs=1e-40, max_iterations=4,
            initial_regions=(ck.lows, ck.lengths), ledger=ck.ledger)
        assert r.status == 0
        assert abs(r.estimate - g.true_value) <= max(
            r.errorest, 1e-6 * abs(g.true_value))

    def test_convergence_driver_stage_timer(self):
        """stage_timer= records the per-round breakdown (round1 +
        resume rounds / slices) the flagship bench reports so tunnel
        noise is separable from regression (VERDICT r02 item 8)."""
        from gpuintegration_tpu.utils.profiling import StageTimer
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        st = StageTimer()
        r = ws.integrate_to_convergence(
            g, epsrel=1e-7, epsabs=1e-40, max_iterations=3,
            stage_timer=st)
        assert r.status == 0
        assert "round1" in st.times and st.times["round1"] > 0
        # the 3-iteration budget forces at least one continuation stage
        assert any(k.startswith("resume_round") or k == "slices"
                   for k in st.times), st.times

    def test_finish_scale_validation(self):
        g = genz.f4_gaussian(2)
        ws = Workspace(2, chunk_size=256)
        with pytest.raises(ValueError):
            ws.integrate(g, finish_epsrel_scale=0.0)
        with pytest.raises(ValueError):
            ws.integrate(g, finish_epsrel_scale=1.5)
        with pytest.raises(ValueError):
            ws.integrate(g, finish_abs_per_vol=-1.0)

    def test_finish_abs_per_vol_host_fused_equal(self):
        """The volume-apportioned retirement term must (a) retire regions
        earlier than the relative-only criterion (fewer total regions for
        the same certified result), (b) keep the certificate honest, and
        (c) run bit-identically through the host and fused loops (it sits
        inside the shared iteration_math pipeline)."""
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        r0 = ws.integrate(g, epsrel=1e-5, epsabs=1e-40, fused=False)
        apv = 1e-9   # well under epsrel * |I| ~ 1.1e-7: sound budget
        r1 = ws.integrate(g, epsrel=1e-5, epsabs=1e-40, fused=False,
                          finish_abs_per_vol=apv)
        r2 = ws.integrate(g, epsrel=1e-5, epsabs=1e-40, fused=True,
                          finish_abs_per_vol=apv)
        for r in (r0, r1, r2):
            assert r.status == 0
            assert abs(r.estimate - g.true_value) <= max(
                r.errorest, 1e-6 * abs(g.true_value))
        assert r1.nregions < r0.nregions          # earlier retirement
        assert r1.estimate == r2.estimate          # host == fused
        assert r1.errorest == r2.errorest
        assert r1.nregions == r2.nregions

    def test_absolute_target_run_banks_regions(self):
        """epsabs-dominated run (epsrel=0): the error-budget-overflow
        rollback must use max(epsrel*|est|, epsabs) -- the same budget as
        accuracy_reached.  With an epsrel-only rollback ANY positive
        banked error rolls back every retirement each iteration, so the
        volume-apportioned absolute targets the partitioned continuation
        hands its inexact slices (eps_rel_i=0, epsabs=share) could never
        bank a region and burned to the pool wall instead.  Regression:
        confirmed broken before the fix (nFinishedRegions stayed 0)."""
        g = genz.f1_oscillatory(3, coeffs=[7.0, 8.0, 9.0])
        ws = Workspace(3, chunk_size=1024)
        epsabs = 1e-7
        rs = [ws.integrate(g, epsrel=0.0, epsabs=epsabs, fused=fused,
                           finish_abs_per_vol=0.5 * epsabs)
              for fused in (False, True)]
        for r in rs:
            assert r.status == 0
            assert r.nFinishedRegions > 0     # retirement actually banked
            assert abs(r.estimate - g.true_value) <= max(
                r.errorest, epsabs)
        assert rs[0].estimate == rs[1].estimate   # host == fused
        assert rs[0].nregions == rs[1].nregions

    def test_oscillatory_wall_certified_by_dynamic_slice_targets(self):
        """The oscillatory certificate wall (docs/VALIDATION.md section 2b):
        every continuation slice is already 'converged' relative to its
        own signed estimate (slice estimates dwarf the global integral
        through cancellation), so with caller tolerances the slices bank
        their stored errors untouched and the banked sum overshoots the
        global budget -- bit-identically under any finish_epsrel_scale.
        The dynamic slice targets re-apportion the remaining budget by
        stored-error share and tighten each slice to its share (with the
        volume term giving zero-crossing regions a sound exit), which
        must carry this run to an honest certificate."""
        g = genz.f1_oscillatory(3, coeffs=[7.0, 8.0, 9.0])
        ws = Workspace(3, max_pool_regions=2048, chunk_size=128)
        r = ws.integrate_to_convergence(g, epsrel=1e-7, epsabs=1e-40,
                                        max_wall_s=300)
        assert r.status == 0
        cert = r.errorest / abs(r.estimate)
        assert 0 < cert <= 1e-7
        rel = abs(r.estimate - g.true_value) / abs(g.true_value)
        assert rel <= max(cert, 1e-8), (rel, cert)

    def test_finish_scale_tightens_retirement_only(self, monkeypatch):
        """finish_epsrel_scale must reach the two-level classification as
        epsrel*scale while the returned certificate is still tested at
        the full epsrel.  (The deep-rung mechanism: at scale 1.0, regions
        retired at the per-region bound can collectively bank ~1.0x the
        whole error budget -- observed 1.03x on the 8D Gaussian at 1e-6
        -- after which no continuation can certify the global target.)"""
        from gpuintegration_tpu.pagani import workspace as W
        seen = []
        orig = W._post_stage

        def spy(*args, **kwargs):
            seen.append(float(args[-1]))   # eps_dev (last positional)
            return orig(*args, **kwargs)

        monkeypatch.setattr(W, "_post_stage", spy)
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        r = ws.integrate(g, epsrel=1e-5, epsabs=1e-40, fused=False,
                         finish_epsrel_scale=0.25)
        assert seen and all(abs(e - 0.25e-5) < 1e-18 for e in seen)
        assert r.status == 0
        assert r.errorest / abs(r.estimate) <= 1e-5
        assert abs(r.estimate - g.true_value) <= max(
            r.errorest, 1e-6 * abs(g.true_value))

    def test_finish_scale_through_continuation(self):
        """The scale must thread through integrate_to_convergence's
        resumed rounds and partitioned-continuation slices (kw
        pass-through) and still produce an honest certificate."""
        g = genz.f4_gaussian(4, a=15.0)
        ws = Workspace(4, max_pool_regions=4096, chunk_size=128)
        r = ws.integrate_to_convergence(g, epsrel=1e-6, epsabs=1e-40,
                                        finish_epsrel_scale=0.5)
        assert r.status == 0
        cert = r.errorest / abs(r.estimate)
        assert 0 < cert <= 1e-6
        rel = abs(r.estimate - g.true_value) / abs(g.true_value)
        assert rel <= max(cert, 1e-7), (rel, cert)

    def test_continuation_hopeless_banked_budget_exits_fast(self):
        """When the checkpoint's already-banked error alone exceeds the
        global budget, no slice can ever certify (banked error is
        immutable) -- the continuation must exit status 1 without
        evaluating anything instead of burning its run budget."""
        from gpuintegration_tpu.utils.checkpoint import PaganiCheckpoint
        from gpuintegration_tpu.types import IntegrationResult
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=256)
        n = 8
        ck = PaganiCheckpoint(
            lows=np.full((n, 3), 0.25), lengths=np.full((n, 3), 0.25),
            estimate=1.0, errorest=1e-3,       # banked 1e-3 >> budget
            nregions=100, iters=5, neval=1000,
            region_estimates=np.full(n, 1e-6),
            region_errorests=np.full(n, 1e-9))
        last = IntegrationResult(estimate=1.0, errorest=1e-3, status=1,
                                 nregions=100, iters=5, neval=1000)
        r = ws._partitioned_continuation(
            g, 1e-6, 1e-40, None, ck, last, rounds_left=8)
        assert r.status == 1
        assert r.neval == 1000          # nothing new evaluated
        assert r.errorest >= 1e-3       # banked + queue, honest

    def test_continuation_growing_budget_is_not_hopeless(self):
        """The hopeless exit must account for budget GROWTH: the global
        budget epsrel*|fin_est + q_est| moves as slices refine the queue
        estimate, bounded by the queue's stored error.  When the bank
        exceeds the current budget but NOT the best reachable budget
        (fin_err <= epsrel*(|fin_est+q_est| + q_err)), the continuation
        must keep evaluating rather than exit on the biased-low estimate.
        (Regression: the exit used to fire off the current budget alone.)"""
        from gpuintegration_tpu.utils.checkpoint import PaganiCheckpoint
        from gpuintegration_tpu.types import IntegrationResult
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=256)
        n = 8
        # bank 1.05e-6 > current budget ~1e-6, but the queue's stored
        # error (8 * 0.0625 = 0.5) admits budgets up to ~1.5e-6
        ck = PaganiCheckpoint(
            lows=np.full((n, 3), 0.25), lengths=np.full((n, 3), 0.25),
            estimate=1.0, errorest=1.05e-6,
            nregions=100, iters=5, neval=1000,
            region_estimates=np.zeros(n),
            region_errorests=np.full(n, 0.0625))
        last = IntegrationResult(estimate=1.0, errorest=1.05e-6 + 0.5,
                                 status=1, nregions=100, iters=5,
                                 neval=1000)
        r = ws._partitioned_continuation(
            g, 1e-6, 1e-40, None, ck, last, rounds_left=8)
        assert r.neval > 1000           # slices WERE evaluated
        # the 8 identical regions integrate to ~1.09e-2, lifting the
        # budget to ~1.011e-6 -- still below the immutable 1.05e-6 bank,
        # so the honest outcome remains non-certified
        assert r.status == 1

    def test_continuation_inexact_slice_absolute_target_certifies(self):
        """End-to-end drive of the INEXACT-slice dynamic-target branch:
        a checkpoint with no per-region stash (mesh/fused exits) yields
        apportioned slices; with banked error below the epsabs budget but
        projected natural exits above it, the branch hands the slice a
        purely absolute target (eps_rel_i=0, epsabs=share,
        finish_abs_per_vol) -- which must produce an honest certified
        result.  (Regression: with the epsrel-only rollback this path
        could never bank a region.)"""
        from gpuintegration_tpu.utils.checkpoint import PaganiCheckpoint
        from gpuintegration_tpu.types import IntegrationResult
        g = genz.f1_oscillatory(3, coeffs=[7.0, 8.0, 9.0])
        ws = Workspace(3, chunk_size=256)
        # 8 octants covering the unit cube, no per-region stash
        lows = np.array([[i & 1, (i >> 1) & 1, (i >> 2) & 1]
                         for i in range(8)]) * 0.5
        ck = PaganiCheckpoint(
            lows=lows, lengths=np.full((8, 3), 0.5),
            estimate=0.0, errorest=0.5e-4,   # banked: below the budget
            nregions=100, iters=5, neval=1000)
        last = IntegrationResult(estimate=float(g.true_value),
                                 errorest=0.5e-4 + 1.0, status=1,
                                 nregions=100, iters=5, neval=1000)
        r = ws._partitioned_continuation(
            g, 0.0, 1e-4, None, ck, last, rounds_left=8)
        assert r.neval > 1000              # the slice WAS evaluated
        assert r.status == 0               # certified off the share
        assert r.errorest <= 1e-4
        assert abs(r.estimate - g.true_value) <= max(r.errorest, 1e-4)

    def test_make_slices_exactness_flags(self):
        """Slices cut from a per-region stash are exact (certifiable);
        apportioned slices are flagged inexact so the global certificate
        cannot fire off uniform error shares (a hot slice's error would be
        understated once cold slices drain)."""
        lows = np.random.RandomState(0).rand(10, 2)
        lengths = np.full((10, 2), 0.1)
        reg_est = np.linspace(1.0, 2.0, 10)
        reg_err = np.linspace(0.1, 1.0, 10)
        exact = Workspace._make_slices(lows, lengths, reg_est, reg_err,
                                       reg_est.sum(), reg_err.sum(), 4, 0)
        assert all(s[5] for s in exact)
        # coldest first: work.pop() must take the hottest slice
        assert exact[0][3] < exact[-1][3]
        np.testing.assert_allclose(sum(s[3] for s in exact),
                                   reg_err.sum(), rtol=1e-12)
        appor = Workspace._make_slices(lows, lengths, None, None,
                                       3.0, 1.5, 4, 0)
        assert not any(s[5] for s in appor)
        np.testing.assert_allclose(sum(s[3] for s in appor), 1.5,
                                   rtol=1e-12)

    def test_checkpoint_without_run_raises(self):
        with pytest.raises(ValueError, match="no resumable pool"):
            Workspace(3).make_checkpoint()

    def test_vector_continuation_no_crash(self):
        """Vector-valued runs have no resumable pool; the continuation
        driver must return the unconverged result, not crash."""
        def fvec(x):
            s = jnp.sum(x, axis=-1)
            return jnp.stack([s, s * s], axis=-1)
        ws = Workspace(3, chunk_size=1024)
        r = ws.integrate_to_convergence(fvec, epsrel=1e-10, epsabs=1e-40,
                                        max_iterations=3)
        assert r.status in (0, 1)


class TestDeadline:
    """Per-iteration wall deadline (round 4, VERDICT r3 weak 6): the
    loops stop BETWEEN iterations once time.monotonic() passes
    ``deadline``, and integrate_to_convergence threads max_wall_s into
    every round and slice so no single long slice can overshoot the
    budget by its own duration."""

    def test_past_deadline_exits_before_first_sweep(self):
        import time
        from gpuintegration_tpu.models import genz
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        r = ws.integrate(g, epsrel=1e-6, epsabs=1e-40,
                         deadline=time.monotonic() - 1.0)
        assert r.status == 1 and r.iters == 0 and r.neval == 0

    def test_vector_loop_honors_deadline(self):
        import time

        def fvec(x):
            s = jnp.sum(x, axis=-1)
            return jnp.stack([s, s * s], axis=-1)
        ws = Workspace(3, chunk_size=1024)
        r = ws.integrate(fvec, epsrel=1e-12, epsabs=1e-40,
                         deadline=time.monotonic() - 1.0)
        assert r.status == 1 and r.iters == 0

    def test_convergence_driver_threads_max_wall(self):
        from gpuintegration_tpu.models import genz
        g = genz.f4_gaussian(3, a=8.0)
        ws = Workspace(3, chunk_size=1024)
        r = ws.integrate_to_convergence(g, epsrel=1e-12, epsabs=1e-40,
                                        max_wall_s=1e-3)
        assert r.status == 1 and r.iters == 0
