"""Heuristic-classifier unit tests.

Ports of the reference's direct classifier fixtures
(reference: test/kokkos/pagani/test_heuristic_classifier.cpp:32
"50% mem save prevented by high finished error-estimate" and
test/kokkos/pagani/finished_estimates.cpp:11 "Compute finished estimates"),
plus direct coverage of the relaxation schedule
(heuristic_classifier.cuh:392-438), sig_digits_same
(heuristic_classifier.cuh:170-203), and a small-budget end-to-end run
asserting the memory throttle keeps the pool within ``max_pool_regions``.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu.pagani.classifier import HeuristicClassifier
from gpuintegration_tpu.pagani import workspace as W


def _fixture_classifier(epsrel=1e-3, epsabs=1e-12, max_pool=1 << 20):
    """The reference fixture's classifier: 20 identical stored estimates of
    7000 => estimate converged, target error = 7.0
    (test_heuristic_classifier.cpp:40-48)."""
    hs = HeuristicClassifier(epsrel, epsabs, max_pool)
    for _ in range(20):
        hs.store_estimate(7000.0)
    assert hs.estimate_converged()
    return hs


# the reference's hand-built 7-region pool (test_heuristic_classifier.cpp:50-62)
_ERRORS = np.array([0.075, 0.99, 0.079, 101.96, 101.33, 1.93, 101.99])
_TOTAL_FINISHED_ERR = 4.2   # already-absorbed finished error


@pytest.mark.parametrize("method", ["ladder", "bisection"])
def test_mem_save_prevented_by_high_finished_error(method):
    """Port of test_heuristic_classifier.cpp:32: with error budget
    7.0 - 4.2 = 2.8, dropping the three smallest errors (sum 1.144) needs
    budget_pct 0.45 > 0.25 and leaves 4/7 = 57% active > 50% -- both
    relaxation ladders must engage, and the search must still succeed with
    30-50% of regions finished."""
    hs = _fixture_classifier()
    errs = jnp.asarray(_ERRORS)
    mask = jnp.ones(7, bool)
    iter_err = float(_ERRORS.sum())
    if method == "ladder":
        res = hs.classify_ladder(errs, mask, 7, iter_err, 0.0,
                                 _TOTAL_FINISHED_ERR)
    else:
        res = hs.classify(errs, mask, 7, iter_err, 0.0, _TOTAL_FINISHED_ERR)
    assert res.pass_mem and res.pass_errorest_budget
    saved = 1.0 - res.num_active / 7.0
    assert saved <= 0.5 and saved > 0.3          # (fixture's SECTION 1)
    # relaxation engaged: the strictest (0.5 active, 0.25 budget) pair
    # cannot admit this threshold (fixture's SECTION 2)
    assert res.num_active / 7.0 > 0.5
    assert res.finished_errorest > 0.25 * (7.0 - _TOTAL_FINISHED_ERR)
    # the surviving regions are exactly the three ~101 peaks + the 1.93 one
    flags = np.asarray(res.active_flags)
    np.testing.assert_array_equal(flags, (_ERRORS > res.threshold))
    assert flags.sum() == 4


@pytest.mark.parametrize("method", ["ladder", "bisection"])
def test_classifier_strict_pass(method):
    """A pool dominated by two huge errors passes at the STRICTEST
    percentages (no relaxation): 2/8 = 25% active <= 50%, and the finished
    error mass is tiny against the budget."""
    hs = _fixture_classifier()
    errors = np.array([1e-6, 2e-6, 1e-6, 3e-6, 100.0, 90.0, 2e-6, 1e-6])
    errs = jnp.asarray(errors)
    mask = jnp.ones(8, bool)
    iter_err = float(errors.sum())
    args = (errs, mask, 8, iter_err, 0.0, 0.0)
    res = (hs.classify_ladder(*args) if method == "ladder"
           else hs.classify(*args))
    assert res.pass_mem and res.pass_errorest_budget
    assert res.num_active / 8.0 <= 0.5
    assert res.finished_errorest <= 0.25 * (7.0 - 0.0)


@pytest.mark.parametrize("method", ["ladder", "bisection"])
def test_classifier_budget_exhausted_fails(method):
    """When the finished error already exceeds the target error the budget
    is negative: NO threshold can pass, whatever the relaxation
    (heuristic_classifier.cuh:305-325 evaluate_error_budget)."""
    hs = _fixture_classifier()          # target error 7.0
    errors = np.full(8, 1.0)
    args = (jnp.asarray(errors), jnp.ones(8, bool), 8, 8.0, 0.0, 50.0)
    res = (hs.classify_ladder(*args) if method == "ladder"
           else hs.classify(*args))
    assert not res.pass_errorest_budget


def test_sig_digits_same():
    """Digit-string convergence test (heuristic_classifier.cuh:170-203)."""
    hs = HeuristicClassifier(1e-3, 1e-12, 1 << 20)   # required_digits = 3
    for v in (1.23456, 1.23456, 1.23456):
        hs.store_estimate(v)
    assert hs.sig_digits_same() and hs.estimate_converged()
    # differ in the 2nd significant digit -> not converged at 3 digits
    hs.store_estimate(1.31456)
    assert not hs.sig_digits_same()
    # NaN estimates never count as converged
    hs2 = HeuristicClassifier(1e-3, 1e-12, 1 << 20)
    for v in (float("nan"), float("nan"), float("nan")):
        hs2.store_estimate(v)
    assert not hs2.sig_digits_same()
    # too few collected iterations -> not converged even if digits agree
    hs3 = HeuristicClassifier(1e-3, 1e-12, 1 << 20)
    hs3.store_estimate(5.0)
    assert not hs3.estimate_converged()


def test_classification_criteria_met():
    """(heuristic_classifier.cuh:348-360): classify when the split cannot
    fit, or when >10% of budget AND the estimate has converged."""
    hs = _fixture_classifier(max_pool=1000)
    assert hs.classification_criteria_met(501)        # split cannot fit
    assert hs.classification_criteria_met(100)        # >10% + converged
    assert not hs.classification_criteria_met(40)     # 8% of budget
    fresh = HeuristicClassifier(1e-3, 1e-12, 1000)    # not converged
    assert not fresh.classification_criteria_met(100)
    assert fresh.classification_criteria_met(501)     # necessity overrides


def test_finished_estimates_accounting():
    """Port of finished_estimates.cpp:11: uniform per-region estimates with
    a bundled range of active regions -> the finished sums equal
    iter - active exactly, through the shared iteration_math pipeline."""
    cap, n = 256, 200                     # blocked pool: 100 real per half
    est = np.zeros(cap)
    err = np.zeros(cap)
    half = cap // 2
    real = np.concatenate([np.arange(n // 2), half + np.arange(n // 2)])
    est[real] = 3.2
    err[real] = 1e-5
    # active regions = slots 11..17 of each half (the fixture's bundled
    # range); make them active by giving them err >= epsrel * |est|
    active_rows = np.concatenate([np.arange(11, 18), half + np.arange(11, 18)])
    err[active_rows] = 1.0
    # parents chosen so the two-level diff is exactly zero: refined == err
    parent = est[:half] + est[half:]
    out = W._post_stage(
        True, True, jnp.asarray(est), jnp.asarray(err),
        jnp.asarray(n, jnp.int32), jnp.asarray(parent),
        jnp.asarray(True), jnp.asarray(1e-3))
    _, refined, active, scalars = out
    iter_est, iter_err, fin_est, fin_err, n_active = np.asarray(scalars)
    n_act_true = len(active_rows)
    assert n_active == n_act_true
    np.testing.assert_allclose(iter_est, 3.2 * n, rtol=1e-13)
    np.testing.assert_allclose(
        fin_est, 3.2 * (n - n_act_true), rtol=1e-13)     # SECTION 2
    np.testing.assert_allclose(
        fin_err, 1e-5 * (n - n_act_true), rtol=1e-9)  # iter-active cancels
    # all-finished variant (SECTION 1): no region exceeds its tolerance
    err[active_rows] = 1e-5
    out = W._post_stage(
        True, True, jnp.asarray(est), jnp.asarray(err),
        jnp.asarray(n, jnp.int32), jnp.asarray(parent),
        jnp.asarray(True), jnp.asarray(1e-3))
    scalars = np.asarray(out[3])
    assert scalars[4] == 0
    np.testing.assert_allclose(scalars[2], scalars[0], rtol=1e-13)
    np.testing.assert_allclose(scalars[3], scalars[1], rtol=1e-13)


def test_throttle_keeps_pool_within_budget():
    """End-to-end: a small ``max_pool_regions`` must bound the live pool --
    every recorded iteration's region count stays within budget and the
    ledger stays consistent (nregions == finished + final active)."""
    from gpuintegration_tpu import Workspace
    from gpuintegration_tpu.models import genz
    from gpuintegration_tpu.utils.recorder import IterationRecorder

    max_pool = 2048
    g = genz.f4_gaussian(3)
    rec = IterationRecorder()
    ws = Workspace(3, max_pool_regions=max_pool, chunk_size=256)
    res = ws.integrate(g, epsrel=1e-9, epsabs=1e-40, recorder=rec,
                       max_iterations=25)
    assert len(rec.rows) >= 3
    peak = max(r["nregions"] for r in rec.rows)
    assert peak <= max_pool, peak
    # the run wanted more than the budget allows (otherwise the throttle
    # never engaged and this test is vacuous)
    assert 2 * peak > max_pool
    final_active = res.nregions - res.nFinishedRegions
    assert final_active >= 0
    np.testing.assert_allclose(res.estimate, g.true_value,
                               rtol=max(5e-6, 10 * res.errorest /
                                        max(abs(res.estimate), 1e-300)))


class TestF32DtypeRobustness:
    """f64-calibrated literals must not underflow/no-op in f32
    (regressions: 1e-200 finished floor -> 0 in f32 kept zero regions
    active forever; the ladder's 1e-300 floor and 1+1e-12 separation
    collapsed the rung spacing)."""

    def test_f32_zero_region_finishes(self):
        from gpuintegration_tpu.pagani import two_level
        est = jnp.zeros(4, jnp.float32)
        err = jnp.zeros(4, jnp.float32)
        parents = jnp.zeros(2, jnp.float32)
        refined, active = two_level.refine_error(
            est, err, parents, jnp.asarray(4, jnp.int32), 1e-4)
        assert float(jnp.sum(active)) == 0.0  # all finished, none active

    def test_f32_ladder_survives_zero_and_equal_errors(self):
        from gpuintegration_tpu.pagani.classifier import _ladder_probe
        # one exactly-zero valid error: rungs must span the POSITIVE
        # error range, not 300 irrelevant decades above 1e-300
        errs = jnp.asarray([0.0, 1e-3, 2e-3, 4e-3], jnp.float32)
        mask = jnp.ones(4, bool)
        ts, counts, kept = np.asarray(_ladder_probe(errs, mask, 8))
        assert np.all(np.isfinite(ts)) and ts[0] <= 1e-3 * (1 + 1e-5)
        assert ts[0] >= 1e-4        # spacing spans decades, not 1e-300
        assert counts[0] >= 2       # low rungs keep the real errors
        # all-equal errors: separation guard must not no-op in f32
        errs2 = jnp.full(4, 5e-3, jnp.float32)
        ts2, counts2, _ = np.asarray(_ladder_probe(errs2, mask, 8))
        assert counts2[0] == 4      # lowest rung sits strictly below

    def test_ladder_counts_exact_above_f32_resolution(self):
        """Counts come back in f64 (an f32 count is even-rounded above
        2^24); spot-check exactness of an odd count."""
        from gpuintegration_tpu.pagani.classifier import _ladder_probe
        n = 1001
        errs = jnp.linspace(1e-6, 1.0, n).astype(jnp.float32)
        ts, counts, _ = np.asarray(_ladder_probe(errs, jnp.ones(n, bool), 4))
        assert counts.dtype == np.float64
        assert counts[0] == float(int(counts[0]))
