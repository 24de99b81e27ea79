"""Vector-valued integrands (cubacpp array<double,N>/vector<double>
parity, cubacpp/integrand_traits.hh:81-93) in the main drivers.

The reference's GPU layer is scalar-only; cubacpp's CPU bindings deduce
and integrate N-component returns end-to-end.  Here the Genz suite is
integrated as ONE multi-component call sharing a single point set /
region tree and must match the per-component scalar runs.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu import Workspace
from gpuintegration_tpu.integrand import deduce_ncomp, make_integrand
from gpuintegration_tpu.mcubes.vegas import vegas
from gpuintegration_tpu.models import genz

ND = 3
MEMBERS = [genz.f1_oscillatory(ND), genz.f2_product_peak(ND),
           genz.f4_gaussian(ND, a=5.0), genz.f5_c0_continuous(ND)]
TRUTHS = np.array([m.true_value for m in MEMBERS])


def fvec(x):
    return jnp.stack([m(x) for m in MEMBERS], axis=-1)


fvec.ndim = ND


def test_deduce_ncomp():
    f, n = make_integrand(fvec)
    assert n == ND
    assert deduce_ncomp(f, ND) == len(MEMBERS)
    fs, _ = make_integrand(genz.f4_gaussian(ND))
    assert deduce_ncomp(fs, ND) == 1


def test_deduce_ncomp_constant_integrand():
    """A Python-constant return traces to rank 0; the wrapper must
    broadcast it to the batch shape (regression: vector-ncomp deduction
    rejected ``lambda x, y: 0.0``, which round 1 accepted)."""
    f, n = make_integrand(lambda x, y: 0.0)
    assert n == 2 and deduce_ncomp(f, 2) == 1
    f1, _ = make_integrand(lambda x: 3.5, ndim=4)
    assert deduce_ncomp(f1, 4) == 1


def test_whole_batch_reduction_rejected():
    """A rank-0 return that DEPENDS on the points (sum missing axis=-1)
    must raise, not silently integrate a per-chunk constant."""
    import pytest
    f, _ = make_integrand(lambda x: jnp.exp(-jnp.sum(x ** 2)), ndim=5)
    with pytest.raises(ValueError, match="batch axis"):
        deduce_ncomp(f, 5)
    f2, _ = make_integrand(lambda a, b: jnp.sum(a * b))
    with pytest.raises(ValueError, match="batch axis"):
        deduce_ncomp(f2, 2)


def test_pagani_vector_matches_scalar_calls():
    """One 4-component call == 4 scalar calls (same tolerances)."""
    rv = Workspace(ND, chunk_size=1024).integrate(
        fvec, epsrel=1e-6, epsabs=1e-40)
    assert rv.status == 0
    assert rv.estimates.shape == (len(MEMBERS),)
    for i, m in enumerate(MEMBERS):
        rel = abs(rv.estimates[i] - TRUTHS[i]) / abs(TRUTHS[i])
        assert rel < 1e-6, (i, rel)
        # reported error covers the actual deviation
        assert abs(rv.estimates[i] - TRUTHS[i]) <= max(
            5 * rv.errorests[i], 1e-9 * abs(TRUTHS[i]))
    # scalar mirror fields point at component 0
    assert rv.estimate == rv.estimates[0]


def test_pagani_vector_accuracy_needs_all_components():
    """Convergence is all-components: a run whose hardest component
    cannot meet the tolerance within the iteration budget must not
    report status 0 even if easy components converged long before."""
    r = Workspace(ND, chunk_size=1024).integrate(
        fvec, epsrel=1e-7, epsabs=1e-40, max_iterations=3)
    assert r.status == 1


def test_vegas_vector_statistically_correct():
    """Vector VEGAS: one pass integrates every component with honest
    errors (grid adaptation follows component 0, CUBA semantics, so
    dissimilar components converge slower but stay unbiased)."""
    r = vegas(fvec, epsrel=5e-3, ncall=5e4, total_iters=15,
              adjust_iters=8, seed=2)
    assert r.estimates.shape == (len(MEMBERS),)
    for i in range(len(MEMBERS)):
        err = abs(r.estimates[i] - TRUTHS[i])
        assert err <= max(5 * r.errorests[i], 1e-3 * abs(TRUTHS[i])), i
    # per-component chi2 probability (cubacpp integration_results<N>::prob)
    assert r.probs.shape == (len(MEMBERS),)
    assert np.all((r.probs >= 0.0) & (r.probs < 1.0))
    assert r.prob == float(np.max(r.probs))


def test_vegas_vector_similar_components_converge():
    """Components sharing structure (same peak, different widths)
    converge jointly under the component-0-adapted grid."""
    members = [genz.f4_gaussian(ND, a=5.0), genz.f4_gaussian(ND, a=8.0)]

    def g2(x):
        return jnp.stack([m(x) for m in members], axis=-1)
    g2.ndim = ND
    r = vegas(g2, epsrel=5e-3, ncall=5e4, total_iters=15, adjust_iters=8,
              seed=3)
    assert r.status == 0
    for i, m in enumerate(members):
        rel = abs(r.estimates[i] - m.true_value) / m.true_value
        assert rel < 2e-2, (i, rel)


def test_vegas_vector_poly_and_device_refine():
    members = [genz.f4_gaussian(ND, a=5.0), genz.f4_gaussian(ND, a=8.0)]

    def g2(x):
        return jnp.stack([m(x) for m in members], axis=-1)
    g2.ndim = ND
    rp = vegas(g2, epsrel=5e-3, ncall=5e4, total_iters=15, adjust_iters=6,
               seed=3, importance="poly")
    rd = vegas(g2, epsrel=5e-3, ncall=5e4, total_iters=15, adjust_iters=8,
               seed=3, refine="device")
    for r in (rp, rd):
        for i, m in enumerate(members):
            rel = abs(r.estimates[i] - m.true_value) / m.true_value
            assert rel < 3e-2, (i, rel)


def test_pagani_vector_epsabs_driven_retires_regions():
    """Regression: the vector loop's error-budget rollback must use
    max(epsrel*|est|, epsabs) like the scalar/mesh loops (commit
    b27074e).  With the old epsrel-only budget, an epsabs-driven run
    (epsrel=0) rolled back EVERY iteration (any banked error > 0), so
    no region could ever retire: nFinishedRegions stayed 0."""
    members = [genz.f4_gaussian(ND, a=5.0), genz.f4_gaussian(ND, a=8.0)]

    def g2(x):
        return jnp.stack([m(x) for m in members], axis=-1)
    g2.ndim = ND
    epsabs = 2e-8
    r = Workspace(ND, chunk_size=1024).integrate(
        g2, epsrel=0.0, epsabs=epsabs,
        finish_abs_per_vol=0.3 * epsabs)
    assert r.status == 0
    assert r.nFinishedRegions > 0
    for i, m in enumerate(members):
        assert abs(r.estimates[i] - m.true_value) <= epsabs, i


def test_vector_rejects_unsupported_modes():
    with pytest.raises(ValueError):
        Workspace(ND, chunk_size=1024).integrate(
            fvec, epsrel=1e-3, vegas_assisted=True)
    with pytest.raises(ValueError, match="vector ledger"):
        Workspace(ND, chunk_size=1024).integrate(
            fvec, epsrel=1e-3, ledger=(0.0, 0.0, 0, 0, 0))


def test_vector_fused_matches_host():
    """The fused vector phase must agree with the host vector loop
    iteration-for-iteration (same discipline as the scalar pair: both
    trace workspace.iteration_math_vector)."""
    rh = Workspace(ND, chunk_size=1024).integrate(
        fvec, epsrel=1e-6, epsabs=1e-40, fused=False)
    rf = Workspace(ND, chunk_size=1024).integrate(
        fvec, epsrel=1e-6, epsabs=1e-40, fused=True)
    assert (rh.status, rh.iters, rh.neval, rh.nregions) == \
           (rf.status, rf.iters, rf.neval, rf.nregions)
    np.testing.assert_allclose(rh.estimates, rf.estimates, rtol=1e-12)
    np.testing.assert_allclose(rh.errorests, rf.errorests, rtol=1e-9)


def test_vector_checkpoint_resume_reaches_deeper_tolerance(tmp_path):
    """A budget-limited vector round checkpoints and resumes through the
    (ncomp,) ledger to a tolerance the single round could not certify
    (cubacpp vector semantics carried through the continuation story)."""
    ws = Workspace(ND, chunk_size=1024)
    r1 = ws.integrate(fvec, epsrel=1e-7, epsabs=1e-40,
                      max_iterations=4, fused=False)
    assert r1.status == 1
    ck = ws.make_checkpoint()
    assert np.ndim(ck.estimate) == 1 and ck.estimate.shape == (len(MEMBERS),)
    assert ck.region_errorests is not None
    assert ck.region_errorests.shape == (ck.lows.shape[0], len(MEMBERS))
    # vector checkpoints round-trip through savez like scalar ones
    ck.save(str(tmp_path / "vec_ck"))
    from gpuintegration_tpu.utils.checkpoint import PaganiCheckpoint
    ck2 = PaganiCheckpoint.load(str(tmp_path / "vec_ck"))
    np.testing.assert_array_equal(ck.estimate, ck2.estimate)
    np.testing.assert_array_equal(ck.lows, ck2.lows)
    r2 = ws.integrate(fvec, epsrel=1e-7, epsabs=1e-40,
                      initial_regions=(ck2.lows, ck2.lengths),
                      ledger=ck2.ledger)
    assert r2.status == 0
    assert r2.iters > r1.iters          # ledger seeded the iteration count
    for i in range(len(MEMBERS)):
        rel = abs(r2.estimates[i] - TRUTHS[i]) / abs(TRUTHS[i])
        assert rel < 1e-6, (i, rel)


def test_vector_convergence_driver():
    """integrate_to_convergence chains budget-limited vector rounds via
    the vector checkpoint/ledger to full convergence."""
    ws = Workspace(ND, chunk_size=1024)
    r = ws.integrate_to_convergence(fvec, epsrel=1e-7, epsabs=1e-40,
                                    max_iterations=4, fused=False)
    assert r.status == 0
    for i in range(len(MEMBERS)):
        rel = abs(r.estimates[i] - TRUTHS[i]) / abs(TRUTHS[i])
        assert rel < 1e-6, (i, rel)


def test_split_starved_vector_continuation_slices():
    """Round-4 item: a split-starved VECTOR pool runs the partitioned
    continuation (worst-component slice budgeting, per-component banking
    and certificate) instead of exiting -- and certifies a tolerance the
    single capped round provably cannot (it ends status 1 at the wall)."""
    comps = [genz.f4_gaussian(ND, a=8.0), genz.f2_product_peak(ND)]

    def fv(x):
        return jnp.stack([c(x) for c in comps], axis=-1)

    fv.ndim = ND
    truths = np.array([c.true_value for c in comps])
    eps = 1e-8
    # finish_epsrel_scale=0.4: reserve budget headroom for the
    # still-active queue, exactly like the deep-run scripts -- at the
    # default 1.0 the capped rounds bank up to ~1x the budget per
    # component and no continuation can certify (the scalar 8D
    # phenomenon documented on integrate()).  chunk_size stays well
    # under max_pool/16 so continuation slices get their designed 16x
    # refinement headroom (production configs always have pool >> chunk)
    ws = Workspace(ND, chunk_size=256, max_pool_regions=4096)
    r1 = ws.integrate(fv, epsrel=eps, epsabs=1e-40,
                      finish_epsrel_scale=0.4)
    assert r1.status == 1             # the capped single round walls
    ws2 = Workspace(ND, chunk_size=256, max_pool_regions=4096)
    r = ws2.integrate_to_convergence(fv, epsrel=eps, epsabs=1e-40,
                                     max_rounds=40,
                                     finish_epsrel_scale=0.4)
    assert r.status == 0
    assert r.estimates is not None and r.estimates.shape == (2,)
    # the certificate is per-component
    for i in range(2):
        assert r.errorests[i] <= eps * abs(r.estimates[i]) * (1 + 1e-12)
        rel = abs(r.estimates[i] - truths[i]) / abs(truths[i])
        assert rel < 10 * eps, (i, rel)


def test_suave_vector_integrands():
    """Round 4: Suave's vector surface (cubacpp SuaveIntegrate deduces
    array<double,N> like the rest of its API).  Components share one
    point set / region tree / per-region grid; convergence is
    all-components; the result carries per-component arrays."""
    from gpuintegration_tpu.pagani.suave import suave
    g1 = genz.f4_gaussian(ND, a=6.0)
    g2 = genz.f2_product_peak(ND)

    def fv(x):
        return jnp.stack([g1(x), g2(x)], axis=-1)

    fv.ndim = ND
    r = suave(fv, epsrel=5e-3, epsabs=1e-40, nnew=1024, nmin=2,
              max_regions=512, seed=3)
    assert r.estimates is not None and r.estimates.shape == (2,)
    assert r.errorests.shape == (2,) and r.probs is not None
    truths = np.array([g1.true_value, g2.true_value])
    for k in range(2):
        band = 5 * max(r.errorests[k] / abs(truths[k]), 5e-3)
        rel = abs(r.estimates[k] - truths[k]) / abs(truths[k])
        assert rel < band, (k, rel, band)
    # scalar runs keep their scalar surface (estimates stays None)
    rs = suave(g1, epsrel=5e-3, epsabs=1e-40, nnew=1024, nmin=2,
               max_regions=256, seed=3)
    assert rs.estimates is None and np.isfinite(rs.estimate)
