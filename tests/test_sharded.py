"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed tests at all (SURVEY.md section 4); these
cover the new capability: sharded rule evaluation must be bitwise-identical
to single-device evaluation, and sharded VEGAS must converge.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu.integrand import make_integrand
from gpuintegration_tpu.models import genz
from gpuintegration_tpu.ops import rule_eval
from gpuintegration_tpu.pagani import region_pool
from gpuintegration_tpu.parallel import sharded
from gpuintegration_tpu.parallel.mesh import make_mesh, pool_sharding


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device backend")
    return make_mesh()


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_sharded_eval_matches_single_device(mesh):
    """PAGANI rule evaluation sharded over 8 devices == unsharded to f64
    roundoff (per-shard matmul tiling changes the contraction order, so
    bitwise equality only holds for a fixed sharding -- checked below),
    and repeated sharded runs are bitwise deterministic (no atomics)."""
    ndim = 4
    # asymmetric integrand (per-dim coefficients 1..n) so fourth-difference
    # split-dim choices have no exact ties for roundoff to flip
    g = genz.f1_oscillatory(ndim)
    f, _ = make_integrand(g, ndim)
    lows, lengths, n = region_pool.uniform_split(ndim, 4, 256)
    gl = jnp.zeros(ndim)
    gr = jnp.ones(ndim)

    tables = rule_eval.rule_tables(ndim)
    est0, err0, sd0 = rule_eval.apply_rule(f, tables, lows, lengths, gl, gr)

    lows_s = jax.device_put(lows, pool_sharding(mesh))
    lengths_s = jax.device_put(lengths, pool_sharding(mesh))
    est1, err1, sd1 = sharded.sharded_eval_stage(
        f, ndim, "float64", mesh, lows_s, lengths_s, gl, gr)

    np.testing.assert_allclose(np.asarray(est0), np.asarray(est1),
                               rtol=1e-13)
    # error estimates are differences of nearly-cancelling rule sums, so
    # contraction-order changes surface as ~1e-8 relative noise on them
    np.testing.assert_allclose(np.asarray(err0), np.asarray(err1),
                               rtol=1e-6, atol=1e-300)
    np.testing.assert_array_equal(np.asarray(sd0), np.asarray(sd1))

    # bitwise determinism of the sharded path itself
    est2, err2, _ = sharded.sharded_eval_stage(
        f, ndim, "float64", mesh, lows_s, lengths_s, gl, gr)
    np.testing.assert_array_equal(np.asarray(est1), np.asarray(est2))
    np.testing.assert_array_equal(np.asarray(err1), np.asarray(err2))


def test_sharded_reductions_match(mesh):
    rng = np.random.default_rng(0)
    est = jnp.asarray(rng.random(512))
    err = jnp.asarray(rng.random(512))
    act = jnp.asarray((rng.random(512) > 0.5).astype(np.float64))
    out = np.asarray(sharded.sharded_reductions(mesh, est, err, act))
    np.testing.assert_allclose(out[0], float(jnp.sum(est)), rtol=1e-12)
    np.testing.assert_allclose(out[4], float(jnp.sum(act)), rtol=1e-12)


def test_sharded_vegas_converges(mesh):
    g = genz.f4_gaussian(3, a=5.0)
    r = sharded.vegas_sharded(g, epsrel=5e-3, ncall=5e4, mesh=mesh,
                              total_iters=12, adjust_iters=8, seed=2)
    assert r.status == 0
    assert abs(r.estimate - g.true_value) / g.true_value < 2e-2


def test_mesh_workspace_matches_single_device(mesh):
    """End-to-end adaptive PAGANI with the region pool sharded over 8
    devices converges to the same answer as the single-device run."""
    from gpuintegration_tpu import Workspace
    g = genz.f1_oscillatory(4)
    r1 = Workspace(4, chunk_size=1024).integrate(
        g, epsrel=1e-7, epsabs=1e-40)
    r8 = Workspace(4, chunk_size=1024, mesh=mesh).integrate(
        g, epsrel=1e-7, epsabs=1e-40)
    assert r1.status == 0 and r8.status == 0
    assert abs(r1.estimate - r8.estimate) <= 1e-9 * abs(r1.estimate) \
        + 1e-3 * (r1.errorest + r8.errorest)
    assert r1.iters == r8.iters


def test_sharded_vegas_deterministic(mesh):
    g = genz.f4_gaussian(2, a=3.0)
    r1 = sharded.vegas_sharded(g, ncall=1e4, mesh=mesh, total_iters=6,
                               adjust_iters=4, seed=7)
    r2 = sharded.vegas_sharded(g, ncall=1e4, mesh=mesh, total_iters=6,
                               adjust_iters=4, seed=7)
    assert r1.estimate == r2.estimate


def test_mesh_fused_growth_parity(mesh):
    """The FULL mesh pipeline -- fused adaptive bursts, shard-local
    compaction/split, bucket growth, dynamic-trip chunking -- reproduces
    the single-chip trajectory: same iterations, same region counts, and
    estimates equal to psum-reassociation roundoff."""
    from gpuintegration_tpu import Workspace
    g = genz.f4_gaussian(4)
    r1 = Workspace(4, chunk_size=256).integrate(g, epsrel=1e-4, epsabs=1e-40)
    r8 = Workspace(4, chunk_size=256, mesh=mesh).integrate(
        g, epsrel=1e-4, epsabs=1e-40)
    assert r1.status == 0 and r8.status == 0
    assert r1.iters == r8.iters
    assert r1.nregions == r8.nregions
    assert r1.neval == r8.neval
    np.testing.assert_allclose(r8.estimate, r1.estimate, rtol=1e-12)
    np.testing.assert_allclose(r8.errorest, r1.errorest, rtol=1e-9)


def test_mesh_classifier_and_checkpoint(mesh):
    """Classifier-regime iterations and checkpoint extraction work on the
    per-shard blocked layout."""
    from gpuintegration_tpu import Workspace
    g = genz.f4_gaussian(3)
    ws = Workspace(3, max_pool_regions=2048, chunk_size=256, mesh=mesh)
    r = ws.integrate(g, epsrel=1e-9, epsabs=1e-40, max_iterations=15)
    assert r.iters >= 3
    ck = ws.make_checkpoint()
    assert ck.lows.shape[1] == 3 and ck.lows.shape[0] > 0
    # every checkpointed region is a real box inside the unit cube
    assert (ck.lengths > 0).all() and (ck.lows >= 0).all()
    assert (ck.lows + ck.lengths <= 1 + 1e-12).all()


def test_mesh_continuation_rebalances_shards(mesh):
    """A one-corner-hot integrand refines into a spatial cluster; the
    contiguous resume slicing would land the whole hot set on one shard.
    At the continuation boundary the survivors must be re-dealt so every
    shard's slice carries a near-even error share (SURVEY 2.7's optional
    cross-chip rebalance)."""
    from gpuintegration_tpu import Workspace
    g = genz.f3_corner_peak(3)      # hot at the origin corner
    ws = Workspace(3, chunk_size=256, mesh=mesh)
    r1 = ws.integrate(g, epsrel=1e-10, epsabs=1e-40, max_iterations=7,
                      fused=False)
    assert r1.status == 1
    ck = ws.make_checkpoint()
    assert ck.region_errorests is not None      # mesh host loop stashes
    n = ck.lows.shape[0]
    D = int(mesh.devices.size)
    assert n >= 2 * D
    counts = [n // D + (1 if k < n % D else 0) for k in range(D)]

    def shard_error_shares(ckpt):
        err = np.asarray(ckpt.region_errorests)
        shares, start = [], 0
        for c in counts:                 # _integrate_mesh's contiguous deal
            shares.append(float(err[start:start + c].sum()))
            start += c
        return np.asarray(shares)

    before = shard_error_shares(ck)
    ck_bal = ws._rebalance_checkpoint_for_mesh(ck)
    after = shard_error_shares(ck_bal)
    # same survivors, same total error -- only the deal changed
    assert ck_bal.lows.shape == ck.lows.shape
    np.testing.assert_allclose(after.sum(), before.sum(), rtol=1e-12)
    np.testing.assert_allclose(
        np.sort(np.asarray(ck_bal.lows), axis=0).sum(),
        np.sort(np.asarray(ck.lows), axis=0).sum(), rtol=1e-12)
    # round-robin deal of error-sorted survivors: every shard's share is
    # bounded by mean + hottest-single-region error (indivisible regions
    # make that the best achievable), and the hottest shard never gets
    # worse than the raw spatial deal
    err_all = np.asarray(ck.region_errorests)
    assert after.max() <= after.mean() + float(err_all.max()) * (1 + 1e-9), (
        after, before)
    assert after.max() <= before.max() * (1 + 1e-9)
    assert after.max() / max(after.min(), 1e-300) <= \
        before.max() / max(before.min(), 1e-300)
    # end-to-end: the continuation driver (which applies the rebalance)
    # converges from here
    r2 = ws.integrate_to_convergence(g, epsrel=1e-7, epsabs=1e-40,
                                     max_iterations=12)
    assert r2.status == 0
    assert abs(r2.estimate - g.true_value) <= max(
        5 * r2.errorest, 1e-6 * abs(g.true_value))


def test_mesh_nan_never_reports_success(mesh):
    from gpuintegration_tpu import Workspace
    import jax.numpy as jnp

    def nanf(x0, x1, x2):
        return jnp.where(x0 > 0.5, jnp.nan, 1.0)
    r = Workspace(3, chunk_size=256, mesh=mesh).integrate(
        nanf, epsrel=1e-9, epsabs=1e-40, max_iterations=5)
    assert r.status == 1


def test_vegas_mesh_matches_single_chip(mesh):
    """vegas(mesh=...) with a matched chunk decomposition draws the SAME
    per-chunk PRNG streams as the single-chip run (global-chunk keying),
    so the estimates agree to all-reduce reassociation noise (the f32
    adaptation histogram's psum ordering feeds the grid, hence ~1e-7)."""
    from gpuintegration_tpu.mcubes.vegas import vegas
    g = genz.f4_gaussian(3, a=5.0)
    kw = dict(epsrel=1e-4, ncall=8192.0, total_iters=8, adjust_iters=4,
              seed=3, chunk_cubes=64)   # ncubes=4096 = 8 dev x 8 chunks x 64
    r1 = vegas(g, **kw)
    r8 = vegas(g, **kw, mesh=mesh)
    assert r1.iters == r8.iters
    np.testing.assert_allclose(r8.estimate, r1.estimate, rtol=1e-5)
    np.testing.assert_allclose(r8.errorest, r1.errorest, rtol=1e-3)


def test_vegas_mesh_fast_paths(mesh):
    """The mesh path is the SAME driver: fused frozen phase,
    refine='device' and poly importance all run SPMD and converge."""
    from gpuintegration_tpu.mcubes.vegas import vegas
    g = genz.f4_gaussian(3, a=5.0)
    rd = vegas(g, epsrel=1e-3, ncall=8192.0, total_iters=12, adjust_iters=8,
               seed=3, chunk_cubes=64, mesh=mesh, refine="device")
    assert rd.status == 0
    assert abs(rd.estimate - g.true_value) / g.true_value < 2e-2
    rp = vegas(g, epsrel=1e-3, ncall=8192.0, total_iters=12, adjust_iters=6,
               seed=3, chunk_cubes=64, mesh=mesh, importance="poly")
    assert rp.status == 0
    assert abs(rp.estimate - g.true_value) / g.true_value < 2e-2


def test_mesh_vector_matches_single_chip(mesh):
    """Round-4 item: vector integrands run the mesh host loop
    ((ncomp,) replicated scalar carries psum'd by
    sharded_post_stage_vector, component-major shard-local
    compaction).  The 8-device run must reproduce the single-chip
    vector trajectory (same iterations/regions) with estimates equal
    to psum-reassociation roundoff, per component."""
    from gpuintegration_tpu import Workspace
    comps = [genz.f4_gaussian(3, a=5.0), genz.f1_oscillatory(3)]

    def fv(x):
        return jnp.stack([c(x) for c in comps], axis=-1)

    fv.ndim = 3
    kw = dict(epsrel=1e-6, epsabs=1e-40)
    r1 = Workspace(3, chunk_size=256).integrate(fv, fused=False, **kw)
    r8 = Workspace(3, chunk_size=256, mesh=mesh).integrate(fv, **kw)
    assert r1.status == 0 and r8.status == 0
    assert r1.iters == r8.iters
    assert r1.nregions == r8.nregions
    assert r8.estimates is not None and r8.estimates.shape == (2,)
    np.testing.assert_allclose(np.asarray(r8.estimates),
                               np.asarray(r1.estimates), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r8.errorests),
                               np.asarray(r1.errorests), rtol=1e-9)
    truths = np.array([c.true_value for c in comps])
    rel = np.abs(np.asarray(r8.estimates) - truths) / np.abs(truths)
    assert np.all(rel < 1e-5), rel


def test_mesh_vector_fused_matches_host_loop(mesh):
    """Round-5 item: the vector fused phase runs under shard_map
    ((ncomp,) psum'd carries through the SAME iteration_math_vector).
    Fused and host-loop mesh runs must be iteration-equivalent at the
    scalar discipline's tolerances: same iterations/regions/evals,
    estimates to f64-reassociation roundoff per component."""
    from gpuintegration_tpu import Workspace
    comps = [genz.f4_gaussian(3, a=5.0), genz.f1_oscillatory(3)]

    def fv(x):
        return jnp.stack([c(x) for c in comps], axis=-1)

    fv.ndim = 3
    kw = dict(epsrel=1e-6, epsabs=1e-40)
    rh = Workspace(3, chunk_size=256, mesh=mesh).integrate(
        fv, fused=False, **kw)
    rf = Workspace(3, chunk_size=256, mesh=mesh).integrate(fv, **kw)
    assert rh.status == 0 and rf.status == 0
    assert rh.iters == rf.iters
    assert rh.nregions == rf.nregions
    assert rh.neval == rf.neval
    np.testing.assert_allclose(np.asarray(rf.estimates),
                               np.asarray(rh.estimates), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rf.errorests),
                               np.asarray(rh.errorests), rtol=1e-9)


def test_mesh_vector_checkpoint_and_continuation(mesh):
    """Vector mesh runs checkpoint with the (n, ncomp) stash (the mesh
    keep-indexing transposes the component-major device layout) and the
    convergence driver resumes them across rounds."""
    from gpuintegration_tpu import Workspace
    comps = [genz.f4_gaussian(3, a=5.0), genz.f2_product_peak(3)]

    def fv(x):
        return jnp.stack([c(x) for c in comps], axis=-1)

    fv.ndim = 3
    ws = Workspace(3, chunk_size=256, mesh=mesh)
    # fused=False: the per-region (est, refined) stash is a host-loop
    # sweep artifact -- fused exits carry none (scalar discipline), and
    # since round 5 vector mesh runs take the fused phase by default
    r = ws.integrate(fv, epsrel=1e-8, epsabs=1e-40, max_iterations=4,
                     fused=False)
    assert r.status == 1
    ck = ws.make_checkpoint()
    assert ck.lows.shape[0] > 0
    assert ck.region_errorests is not None
    assert ck.region_errorests.shape == (ck.lows.shape[0], 2)
    ws2 = Workspace(3, chunk_size=256, mesh=mesh)
    r2 = ws2.integrate_to_convergence(
        fv, epsrel=1e-7, epsabs=1e-40, max_iterations=6,
        finish_epsrel_scale=0.4)
    assert r2.status == 0
    truths = np.array([c.true_value for c in comps])
    rel = np.abs(np.asarray(r2.estimates) - truths) / np.abs(truths)
    assert np.all(rel < 1e-6), rel
