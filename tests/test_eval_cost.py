"""Cost-aware dispatch bounding (``eval_cost``).

The per-dispatch eval ceiling (DESIGN.md 3b) is denominated in
Genz-equivalent (cost-1) evals.  Integrands with a large per-eval cost
multiplier -- the 6D interp-table cluster likelihood crashed the remote
TPU worker in ONE full-bucket host-loop rule sweep at a 2M-region pool --
declare ``eval_cost`` so that (a) the host loop's bucket sweep splits
into slab dispatches (workspace._eval_slabs) and (b) the fused-burst /
frozen-phase neval caps shrink proportionally.  Slab decomposition must
be BIT-identical to the single-dispatch sweep: slabs are chunk-aligned,
so per-chunk occupancy and per-region math are unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu import Workspace
from gpuintegration_tpu.integrand import make_integrand
from gpuintegration_tpu.models import genz
from gpuintegration_tpu.pagani import workspace as wsmod
from gpuintegration_tpu.mcubes import vegas as vmod


class TestCostSlabs:
    def test_sizing(self, monkeypatch):
        monkeypatch.setenv("GPUINT_TPU_FUSED_EVALS_PER_DISPATCH", "1e6")
        ws = Workspace(3, chunk_size=1024)          # feval(3) = 33
        feval = ws._feval
        # cost 1: 8192 * feval = 270k <= 1e6 -> one dispatch
        assert ws._cost_slabs(8192) == 1
        # cost pushes it 3x past the ceiling -> next pow2 = 4 slabs
        ws.eval_cost = 3e6 / (8192 * feval)
        assert ws._cost_slabs(8192) == 4
        # huge cost clamps at cap/chunk (the in-dispatch chunk grain)
        ws.eval_cost = 1e12
        assert ws._cost_slabs(8192) == 8
        # sub-1 cost never raises the ceiling (k identical to cost 1)
        ws.eval_cost = 1e-6
        assert ws._cost_slabs(8192) == 1

    @pytest.mark.parametrize("blocked,n", [(False, 5000), (False, 8192),
                                           (True, 5000), (True, 2048)])
    def test_slab_sweep_bitwise(self, monkeypatch, blocked, n):
        """Slab-split bucket sweep == single-dispatch sweep, bitwise,
        for contiguous and blocked layouts at chunk-interior region
        counts (partially occupied boundary chunks included)."""
        f, _ = make_integrand(genz.f4_gaussian(3, a=5.0), 3)
        cap = 8192
        rng = np.random.default_rng(7)
        lows = jnp.asarray(rng.uniform(0.0, 0.8, (3, cap)))
        lengths = jnp.asarray(np.full((3, cap), 0.125))
        gl = jnp.zeros((3,))
        gr = jnp.ones((3,))
        ws1 = Workspace(3, chunk_size=1024)
        single = ws1._eval_pool(f, lows, lengths, gl, gr,
                                n=jnp.asarray(n, jnp.int32),
                                blocked=blocked, n_host=n)
        monkeypatch.setenv("GPUINT_TPU_FUSED_EVALS_PER_DISPATCH", "1e6")
        ws4 = Workspace(3, chunk_size=1024,
                        eval_cost=3e6 / (cap * ws1._feval))
        assert ws4._cost_slabs(cap) == 4
        slabbed = ws4._eval_pool(f, lows, lengths, gl, gr,
                                 n=jnp.asarray(n, jnp.int32),
                                 blocked=blocked, n_host=n)
        for a, b in zip(single, slabbed):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_integrate_equivalence_host_loop(self, monkeypatch):
        """End-to-end host-loop run with a cost forcing maximal slab
        splitting matches the cost-1 run exactly."""
        g = genz.f4_gaussian(3, a=5.0)
        r1 = Workspace(3, chunk_size=1024).integrate(
            g, epsrel=1e-6, epsabs=1e-40, fused=False)
        monkeypatch.setenv("GPUINT_TPU_FUSED_EVALS_PER_DISPATCH", "1e5")
        r2 = Workspace(3, chunk_size=1024, eval_cost=50.0).integrate(
            g, epsrel=1e-6, epsabs=1e-40, fused=False)
        assert (r1.status, r1.iters, r1.neval, r1.nregions) == \
               (r2.status, r2.iters, r2.neval, r2.nregions)
        assert r1.estimate == r2.estimate
        assert r1.errorest == r2.errorest

    def test_integrate_equivalence_fused(self, monkeypatch):
        """The cost-scaled fused-burst neval cap only changes WHERE the
        burst exits to the host (the gate-crossing resume is
        bit-identical), so the full fused trajectory is unchanged."""
        g = genz.f4_gaussian(3, a=5.0)
        rh = Workspace(3, chunk_size=1024).integrate(
            g, epsrel=1e-6, epsabs=1e-40, fused=False)
        monkeypatch.setenv("GPUINT_TPU_FUSED_EVALS_PER_DISPATCH", "2e5")
        rf = Workspace(3, chunk_size=1024, eval_cost=7.0).integrate(
            g, epsrel=1e-6, epsabs=1e-40, fused=True)
        assert (rh.status, rh.iters, rh.neval, rh.nregions) == \
               (rf.status, rf.iters, rf.neval, rf.nregions)
        assert abs(rh.estimate - rf.estimate) <= 1e-12 * abs(rh.estimate)

    def test_vector_integrand_slabbed(self, monkeypatch):
        """Slab splitting through the vector path (ncomp-major outputs
        concatenate on the region axis)."""
        def fv(x):
            s = jnp.sum(x, axis=-1)
            return jnp.stack([jnp.exp(-s), jnp.cos(s)], axis=-1)

        r1 = Workspace(3, chunk_size=1024).integrate(
            fv, epsrel=1e-5, epsabs=1e-40)
        monkeypatch.setenv("GPUINT_TPU_FUSED_EVALS_PER_DISPATCH", "1e5")
        r2 = Workspace(3, chunk_size=1024, eval_cost=50.0).integrate(
            fv, epsrel=1e-5, epsabs=1e-40)
        assert (r1.status, r1.neval, r1.nregions) == \
               (r2.status, r2.neval, r2.nregions)
        assert np.array_equal(np.asarray(r1.estimates),
                              np.asarray(r2.estimates))


class TestVegasEvalCost:
    def test_iters_per_dispatch_scaling(self, monkeypatch):
        monkeypatch.setenv("GPUINT_TPU_FROZEN_EVALS_PER_DISPATCH", "5e9")
        assert vmod._iters_per_dispatch(1e6) == 5000
        assert vmod._iters_per_dispatch(1e6, eval_cost=100.0) == 50
        assert vmod._iters_per_dispatch(1e6, eval_cost=0.01) == 5000
        assert vmod._iters_per_dispatch(1e9, eval_cost=100.0) == 1

    def test_frozen_phase_slicing_equivalence(self):
        """eval_cost forcing one-iteration frozen slices reproduces the
        unsliced run exactly (the slice resume is bit-identical)."""
        g = genz.f4_gaussian(3, a=5.0)
        r1 = vmod.vegas(g, epsrel=1e-3, epsabs=1e-40, ncall=2e4,
                        total_iters=10, adjust_iters=5, seed=3)
        r2 = vmod.vegas(g, epsrel=1e-3, epsabs=1e-40, ncall=2e4,
                        total_iters=10, adjust_iters=5, seed=3,
                        eval_cost=1e9)
        assert r1.estimate == r2.estimate
        assert r1.errorest == r2.errorest
        assert (r1.status, r1.neval) == (r2.status, r2.neval)


class TestMeasureEvalCost:
    def test_probe_returns_sane_ratio(self):
        """A trivial integrand probes ~1 (clamped); the probe runs on
        whatever backend is live (CPU under pytest)."""
        cost = wsmod.measure_eval_cost(
            lambda x, y, z: x + y + z, 3, probe_regions=4096)
        assert 1.0 <= cost < 40.0   # CPU timing noise tolerance (x2 margin)

    def test_probe_applies_safety_margin(self):
        """The x2 (default) safety margin is applied IN the probe: the
        dispatch-ceiling consumer must get a conservative cost without
        relying on caller discipline.  Pinned by comparing margins on
        identical timings -- margin scales the returned ratio."""
        kw = dict(probe_regions=4096, trials=3)
        c1 = wsmod.measure_eval_cost(
            lambda x, y, z: x + y + z, 3, margin=1.0, **kw)
        c8 = wsmod.measure_eval_cost(
            lambda x, y, z: x + y + z, 3, margin=800.0, **kw)
        # a huge margin must dominate timing noise: ratio >= 40x even if
        # the unmargined probe wobbles by 20x run-to-run on a loaded box
        assert c8 >= 40.0 * c1
        with pytest.raises(ValueError):
            wsmod.measure_eval_cost(lambda x, y, z: x, 3, margin=0.5)
