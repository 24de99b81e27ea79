"""Crease-aware splitting (rule_eval._split_fraction + Workspace
crease_split=True).

Beyond-reference capability: the reference splits at midpoints only
(Sub_region_splitter.cuh:56-87), so a C0 kink OFF the dyadic grid can
never be isolated; the crease-aware path detects the kink from the
rule's own collinear samples and guillotines a smooth slab next to it
with a safety margin (the margin is load-bearing: an exact cut parks
the kink in the rule's sampling blind zone and freezes an invisible
bias -- measured and documented in rule_eval._split_fraction).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu import Workspace
from gpuintegration_tpu.models import genz
from gpuintegration_tpu.ops import rule_eval


def _frac_for(f, ndim=2, lo=None, ln=None):
    tables = rule_eval.rule_tables(ndim, "float64")
    gl = jnp.zeros(ndim)
    gr = jnp.ones(ndim)
    lo = jnp.zeros((ndim, 1)) if lo is None else lo
    ln = jnp.ones((ndim, 1)) if ln is None else ln
    _, _, sd, fr = rule_eval.apply_rule(f, tables, lo, ln, gl, gr,
                                        with_split_frac=True)
    return int(sd[0]), float(fr[0])


class TestSplitFractionEstimator:
    def test_inner_gap_kink_detected_with_margin(self):
        sd, fr = _frac_for(
            lambda x: jnp.exp(-6.0 * jnp.abs(x[..., 0] - 0.37))
            * (1.0 + 0.2 * x[..., 1]))
        assert sd == 0
        # cut = estimated kink (~0.34 for this flank curvature) offset
        # 0.08 toward the center: smooth slab shaved, kink kept visible
        assert fr != 0.5
        assert 0.3 < fr < 0.48

    def test_smooth_cases_stay_midpoint(self):
        cases = [
            lambda x: jnp.exp(-5.0 * jnp.sum((x - 0.5) ** 2, axis=-1)),
            lambda x: jnp.exp(-3.0 * x[..., 0] - 2.0 * x[..., 1]),
            lambda x: jnp.cos(3.0 * x[..., 0] + 2.0 * x[..., 1]),
            lambda x: (1.0 + x[..., 0] + 2.0 * x[..., 1]) ** -3,
        ]
        for i, f in enumerate(cases):
            _, fr = _frac_for(f)
            assert fr == 0.5, (i, fr)

    def test_outer_gap_kink_rejected(self):
        # kink at 0.1 is outside the +-0.203 inner sample gap: one
        # ordinary bisection funnels it inside; no cut yet
        _, fr = _frac_for(
            lambda x: jnp.exp(-6.0 * jnp.abs(x[..., 0] - 0.1))
            * (1.0 + 0.2 * x[..., 1]))
        assert fr == 0.5

    def test_grid_aligned_kink_never_interior(self):
        # the standard Genz f5 (b=0.5) keeps its crease on dyadic cell
        # boundaries forever, so the estimator must stay silent on the
        # top-level cell (nothing to cut; the run is bit-identical to
        # midpoint splitting)
        g = genz.f5_c0_continuous(2)
        _, fr = _frac_for(lambda x: g(x))
        assert fr == 0.5


class TestCreaseSplitIntegration:
    def test_off_grid_kink_honest_and_cheaper(self):
        """3D C0 kink at b=0.37 (off-dyadic): the crease path must (a)
        certify status 0, (b) stay HONEST (true error within the
        certified tolerance band), and (c) beat midpoint bisection's
        evaluation count at a deep tolerance."""
        g = genz.f5_c0_continuous(3, a=10.0, b=0.37)
        kw = dict(epsrel=1e-9, epsabs=1e-40, fused=False,
                  max_iterations=80)
        ws = Workspace(3, chunk_size=1024)
        r_mid = ws.integrate(g, crease_split=False, **kw)
        r_crease = ws.integrate(g, crease_split=True, **kw)
        for r in (r_mid, r_crease):
            assert r.status == 0
            rel = abs(r.estimate - g.true_value) / g.true_value
            # honest certificate: true error within ~3x the target
            assert rel < 3e-9, rel
        assert r_crease.neval < 0.8 * r_mid.neval, (
            r_crease.neval, r_mid.neval)

    def test_smooth_integrand_bit_identical(self):
        """No confident kink -> every fraction is exactly 0.5 and
        lengths*0.5 == lengths - lengths*0.5, so the trajectory is
        bit-identical to the midpoint path."""
        g = genz.f4_gaussian(3, a=5.0)
        kw = dict(epsrel=1e-6, epsabs=1e-40, fused=False)
        r_mid = Workspace(3, chunk_size=1024).integrate(
            g, crease_split=False, **kw)
        r_crease = Workspace(3, chunk_size=1024).integrate(
            g, crease_split=True, **kw)
        assert (r_mid.status, r_mid.iters, r_mid.neval, r_mid.nregions) \
            == (r_crease.status, r_crease.iters, r_crease.neval,
                r_crease.nregions)
        assert r_mid.estimate == r_crease.estimate
        assert r_mid.errorest == r_crease.errorest

    def test_fused_matches_host_loop(self):
        """crease_split through the fused on-device phase (round 4): the
        cut-fraction vector rides the while_loop carry, so a fused crease
        run must reproduce the host-loop trajectory exactly -- same
        discipline as the scalar fused/host equivalence (both trace
        workspace.iteration_math + the same _split_fraction)."""
        g = genz.f5_c0_continuous(3, a=10.0, b=0.37)
        kw = dict(epsrel=1e-7, epsabs=1e-40, crease_split=True,
                  max_iterations=60)
        r_host = Workspace(3, chunk_size=1024).integrate(
            g, fused=False, **kw)
        r_fused = Workspace(3, chunk_size=1024).integrate(
            g, fused=True, **kw)
        assert (r_host.status, r_host.iters, r_host.neval,
                r_host.nregions) == (r_fused.status, r_fused.iters,
                                     r_fused.neval, r_fused.nregions)
        # same tolerances as the scalar fused/host discipline
        # (test_workspace_features.TestFusedAdaptivePhase._compare):
        # estimates to 1e-12, errorest to reassociation-level 1e-9
        np.testing.assert_allclose(r_fused.estimate, r_host.estimate,
                                   rtol=1e-12)
        np.testing.assert_allclose(r_fused.errorest, r_host.errorest,
                                   rtol=1e-9)
        rel = abs(r_fused.estimate - g.true_value) / g.true_value
        assert r_fused.status == 0 and rel < 3e-7

    def test_rejected_modes(self):
        g = genz.f4_gaussian(2)
        with pytest.raises(ValueError, match="crease_split"):
            Workspace(2, chunk_size=256).integrate(
                g, epsrel=1e-3, crease_split=True, vegas_assisted=True)

    def test_mesh_matches_single_chip(self):
        """crease/jump splitting on the mesh (round 5): the cut fraction
        rides sharded_compact_split's extra= payload and the fused mesh
        carry; the stencil and the split are shard-local, so an 8-device
        crease run must reproduce the single-chip trajectory (same
        iterations/regions/evals, estimates to psum-reassociation
        roundoff) -- the scalar mesh discipline's tolerances."""
        import jax
        from gpuintegration_tpu.parallel.mesh import make_mesh
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device backend")
        mesh = make_mesh()
        g = genz.f5_c0_continuous(3, a=10.0, b=0.37)
        kw = dict(epsrel=1e-7, epsabs=1e-40, crease_split=True,
                  max_iterations=60)
        r1 = Workspace(3, chunk_size=256).integrate(g, **kw)
        r8 = Workspace(3, chunk_size=256, mesh=mesh).integrate(g, **kw)
        assert (r1.status, r1.iters, r1.neval, r1.nregions) == \
            (r8.status, r8.iters, r8.neval, r8.nregions)
        np.testing.assert_allclose(r8.estimate, r1.estimate, rtol=1e-12)
        np.testing.assert_allclose(r8.errorest, r1.errorest, rtol=1e-9)
        rel = abs(r8.estimate - g.true_value) / g.true_value
        assert r8.status == 0 and rel < 3e-7

    def test_mesh_host_loop_crease(self):
        """Same equivalence through the mesh HOST loop (fused=False):
        sharded_eval_stage returns the fraction vector and
        sharded_compact_split consumes it."""
        import jax
        from gpuintegration_tpu.parallel.mesh import make_mesh
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device backend")
        mesh = make_mesh()
        g = genz.f5_c0_continuous(2, a=10.0, b=0.37)
        kw = dict(epsrel=1e-8, epsabs=1e-40, crease_split=True,
                  fused=False, max_iterations=40)
        r1 = Workspace(2, chunk_size=256).integrate(g, **kw)
        r8 = Workspace(2, chunk_size=256, mesh=mesh).integrate(g, **kw)
        assert (r1.status, r1.iters, r1.neval, r1.nregions) == \
            (r8.status, r8.iters, r8.neval, r8.nregions)
        np.testing.assert_allclose(r8.estimate, r1.estimate, rtol=1e-12)
        np.testing.assert_allclose(r8.errorest, r1.errorest, rtol=1e-9)

    def test_continuation_inherits_crease_split(self):
        """integrate_to_convergence forwards crease_split through
        resume rounds (kw passthrough)."""
        g = genz.f5_c0_continuous(2, a=10.0, b=0.37)
        ws = Workspace(2, chunk_size=256)
        r = ws.integrate_to_convergence(
            g, epsrel=1e-8, epsabs=1e-40, max_iterations=6,
            crease_split=True, fused=False)
        assert r.status == 0
        rel = abs(r.estimate - g.true_value) / g.true_value
        assert rel < 3e-8


class TestJumpSplit:
    """Jump (step) detection on the same collinear stencil (round 4,
    VERDICT r3 #3): a step inside an inner sample gap dominates every
    flank secant and breaks the geometric slope progression; confident
    jumps override the bisection dimension (normal-to-surface splits
    keep the straddler count fixed) and cut at the suspect gap's edge
    plus the sound blind-zone margin."""

    def test_jump_detected_both_inner_gaps(self):
        sd, fr = _frac_for(
            lambda x: jnp.where(x[..., 0] <= 0.4,
                                jnp.exp(x[..., 0] + 0.2 * x[..., 1]), 0.0))
        assert (sd, fr) == (0, 0.58)        # H1j: gap edge 0 + margin
        sd, fr = _frac_for(
            lambda x: jnp.where(x[..., 0] <= 0.6,
                                jnp.exp(x[..., 0] + 0.2 * x[..., 1]), 0.0))
        assert (sd, fr) == (0, 0.42)        # H2j mirrored

    def test_jump_overrides_split_dim(self):
        """Strong smooth curvature on dim 0 would win the fourth
        difference; a confident jump on dim 1 must take the split."""
        sd, fr = _frac_for(
            lambda x: jnp.exp(-30.0 * (x[..., 0] - 0.5) ** 2)
            * jnp.where(x[..., 1] <= 0.6, 1.0, 0.0))
        assert sd == 1 and fr == 0.42

    def test_steep_smooth_and_kinks_stay_silent(self):
        """Steep exponentials (geometric slope progression) and C0
        kinks (gap secant between its flanks) must not read as jumps."""
        for f in (lambda x: jnp.exp(-8.0 * x[..., 0] - 2.0 * x[..., 1]),
                  lambda x: jnp.exp(8.0 * x[..., 0] + 2.0 * x[..., 1])):
            _, fr = _frac_for(f)
            assert fr == 0.5
        sd, fr = _frac_for(
            lambda x: jnp.exp(-6.0 * jnp.abs(x[..., 0] - 0.37))
            * (1.0 + 0.2 * x[..., 1]))
        assert 0.3 < fr < 0.48 and fr not in (0.42, 0.58)  # kink cut kept

    def test_detection_strengthens_as_regions_shrink(self):
        """f6-style steep branches (exp coefficient 10) hide the jump at
        the top level (branch slope > jump secant -- dominance gate shut)
        but a quarter-size cell around the jump fires; this is the
        deep-generation regime where the straddler population explodes."""
        f = lambda x: jnp.where(x[..., 0] <= 0.45,                # noqa: E731
                                jnp.exp(10 * x[..., 0] + x[..., 1]), 0.0)
        _, fr_top = _frac_for(f)
        assert fr_top == 0.5
        lo = jnp.asarray([[0.375], [0.5]])
        ln = jnp.asarray([[0.25], [0.25]])
        _, fr_deep = _frac_for(f, lo=lo, ln=ln)
        assert fr_deep == 0.58

    def test_f6_3d_honest_with_jump_split(self):
        """End to end on the real Genz f6 (off-dyadic thresholds): the
        jump-aware path must certify with a TRUE error inside the band
        (the margin cut never parks a jump in a child's blind zone)."""
        from gpuintegration_tpu.models import genz
        g = genz.f6_discontinuous(3)
        ws = Workspace(3, chunk_size=1024)
        r = ws.integrate_to_convergence(g, epsrel=1e-6, epsabs=1e-40,
                                        max_wall_s=180.0,
                                        crease_split=True)
        assert r.status == 0
        rel = abs(r.estimate - g.true_value) / abs(g.true_value)
        assert rel < 3e-6, rel
