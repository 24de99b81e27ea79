"""Batched Genz-Malik rule application over a region pool.

TPU-native re-expression of the reference's PHASE1 sampling kernel
(reference: cuda/pagani/quad/GPUquad/Phases.cuh:301-404 INTEGRATE_GPU_PHASE1;
Sample.cuh:103-290 SampleRegionBlock/computePermutation).  Instead of one
CUDA block per region with 64 threads strided over rule points, we evaluate
*all rule points of all regions at once*:

  x[r, p, d] = global_lo[d] + (center[r,d] - gen[p,d] * len[r,d]) * range[d]
  vals[r, p] = f(x[r, p, :]) * jacobian          (jacobian = prod(range))
  sums[r, :] = vals @ W                          (one MXU matmul, W: feval x 5)

then the fourth-difference bisection dimension (Sample.cuh:194-218), the
null-rule error model (Sample.cuh:264-288), and the per-region estimate.

Memory is bounded by evaluating the region axis in fixed-size chunks with
``lax.map`` so the (chunk, feval) intermediate stays small; the caller picks
chunk size from a VMEM/HBM budget.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.ops.genz_malik import NRULES, genz_malik_rule

# Error-gate coefficients of the CUHRE error model (Sample.cuh:283).
_ERRCOEFF = (5.0, 1.0, 5.0)


@dataclasses.dataclass(frozen=True)
class RuleTables:
    """Constant tables for one (ndim, dtype) pair.

    Held as NumPy so the lru_cache stays trace-free (building jnp arrays
    while a jit trace is active would poison the cache with tracers);
    jnp.asarray at the use site embeds them as XLA constants."""

    ndim: int
    feval: int            # true number of rule points
    feval_padded: int     # padded to a lane multiple for MXU tiling
    gen: np.ndarray       # (feval_padded, ndim) signed abscissae
    wts: np.ndarray       # (feval_padded, NRULES)
    orbit_wts: np.ndarray  # (NSETS, NRULES) per-orbit weights
    orbit_bounds: tuple   # NSETS+1 point-axis offsets of the orbit segments
    scale: np.ndarray     # (NSETS, NRULES)
    norm: np.ndarray      # (NSETS, NRULES)
    ratio: float


@functools.lru_cache(maxsize=None)
def rule_tables(ndim: int, dtype_name: str = "float64") -> RuleTables:
    dtype = np.dtype(dtype_name)
    rule = genz_malik_rule(ndim)
    pts, wts = rule.padded(128)
    return RuleTables(
        ndim=ndim,
        feval=rule.feval,
        feval_padded=pts.shape[0],
        gen=np.asarray(pts, dtype=dtype),
        wts=np.asarray(wts, dtype=dtype),
        orbit_wts=np.asarray(rule.orbit_weights, dtype=dtype),
        orbit_bounds=tuple(int(b) for b in
                           np.concatenate([[0], np.cumsum(rule.counts)])),
        scale=np.asarray(rule.scale, dtype=dtype),
        norm=np.asarray(rule.norm, dtype=dtype),
        ratio=float(rule.ratio),
    )


def _eval_chunk(
    f: Callable[[jax.Array], jax.Array],
    tables: RuleTables,
    lows: jax.Array,       # (ndim, C) region lower bounds, unit space
    lengths: jax.Array,    # (ndim, C) region lengths, unit space
    global_lo: jax.Array,  # (ndim,)
    global_range: jax.Array,  # (ndim,)
    with_split_frac: bool = False,
):
    """Apply the rule to a chunk of C regions (dims-major pools -- see
    region_pool.py for the TPU layout rationale).

    Returns (estimate (C,), errorest (C,), split_dim (C,) int32); with
    ``with_split_frac`` also the crease-aware split fraction (C,)
    (_split_fraction -- 0.5 wherever no kink is detected).
    ``f`` must be batched: maps (..., ndim) -> (...).
    """
    ndim = tables.ndim
    dtype = lows.dtype
    # Point mapping parity with Sample.cuh:126-131:
    #   x = gl + ((.5+g)*lower + (.5-g)*upper) * range
    #     = gl + (center - g*length) * range
    # Pre-scaled into global space on the cheap (ndim, C) arrays so the big
    # (C, P) planes see 2 f64 ops per point-dim (one mul, one sub) instead
    # of 4 -- f64 elementwise is ~5x f32 on TPU (XLA emulation), so halving
    # the plane work matters.  Built per dimension as (C, P) planes so no
    # (..., ndim)-minor array is ever resident; the stack into the
    # integrand's (..., ndim) convention fuses into its elementwise chain.
    len_g = lengths * global_range[:, None]                # (ndim, C)
    center_g = global_lo[:, None] + (lows + 0.5 * lengths) * \
        global_range[:, None]                              # (ndim, C)
    planes = []
    for d in range(ndim):
        planes.append(
            center_g[d][:, None]
            - tables.gen[None, :, d] * len_g[d][:, None])  # (C, P)
    x = jnp.stack(planes, axis=-1)                         # (C, P, ndim)
    jacobian = jnp.prod(global_range)
    # The jacobian scale is applied to the tiny (C, NRULES) rule sums below,
    # not the (C, P) value plane (the fourth-difference bisection logic is
    # invariant under positive scaling of vals).
    vals = f(x).astype(dtype)                              # (C, P)

    # Five embedded rule sums.  The rule is fully symmetric: the weight of a
    # point depends only on its orbit (9 orbits, genz_malik._rule_weights),
    # and the point list is orbit-contiguous.  So instead of a (P, NRULES)
    # per-point contraction, reduce each orbit segment (1 add/point, exact
    # in the working dtype) and combine with the tiny (NSETS, NRULES)
    # orbit-weight table.  Null-rule cancellation behaviour is unchanged:
    # the sums are the same values up to summation-order reassociation.
    # This is the fastest correct form in BOTH dtypes: the f64 per-point
    # dot_general is 5x-emulated, and the f32 MXU matmul truncates
    # operands to bf16 by default (fatal to the cancelling null-rule
    # residues) while Precision.HIGHEST costs 3 passes -- measured 2.7e9
    # vs 7.5e9 evals/s for the segment sums at 8D f32.
    ob = tables.orbit_bounds
    orbit_sums = jnp.stack(
        [jnp.sum(vals[:, ob[s]:ob[s + 1]], axis=1)
         for s in range(len(ob) - 1)], axis=1)              # (C, NSETS)
    sums = jnp.sum(
        orbit_sums[:, :, None] * tables.orbit_wts[None, :, :], axis=1)
    sums = sums * jacobian

    # Fourth-difference bisection dimension (Sample.cuh:194-218):
    # diff_d = |2(1-ratio) f0 + ratio (f1p+f1m) - (f2p+f2m)| where the a1
    # orbit occupies points 1..2n (pairs per dim) and the a2 orbit 2n+1..4n.
    f0 = vals[:, 0]                                        # (C,)
    orbit1 = vals[:, 1:1 + 2 * ndim].reshape(-1, ndim, 2).sum(-1)   # (C, n)
    orbit2 = vals[:, 1 + 2 * ndim:1 + 4 * ndim].reshape(-1, ndim, 2).sum(-1)
    ratio = jnp.asarray(tables.ratio, dtype)
    fourth_diff = jnp.abs(
        (2.0 * (1.0 - ratio)) * f0[:, None] + ratio * orbit1 - orbit2)
    # Reference semantics: strict '>' scan starting from maxdiff=0 with
    # fallback to the widest dimension, so when every diff is 0 (or NaN) the
    # widest dim is used; otherwise first-argmax wins (Sample.cuh:202-218).
    widest = jnp.argmax(lengths, axis=0).astype(jnp.int32)
    best = jnp.argmax(fourth_diff, axis=1).astype(jnp.int32)
    any_positive = jnp.max(fourth_diff, axis=1) > 0
    split_dim = jnp.where(any_positive, best, widest)

    # Null-rule error model (Sample.cuh:264-288): for r in {1,2,3},
    # e_r = max_s |S[r+1] + scale[s,r]*S[r]| * norm[s,r].
    s_r = sums[:, 1:4]                                     # (C, 3)
    s_r1 = sums[:, 2:5]                                    # (C, 3)
    # scale/norm columns 1..3 -> (NSETS, 3)
    sc = tables.scale[:, 1:4]
    nm = tables.norm[:, 1:4]
    errs = jnp.max(
        jnp.abs(s_r1[:, None, :] + sc[None, :, :] * s_r[:, None, :])
        * nm[None, :, :],
        axis=1,
    )                                                      # (C, 3)
    e1, e2, e3 = errs[:, 0], errs[:, 1], errs[:, 2]
    gated = jnp.where(
        (_ERRCOEFF[0] * e1 <= e2) & (_ERRCOEFF[0] * e2 <= e3),
        _ERRCOEFF[1] * e1,
        _ERRCOEFF[2] * jnp.maximum(jnp.maximum(e1, e2), e3),
    )

    vol = jnp.prod(lengths, axis=0)                        # unit-space volume
    estimate = vol * sums[:, 0]
    errorest = vol * gated
    if with_split_frac:
        frac, split_dim = _split_fraction(tables, vals, split_dim)
        return estimate, errorest, split_dim, frac
    return estimate, errorest, split_dim


def _split_fraction(tables: RuleTables, vals, split_dim):
    """Crease- and jump-aware split fraction along the chosen dimension.

    Returns ``(frac, split_dim)``: the per-region cut fraction AND a
    possibly-overridden bisection dimension.  Two detectors share the
    collinear five-point stencil per axis:

    * C0 KINKS (|x - t|): secant-line intersection with four measured
      false-positive gates; cut at the estimated crease offset by the
      blind-zone margin (details below).  No dimension override.
    * C-1 JUMPS (steps -- round 4, VERDICT r3 #3): a step inside an
      inner sample gap makes that gap's secant FAR steeper than every
      flank secant (slope ~ jump/gap vs the branches' O(f')), while the
      far flank stays straight (both its samples ride one smooth
      branch) -- the signature "near-zero secant-slope disagreement on
      both flanks but a large value gap between adjacent samples".
      Smooth steep exponentials grow their slope monotonically (the
      gap secant sits BETWEEN its neighbours), and a kink's gap secant
      is a convex combination of the flank slopes, so neither fires
      the 4x-outlier gate (tested in tests/test_crease_split.py).
      When a jump is confident, TWO actions follow: (a) the cut lands
      at the suspect gap's center-side edge offset by the same sound
      margin INTO the smooth side, so the jump child keeps the whole
      gap with >= margin boundary clearance (the 3a-ii blind-zone
      argument transfers unchanged) and the other child is provably
      smooth; (b) the bisection dimension is OVERRIDDEN to the
      strongest-jump axis.  The override is the load-bearing part for
      discontinuous integrands: the total straddling-error mass is
      jump x (surface area x normal width), and only NORMAL cuts
      shrink it -- but on f6-style integrands with large smooth
      exponents the tangential fourth differences out-compete the jump
      for many generations, so midpoint straddlers split TANGENTIALLY
      and the straddler count multiplies ~2^(d-1) per sweep (the f6 8D
      1e-6 wall anatomy, docs/VALIDATION.md 2b).  Splitting straddlers
      normal to the surface keeps their count fixed while the stored
      jump error halves per generation.

    The degree-9 rule has no convergence order across a C0 crease
    (|x - t| kink), so midpoint bisection drains crease regions at a
    population-growth-limited rate (the f5 8D certificate wall,
    docs/VALIDATION.md 2b).  The rule already samples 5 collinear
    points along every axis (center f0, +-a per-dim orbit 1, +-b orbit
    2, a < b); a kink between two sample points breaks the local
    linearity, and intersecting the straight secant lines on either
    side of the suspect gap locates the crease.  Splitting THERE
    (instead of at the midpoint) makes BOTH children smooth, restoring
    the rule's full order in one cut; a kink in the outer gaps
    (|x| > a) is funneled into a child's inner gap by one ordinary
    bisection, so every straddler is localizable within ~2 generations.

    Two gap hypotheses cover the inner range: kink in (-a, 0) -- left
    line through (-b, -a), right line through (0, +a); kink in (0, +a)
    -- mirrored.  Confidence gates: the two lines must disagree
    strongly (a kink bends the slope; smooth integrands agree to
    O(h^2)) and the intersection must land inside its hypothesis gap.

    Positions are in length units relative to the region center
    (x = center - gen*length, so slot p sits at -gen[p, d]).  Per-dim
    candidates are combined by a one-hot contraction over the (tiny)
    dim axis -- no pool-sized dynamic gathers (docs/DESIGN.md layout
    invariants).

    frac is in [0.12, 0.88]; exactly 0.5 (and split_dim unchanged)
    wherever neither detector is confident (region_pool.split with
    frac=0.5 is bit-identical to the midpoint path)."""
    ndim = tables.ndim
    dtype = vals.dtype
    f0 = vals[:, 0]

    def _intersect(xl, vl, sl, xr, vr, sr):
        # line L through (xl, vl) slope sl; line R through (xr, vr)
        # slope sr; returns (x*, |sl - sr|, slope scale)
        denom = sl - sr
        xstar = (vr - vl + sl * xl - sr * xr) / jnp.where(
            denom == 0.0, 1.0, denom)
        return xstar, jnp.abs(denom), jnp.abs(sl) + jnp.abs(sr)

    fr_d, jfr_d, jstr_d = [], [], []
    for d in range(ndim):
        p1, p2 = 1 + 2 * d, 2 + 2 * d
        q1, q2 = 1 + 2 * ndim + 2 * d, 2 + 2 * ndim + 2 * d
        pts = []
        for slot in (p1, p2, q1, q2):
            pts.append((-float(tables.gen[slot, d]), slot))
        pts.sort()                       # positions ascending
        (xbm, sbm), (xam, sam), (xap, sap), (xbp, sbp) = pts
        vbm, vam = vals[:, sbm], vals[:, sam]
        vap, vbp = vals[:, sap], vals[:, sbp]
        g1 = (vam - vbm) / (xam - xbm)          # (-b, -a) secant
        g2 = (f0 - vam) / (0.0 - xam)           # (-a, 0) secant
        g3 = (vap - f0) / xap                   # (0, +a) secant
        g4 = (vbp - vap) / (xbp - xap)          # (+a, +b) secant

        # H1: kink in (-a, 0): left line = outer-left secant anchored
        # at (-a, vam); right line = (0, +a) secant anchored at (0, f0)
        x1, dn1, sc1 = _intersect(xam, vam, g1, 0.0, f0, g3)
        # straightness gate: a KINK leaves the far side linear
        # (g3 ~ g4); smooth curvature (e.g. a parabola's vertex) breaks
        # the center slope just as hard but bends the far side too
        straight1 = jnp.abs(g4 - g3) < 0.5 * dn1
        # decay gate: away from a crease the slope magnitude does not
        # GROW (|x-t| with convex decay flanks); a smooth extremum has
        # slope ~0 at the apex growing outward, which is the false
        # positive this rejects (measured: a centered Gaussian bump
        # passed the first two gates)
        decay1 = jnp.abs(g3) >= 0.9 * jnp.abs(g4)
        # ridge gate: the crease is a local extremum along the axis, so
        # the flanking slopes have OPPOSITE signs; a steep monotone
        # exponential varies its slope fast enough to pass the break
        # gate but never flips sign (measured false positive)
        flip1 = g1 * g3 < 0.0
        ok1 = ((dn1 > 0.5 * sc1) & (sc1 > 0.0) & straight1 & decay1
               & flip1 & (x1 > xam) & (x1 < 0.0))
        # H2: kink in (0, +a)
        x2, dn2, sc2 = _intersect(0.0, f0, g2, xap, vap, g4)
        straight2 = jnp.abs(g2 - g1) < 0.5 * dn2
        decay2 = jnp.abs(g2) >= 0.9 * jnp.abs(g1)
        flip2 = g2 * g4 < 0.0
        ok2 = ((dn2 > 0.5 * sc2) & (sc2 > 0.0) & straight2 & decay2
               & flip2 & (x2 > 0.0) & (x2 < xap))
        # prefer the hypothesis with the stronger (relative) slope break
        rel1 = jnp.where(ok1, dn1 / jnp.where(sc1 == 0.0, 1.0, sc1), -1.0)
        rel2 = jnp.where(ok2, dn2 / jnp.where(sc2 == 0.0, 1.0, sc2), -1.0)
        xstar = jnp.where(rel1 >= rel2, x1, x2)
        ok = ok1 | ok2
        # Guillotine with a safety margin: cutting exactly AT the
        # estimated crease parks the true kink within the estimator
        # error delta of a child BOUNDARY -- inside the rule's blind
        # zone (no samples beyond +-b ~ 0.47 length units), where its
        # residual bias is invisible and the child retires with a
        # frozen systematic error (measured: 2.2e-7 plateau on the 3D
        # off-grid kink regardless of epsrel).  Offsetting the cut by
        # MARGIN toward the region center shaves off a provably-smooth
        # slab instead: the kink stays MARGIN-delta > blind-zone-width
        # inside the other child, fully visible to its samples, and the
        # next generation re-localizes it with a geometrically better
        # estimate.  MARGIN = 0.08 length units > delta_max (~0.05
        # measured) + blind zone (0.03).
        #
        # An "exact" cut AT the estimated crease was tried and is
        # fundamentally unsound for a CERTIFYING integrator: any
        # position error delta (measured 0.005-0.04, shrinking with
        # flank curvature but never zero) parks the kink in the blind
        # zone, and the frozen bias plateaus the true error (measured:
        # 2.2e-7 on the 3D off-grid kink REGARDLESS of epsrel, with the
        # certificate claiming 1.6e-10) -- the error estimator cannot
        # see what the samples cannot reach, ever.  The margin cut is
        # the strongest sound form.
        margin = 0.08
        xcut = xstar - jnp.where(xstar >= 0.0, margin, -margin)
        fr_d.append(jnp.where(ok,
                              jnp.clip(0.5 + xcut, 0.12, 0.88),
                              jnp.asarray(0.5, dtype)))

        # ---- jump (step) hypotheses on the same stencil ----------------
        # J1: step in (-a, 0): the gap secant g2 DOMINATES every flank
        # secant (2x) and BREAKS the geometric slope progression
        # (smooth functions have g2^2 ~ g1*g3 -- exp slopes progress
        # geometrically, polynomials sub-geometrically; a jump makes
        # g2^2 >> |g1*g3|, scale-free so steep-but-smooth exponentials
        # stay silent), and the far flank is straight.  J2 mirrored.
        # On steep-branch integrands (f6's exp coefficients up to ~10)
        # the dominance gate only opens once the region has shrunk so
        # the branch slope a*len*f drops under the jump secant J/gap --
        # detection strengthens exactly at the deep generations where
        # the straddler population explodes.  Strength = the outlier
        # slope magnitude (~ jump/gap): the cross-dim argmax picks the
        # surface dominating the region's error.
        a2, a1 = jnp.abs(g2), jnp.abs(g1)
        a3, a4 = jnp.abs(g3), jnp.abs(g4)
        mag1 = jnp.maximum(jnp.maximum(a1, a3), a4)
        j1 = (a2 > 2.0 * mag1) & (a2 > 0.0) \
            & (a2 * a2 > 16.0 * a1 * a3) \
            & (jnp.abs(g4 - g3) < 0.5 * a2)
        mag2 = jnp.maximum(jnp.maximum(a1, a2), a4)
        j2 = (a3 > 2.0 * mag2) & (a3 > 0.0) \
            & (a3 * a3 > 16.0 * a2 * a4) \
            & (jnp.abs(g1 - g2) < 0.5 * a3)
        # cut at the suspect gap's center-side edge + margin into the
        # smooth side: J1's jump child is [lo, center + margin] (whole
        # gap kept with >= margin clearance), the other child smooth
        jfr_d.append(jnp.where(j1, 0.5 + margin,
                               jnp.where(j2, 0.5 - margin, 0.5))
                     .astype(dtype))
        jstr_d.append(jnp.where(j1, a2, jnp.where(j2, a3, 0.0))
                      .astype(dtype))
    fr_all = jnp.stack(fr_d, axis=1)                       # (C, ndim)
    onehot = (jnp.arange(ndim, dtype=jnp.int32)[None, :]
              == split_dim[:, None]).astype(dtype)
    frac_kink = jnp.sum(fr_all * onehot, axis=1)
    jstr = jnp.stack(jstr_d, axis=1)                       # (C, ndim)
    jfr = jnp.stack(jfr_d, axis=1)
    has_jump = jnp.max(jstr, axis=1) > 0.0
    jdim = jnp.argmax(jstr, axis=1).astype(jnp.int32)
    j_onehot = (jnp.arange(ndim, dtype=jnp.int32)[None, :]
                == jdim[:, None]).astype(dtype)
    frac_jump = jnp.sum(jfr * j_onehot, axis=1)
    frac = jnp.where(has_jump, frac_jump, frac_kink)
    split_out = jnp.where(has_jump, jdim, split_dim)
    return frac, split_out


def _eval_chunk_vector(
    f: Callable[[jax.Array], jax.Array],
    tables: RuleTables,
    ncomp: int,
    lows: jax.Array,       # (ndim, C)
    lengths: jax.Array,    # (ndim, C)
    global_lo: jax.Array,
    global_range: jax.Array,
):
    """Vector-valued twin of ``_eval_chunk``: ``f`` maps (..., ndim) ->
    (..., ncomp) (cubacpp array<double,N>/vector<double> integrands,
    cubacpp/integrand_traits.hh:81-93 -- a capability the reference's GPU
    layer itself lacks).  All components share ONE point set; per
    component the rule sums, null-rule error model and estimates are the
    scalar path's exactly; the bisection dimension takes the MAX fourth
    difference over components (CUBA's multi-component subdivision rule).

    Returns (estimate (ncomp, C), errorest (ncomp, C), split_dim (C,)).
    Outputs are component-major so the big region axis stays minor
    (region_pool.py layout rationale)."""
    ndim = tables.ndim
    dtype = lows.dtype
    len_g = lengths * global_range[:, None]
    center_g = global_lo[:, None] + (lows + 0.5 * lengths) * \
        global_range[:, None]
    planes = []
    for d in range(ndim):
        planes.append(
            center_g[d][:, None]
            - tables.gen[None, :, d] * len_g[d][:, None])
    x = jnp.stack(planes, axis=-1)                         # (C, P, ndim)
    jacobian = jnp.prod(global_range)
    # component-major IMMEDIATELY: a materialized (C, P, ncomp) buffer
    # lane-pads the small minor axis ncomp -> 128 on TPU (the pool-layout
    # invariant, docs/DESIGN.md); (ncomp, C, P) keeps the big point axis
    # minor and XLA emits f's output directly in the transposed layout
    vals_k = jnp.moveaxis(f(x).astype(dtype), -1, 0)       # (ncomp, C, P)

    ob = tables.orbit_bounds
    ratio = jnp.asarray(tables.ratio, dtype)
    widest = jnp.argmax(lengths, axis=0).astype(jnp.int32)
    sc = tables.scale[:, 1:4]
    nm = tables.norm[:, 1:4]
    vol = jnp.prod(lengths, axis=0)

    ests, errs_out, diffs = [], [], []
    for c in range(ncomp):
        # per-component (C, P) plane; XLA fuses the slice into f's output
        vals = vals_k[c]
        orbit_sums = jnp.stack(
            [jnp.sum(vals[:, ob[s]:ob[s + 1]], axis=1)
             for s in range(len(ob) - 1)], axis=1)
        sums = jnp.sum(
            orbit_sums[:, :, None] * tables.orbit_wts[None, :, :], axis=1)
        sums = sums * jacobian
        f0 = vals[:, 0]
        orbit1 = vals[:, 1:1 + 2 * ndim].reshape(-1, ndim, 2).sum(-1)
        orbit2 = vals[:, 1 + 2 * ndim:1 + 4 * ndim].reshape(-1, ndim, 2).sum(-1)
        diffs.append(jnp.abs(
            (2.0 * (1.0 - ratio)) * f0[:, None] + ratio * orbit1 - orbit2))
        s_r = sums[:, 1:4]
        s_r1 = sums[:, 2:5]
        e = jnp.max(
            jnp.abs(s_r1[:, None, :] + sc[None, :, :] * s_r[:, None, :])
            * nm[None, :, :], axis=1)
        e1, e2, e3 = e[:, 0], e[:, 1], e[:, 2]
        gated = jnp.where(
            (_ERRCOEFF[0] * e1 <= e2) & (_ERRCOEFF[0] * e2 <= e3),
            _ERRCOEFF[1] * e1,
            _ERRCOEFF[2] * jnp.maximum(jnp.maximum(e1, e2), e3))
        ests.append(vol * sums[:, 0])
        errs_out.append(vol * gated)

    fourth_diff = jnp.max(jnp.stack(diffs), axis=0)        # (C, ndim)
    best = jnp.argmax(fourth_diff, axis=1).astype(jnp.int32)
    any_positive = jnp.max(fourth_diff, axis=1) > 0
    split_dim = jnp.where(any_positive, best, widest)
    return jnp.stack(ests), jnp.stack(errs_out), split_dim


def apply_rule(
    f: Callable[[jax.Array], jax.Array],
    tables: RuleTables,
    lows: jax.Array,
    lengths: jax.Array,
    global_lo: jax.Array,
    global_range: jax.Array,
    *,
    chunk_size: int | None = None,
    n: jax.Array | None = None,
    blocked: bool = False,
    ncomp: int = 1,
    with_split_frac: bool = False,
):
    """Apply the rule to the whole (possibly padded) region pool.

    ``lows``/``lengths``: (ndim, R) dims-major.  If ``chunk_size`` divides R
    the pool is processed in chunks via ``lax.map`` to bound the (chunk,
    feval) intermediate; otherwise it is evaluated in one shot.

    ``n`` (traced region count) enables the dynamic-trip path: only chunks
    that intersect occupied slots are evaluated -- skipped chunks cost a
    scalar predicate, and their outputs stay zero (downstream masking by
    region count makes the two indistinguishable).  The pool is padded to
    the next power-of-two bucket, so a full-capacity sweep wastes up to 2x
    integrand evaluations when ``n`` is just past half the bucket; this
    path makes eval work proportional to the real population.  ``blocked``
    selects the post-split layout (real slots are the first n/2 of each
    static pool half, region_pool.block_mask) vs a contiguous [0, n) pool.

    Returns (estimate (R,), errorest (R,), split_dim (R,)); with
    ``ncomp`` > 1 the estimate/error outputs are component-major
    (ncomp, R) from the vector twin ``_eval_chunk_vector``.  With
    ``with_split_frac`` (scalar path only) a fourth output: the
    crease-aware split fraction (R,) (_split_fraction; padded/skipped
    slots report 0.5).
    Padded (zero-length) regions yield zero estimate/error since their unit
    volume is zero.
    """
    if with_split_frac and ncomp != 1:
        raise ValueError("with_split_frac is scalar-only")
    if ncomp == 1:
        def eval1(lo, ln):
            return _eval_chunk(f, tables, lo, ln, global_lo, global_range,
                               with_split_frac=with_split_frac)
    else:
        def eval1(lo, ln):
            return _eval_chunk_vector(f, tables, ncomp, lo, ln,
                                      global_lo, global_range)

    cap = lows.shape[1]
    if chunk_size is None or cap <= chunk_size or cap % chunk_size != 0:
        return eval1(lows, lengths)

    ndim = lows.shape[0]
    num_chunks = cap // chunk_size

    # The blocked occupancy predicate below assumes no chunk straddles the
    # static half boundary (true iff the half is chunk-aligned).  Workspace
    # pools always satisfy this (power-of-two caps and chunks); a direct
    # caller violating it falls back to the full-capacity sweep rather than
    # silently zeroing occupied straddled chunks.
    half_aligned = (cap // 2) % chunk_size == 0
    if n is not None and (not blocked or half_aligned):
        # Dynamic trip count: fori over all chunk slots, lax.cond skipping
        # the unoccupied ones.  dynamic_slice/dynamic_update_slice at
        # chunk-aligned offsets are contiguous block copies, NOT the
        # per-element gathers/scatters that serialize on TPU
        # (docs/DESIGN.md section 3).
        half = cap // 2
        dtype = lows.dtype

        def body(i, outs):
            start = i * chunk_size
            if blocked:
                # chunk i lives entirely in the block starting at 0 or at
                # half (half_aligned guarantees no straddle) and is
                # occupied iff its offset within the block is below n//2.
                offset_in_block = start % half
                needed = offset_in_block < (n // 2)
            else:
                needed = start < n

            def do(outs):
                lo_c = jax.lax.dynamic_slice(
                    lows, (0, start), (ndim, chunk_size))
                ln_c = jax.lax.dynamic_slice(
                    lengths, (0, start), (ndim, chunk_size))
                res = eval1(lo_c, ln_c)
                est, err = outs[0], outs[1]
                if ncomp == 1:
                    est = jax.lax.dynamic_update_slice(est, res[0], (start,))
                    err = jax.lax.dynamic_update_slice(err, res[1], (start,))
                else:
                    est = jax.lax.dynamic_update_slice(est, res[0], (0, start))
                    err = jax.lax.dynamic_update_slice(err, res[1], (0, start))
                new = (est, err,
                       jax.lax.dynamic_update_slice(outs[2], res[2],
                                                    (start,)))
                if with_split_frac:
                    new = new + (jax.lax.dynamic_update_slice(
                        outs[3], res[3], (start,)),)
                return new

            return jax.lax.cond(needed, do, lambda o: o, outs)

        eshape = (cap,) if ncomp == 1 else (ncomp, cap)
        outs0 = (jnp.zeros(eshape, dtype), jnp.zeros(eshape, dtype),
                 jnp.zeros((cap,), jnp.int32))
        if with_split_frac:
            outs0 = outs0 + (jnp.full((cap,), 0.5, dtype),)
        return jax.lax.fori_loop(0, num_chunks, body, outs0)

    def body(args):
        lo, ln = args
        return eval1(lo, ln)

    lo_c = lows.reshape(ndim, num_chunks, chunk_size).transpose(1, 0, 2)
    ln_c = lengths.reshape(ndim, num_chunks, chunk_size).transpose(1, 0, 2)
    res = jax.lax.map(body, (lo_c, ln_c))
    if ncomp == 1:
        flat = tuple(r.reshape(cap) for r in res)
        return flat
    est, err, sd = res
    # (num_chunks, ncomp, chunk) -> (ncomp, cap)
    est = est.transpose(1, 0, 2).reshape(ncomp, cap)
    err = err.transpose(1, 0, 2).reshape(ncomp, cap)
    return est, err, sd.reshape(cap)
