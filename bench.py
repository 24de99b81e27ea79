"""Benchmark driver: PAGANI rule-kernel throughput on the 8D Genz suite.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

North-star metric (BASELINE.json): integrand evals/sec/chip for the
batched Genz-Malik rule kernel at 8D -- the analogue of the reference's
``call_cubature_rules`` throughput probe
(reference: cuda/pagani/demos/new_time_and_call.cuh:30-70), measured over
the Genz suite F2..F6 (F1-oscillatory collapses to a matmul under XLA and
reports degenerate >1e12 rates, so it is excluded from the headline);
headline = suite median, full f64.

Timing method: the repeat loop runs inside one jit with a carried data
dependency between passes, so remote-dispatch overhead and any runtime
memoisation of identical launches cannot distort the number.

vs_baseline is against the BASELINE.json target of 1e9 evals/sec/chip.

Flagship regression gate: ``flagship_evals_per_sec_fixed_work`` -- the
MEDIAN over n=3 runs of neval/wall (round 5; the continuation's work is
deterministic at fixed tolerances, so this isolates throughput from the
tunnel's measured ~2x wall variance, and the median rejects one outlier
round).  ``flagship_runs`` carries each run's wall, rate and stage
vector; ``time_to_1e-5_8d_gaussian_s`` (best wall) remains for the
record but is NOT the gate.
"""
import json
import os
import signal
import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gpuintegration_tpu import Workspace  # noqa: E402
from gpuintegration_tpu.integrand import make_integrand  # noqa: E402
from gpuintegration_tpu.models import genz  # noqa: E402
from gpuintegration_tpu.ops import rule_eval  # noqa: E402
from gpuintegration_tpu.pagani import region_pool  # noqa: E402

BASELINE_EVALS_PER_SEC = 1.0e9


def bench_one(gf, ndim=8, pool=1 << 13, inner=30, dtype="float64",
              chunk_size=None):
    """Best-pass rule throughput over one padded pool of ``pool`` regions.

    ``chunk_size`` bounds the (chunk, feval) intermediate via lax.map for
    pools past the single-dispatch memory budget; every pool slot is
    evaluated, so pool*feval/time is the honest rate."""
    f, _ = make_integrand(gf, ndim)
    tables = rule_eval.rule_tables(ndim, dtype)
    dt = jnp.dtype(dtype)
    gl = jnp.zeros(ndim, dt)
    gr = jnp.ones(ndim, dt)
    lo, ln, _ = region_pool.uniform_split(ndim, 2, pool, dt)

    @jax.jit
    def loop(lo0):
        def body(i, carry):
            lo_c, acc = carry
            est, err, sd = rule_eval.apply_rule(f, tables, lo_c, ln, gl, gr,
                                                chunk_size=chunk_size)
            s = jnp.sum(est)
            # carried dependency defeats launch memoisation / overlap
            return (lo_c + s * 1e-30, acc + s)
        return jax.lax.fori_loop(0, inner, body, (lo0, jnp.zeros((), dt)))

    jax.block_until_ready(loop(lo))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(lo))
        best = min(best, (time.perf_counter() - t0) / inner)
    return pool * tables.feval / best


# Pool-size sweep, best kept per integrand: the reference's throughput
# probe sweeps splits_per_dim 5..15 over pools up to 35e6 regions and
# its CSV keeps the best pass (new_time_and_call.cuh:30-70); f64
# throughput saturates past ~1M regions (docs/results/rule_throughput.csv),
# so one small pool (dispatch-bound regime) + one 2M pool (saturated,
# chunked through the same 8192-region kernel the adaptive loop uses)
# brackets the sweep.
_POOL_SWEEP = ((1 << 13, 30, None), (1 << 21, 2, 1 << 13))


def bench_suite(ndim=8):
    suite = {
        "f2_product_peak": genz.f2_product_peak(ndim),
        "f3_corner_peak": genz.f3_corner_peak(ndim),
        "f4_gaussian": genz.f4_gaussian(ndim),
        "f5_c0": genz.f5_c0_continuous(ndim),
        "f6_discontinuous": genz.f6_discontinuous(ndim),
    }
    return {name: max(bench_one(g, ndim, pool=p, inner=i, chunk_size=c)
                      for p, i, c in _POOL_SWEEP)
            for name, g in suite.items()}


def bench_vegas(ndim=6, ncall=1e7, importance="poly", sampler=None):
    """Warm VEGAS sampling throughput (samples/s) on a 6D Gaussian.

    ``sampler=None`` is the AUTO default a user gets (on TPU: 'hybrid'
    for this f64 poly run -- Pallas point-gen + f64 integrand/
    accumulation, DESIGN.md 4a); pass 'xla' for the Threefry path."""
    from gpuintegration_tpu.mcubes.vegas import integrate as vegas
    g = genz.f4_gaussian(ndim, a=8.0)
    kw = dict(epsrel=0.0, epsabs=0.0, ncall=ncall, total_iters=4,
              adjust_iters=2, skip_iters=0, importance=importance,
              sampler=sampler)
    vegas(g, seed=1, **kw)
    t0 = time.perf_counter()
    r = vegas(g, seed=2, **kw)
    dt = time.perf_counter() - t0
    rel = abs(r.estimate - g.true_value) / abs(g.true_value)
    return r.neval / dt, rel


def bench_vegas_vector(ndim=6, ncall=1e7, ncomp=4):
    """Vector-integrand VEGAS throughput (samples/s, counting each point
    once) on the AUTO sampler -- on TPU this is the hybrid Pallas
    point-gen path, newly open to ncomp > 1 (round 4): component-major
    accumulators, adaptation on component 0.  The ncomp components share
    one point set, so the per-point cost grows only by the integrand's
    extra arithmetic."""
    from gpuintegration_tpu.mcubes.vegas import integrate as vegas
    g = genz.f4_gaussian(ndim, a=8.0)

    def gv(x):
        base = g(x)
        return jnp.stack([base * (1.0 + 0.25 * k) for k in range(ncomp)],
                         axis=-1)
    gv.ndim = ndim
    kw = dict(epsrel=0.0, epsabs=0.0, ncall=ncall, total_iters=4,
              adjust_iters=2, skip_iters=0, importance="poly")
    vegas(gv, seed=1, **kw)
    t0 = time.perf_counter()
    r = vegas(gv, seed=2, **kw)
    dt = time.perf_counter() - t0
    rel = abs(r.estimates[0] - g.true_value) / abs(g.true_value)
    return r.neval / dt, rel


def bench_pallas(ndim=8, inner=30):
    """f32 Pallas fused rule kernel throughput (the recommended f32 path:
    VMEM-resident point-gen + integrand + contraction -- docs/DESIGN.md
    section 7).  Same pool-size sweep as the f64 headline: the kernel is
    grid-launch-bound at small pools (8.4e9 evals/s at 8k regions) and
    saturates past ~1M (5.1e10, docs/results/rule_throughput.csv)."""
    from gpuintegration_tpu.ops.pallas_rule import pallas_apply_rule

    def g8(*xs):
        s = 0.0
        for x in xs:
            s = s + (x - 0.5) ** 2
        return jnp.exp(-25.0 * s)

    dt = jnp.float32
    tables = rule_eval.rule_tables(ndim, "float32")
    gl = jnp.zeros(ndim, dt)
    gr = jnp.ones(ndim, dt)

    def one(pool, inner):
        lo, ln, _ = region_pool.uniform_split(ndim, 2, pool, dt)

        @jax.jit
        def loop(lo0):
            def body(i, carry):
                lo_c, acc = carry
                est, _, _ = pallas_apply_rule(g8, ndim, lo_c, ln, gl, gr,
                                              interpret=False)
                s = jnp.sum(est)
                return (lo_c + s * 1e-30, acc + s)
            return jax.lax.fori_loop(0, inner, body,
                                     (lo0, jnp.zeros((), dt)))

        jax.block_until_ready(loop(lo))
        best = float("inf")
        for i in range(3):
            lo_i = lo * (1.0 + (i + 1) * 1e-6)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(lo_i))
            best = min(best, (time.perf_counter() - t0) / inner)
        return pool * tables.feval / best

    return max(one(1 << 13, inner), one(1 << 21, 4))


def bench_vegas_pallas(ndim=6, ncall=1e9, iters=10):
    """Fused Pallas VEGAS sampler, frozen-phase samples/s -- the
    m-CUBES vegas_kernelF analogue (vegasT.cuh:492-619): hardware PRNG,
    stratified point-gen, Chebyshev importance map, integrand and
    per-cube variance in one VMEM kernel (mcubes/pallas_vegas.py).
    Adapts a grid cheaply first, then times ``iters`` frozen iterations
    at production ncall (epsrel 1e-12 so no early exit)."""
    import math
    from gpuintegration_tpu.mcubes import grid as vgrid
    from gpuintegration_tpu.mcubes.vegas import VegasState, vegas

    def g6(x0, x1, x2, x3, x4, x5):   # explicit arity: the sampler
        s = 0.0                        # deduces ndim/per-axis form from it
        for x in (x0, x1, x2, x3, x4, x5):
            s = s + (x - 0.5) ** 2
        return jnp.exp(-25.0 * s)

    truth = (math.sqrt(math.pi / 25.0) * math.erf(2.5)) ** ndim
    st = VegasState(xi=vgrid.uniform_grid(ndim, 500, jnp.float64))
    vegas(g6, epsrel=1e-9, ncall=1e7, ndim=ndim, total_iters=8,
          adjust_iters=8, seed=1, importance="poly", sampler="pallas",
          state=st)

    def frozen(seed):
        st2 = VegasState(xi=st.xi)
        return vegas(g6, epsrel=1e-12, epsabs=0.0, ncall=ncall, ndim=ndim,
                     total_iters=iters, adjust_iters=0, seed=seed,
                     importance="poly", sampler="pallas", state=st2)

    frozen(2)                                  # compile + warm
    t0 = time.perf_counter()
    r = frozen(3)
    dt = time.perf_counter() - t0
    rel = abs(r.estimate - truth) / truth
    return r.neval / dt, rel


def bench_interp_large(n=512, ndim=6):
    """Measured eval_cost of a beyond-dense-ceiling (512x512) Interp2D
    integrand through the round-5 two-level lookup path (no searchsorted
    or dynamic gathers at any table size -- the gather path serialized
    and crashed the axon worker; reference interpolators are size-
    indifferent, Interp2D.cuh:16-60).  Returns Genz-equivalents per eval
    for both precisions -- the number a physics run passes as
    eval_cost=."""
    import numpy as np
    from gpuintegration_tpu.ops.interp import Interp2D
    from gpuintegration_tpu.pagani.workspace import measure_eval_cost
    xs = np.linspace(0.0, 1.0, n)
    ys = np.linspace(0.0, 1.0, n)
    gx, gy = np.meshgrid(xs, ys)
    tab = np.exp(-3.0 * ((gx - 0.4) ** 2 + (gy - 0.6) ** 2))
    out = {}
    for prec in ("f64", "f32"):
        it = Interp2D(xs, ys, tab, precision=prec)

        def f(x0, x1, x2, x3, x4, x5):
            return it(x0, x1) * jnp.exp(-(x2 + x3 + x4 + x5))
        out[prec] = measure_eval_cost(f, ndim)
    return out


def bench_time_to_tolerance(ndim=8, epsrel=1e-5, max_wall_s=2400.0):
    """Wall time for the flagship 8D Gaussian carried to a CERTIFIED
    epsrel=1e-5 via the partitioned checkpoint-resume continuation
    (Workspace.integrate_to_convergence): the first round ends at the
    16M-region pool wall (the same wall the reference's 16 GB memory
    model imposes, heuristic_classifier.cuh:89-94); the survivors are
    then error-sorted and refined hottest-first in sub-pool slices until
    the global certificate holds.  ONE timed cold run, wall-bounded:
    the continuation is adaptive-work dominated (compiles are disk-
    cached across rounds), so a separate warm pass would double a
    multi-minute measurement for noise-level gain."""
    g = genz.f4_gaussian(ndim)
    ws = Workspace(ndim)
    t0 = time.perf_counter()
    res = ws.integrate_to_convergence(g, epsrel=epsrel, epsabs=1e-40,
                                      max_wall_s=max_wall_s)
    dt = time.perf_counter() - t0
    rel = abs(res.estimate - g.true_value) / abs(g.true_value)
    return dt, res, rel


def bench_time_to_tolerance_best(ndim=8, epsrel=1e-5, max_wall_s=2400.0,
                                 runs=3):
    """``runs`` flagship runs (round 5: n=3, gate on the MEDIAN
    fixed-work rate) with spread + per-stage breakdown.

    The continuation work is deterministic at fixed tolerances, so
    run-to-run wall-time deltas are tunnel/contention noise (the r02
    measurement drifted 2.1x at identical work: 970 s vs the 458-703 s
    band; with ~2x variance, two samples cannot distinguish a 20%
    regression from noise -- VERDICT r4 weak #6).  Reporting {best,
    spread, median-rate gate} plus the round-level stage times
    (utils.profiling.StageTimer through integrate_to_convergence -- the
    reference's cuda_pagani_time_breakdown.csv analogue,
    Workspace.cuh:171-241; repeat discipline: new_time_and_call.cuh:
    30-70 runs 11 repeats) makes a real regression distinguishable from
    a noisy tunnel."""
    from gpuintegration_tpu.utils.profiling import StageTimer
    g = genz.f4_gaussian(ndim)
    results = []
    for _ in range(max(runs, 1)):
        ws = Workspace(ndim)
        st = StageTimer()
        t0 = time.perf_counter()
        res = ws.integrate_to_convergence(g, epsrel=epsrel, epsabs=1e-40,
                                          max_wall_s=max_wall_s,
                                          stage_timer=st)
        dt = time.perf_counter() - t0
        rel = abs(res.estimate - g.true_value) / abs(g.true_value)
        results.append((dt, res, rel, dict(st.times)))
        # progressive: a watchdog fire mid-second-run still reports run 1
        _flagship_update(results)
    return results


def _flagship_update(results):
    best = min(results, key=lambda r: r[0])
    dt, res, rel, stages = best
    _OUT["detail"].update({
        "time_to_1e-5_8d_gaussian_s": dt,
        "time_to_1e-5_8d_gaussian_spread_s":
            max(r[0] for r in results) - min(r[0] for r in results),
        "time_to_1e-5_8d_gaussian_runs": len(results),
        "flagship_stage_times_s":
            {k: round(v, 3) for k, v in stages.items()},
        # REGRESSION GATE (round 5): MEDIAN evals/s at fixed work over
        # the n=3 runs.  The continuation work is deterministic at
        # fixed tolerances (same neval every run), so neval/wall
        # isolates device+driver throughput from the tunnel's measured
        # ~2x wall variance -- wall time alone cannot catch a 1.5x
        # regression (BENCH_r03: 323.5 s best with a 300.2 s spread at
        # bit-identical work), and with two samples a single outlier
        # can still mask a 20% regression; the median of three rejects
        # one outlier round.  Compare THIS number across rounds; wall
        # time and the best-run rate stay for the record.  Per-run
        # vectors make the noise visible.
        "flagship_evals_per_sec_fixed_work": statistics.median(
            r_res.neval / r_dt for r_dt, r_res, _r, _s in results),
        "flagship_evals_per_sec_best_run": res.neval / dt,
        "flagship_runs": [
            {"wall_s": round(r_dt, 1),
             "evals_per_sec": r_res.neval / r_dt,
             "neval": r_res.neval,
             "stage_times_s": {k: round(v, 3)
                               for k, v in r_stages.items()}}
            for r_dt, r_res, _r_rel, r_stages in results],
        "achieved_rel_err": rel,
        "converged": res.status == 0,
        "nregions": res.nregions,
        "neval": res.neval,
    })


# Progressive result: every completed stage lands here so a watchdog
# fire mid-stage still emits everything measured so far (the remote TPU
# tunnel can die mid-run, which turns every dispatch into an infinite
# hang -- a bench that never prints is indistinguishable from one that
# never ran).
_OUT = {
    "metric": "integrand evals/sec/chip (PAGANI 8D Genz suite median, f64)",
    "value": None,
    "unit": "evals/s",
    "vs_baseline": None,
    "detail": {},
}


def _emit_and_exit(rc):
    print(json.dumps(_OUT))
    sys.stdout.flush()
    os._exit(rc)


def _on_alarm(signum, frame):
    _OUT["detail"]["bench_error"] = (
        "watchdog: TPU dispatch stalled or time budget expired")
    _emit_and_exit(1)


def main():
    budget_s = int(float(os.environ.get("GPUINT_TPU_BENCH_BUDGET_S",
                                        "5400")))
    signal.signal(signal.SIGALRM, _on_alarm)
    # fast tunnel-health probe: a dead tunnel hangs even an 8x8 matmul
    signal.alarm(min(300, budget_s))
    _OUT["detail"]["device"] = str(jax.devices()[0])
    jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    signal.alarm(budget_s)

    rates = bench_suite()
    headline = statistics.median(rates.values())
    _OUT["value"] = headline
    _OUT["vs_baseline"] = headline / BASELINE_EVALS_PER_SEC
    _OUT["detail"]["per_integrand_evals_per_sec"] = rates
    try:
        # AUTO sampler: on TPU the f64 poly path routes through the
        # hybrid Pallas point-gen sampler (DESIGN.md 4a) -- this IS the
        # default-precision path a user gets, so it is the metric
        vegas_rate, vegas_rel = bench_vegas()
        _OUT["detail"]["vegas_6d_poly_samples_per_sec"] = vegas_rate
        _OUT["detail"]["vegas_6d_rel_err"] = vegas_rel
    except Exception as e:
        _OUT["detail"]["vegas_error"] = repr(e)
    try:
        rate_xla, _ = bench_vegas(sampler="xla")
        _OUT["detail"]["vegas_6d_poly_xla_samples_per_sec"] = rate_xla
    except Exception as e:
        _OUT["detail"]["vegas_xla_error"] = repr(e)
    try:
        # production-scale row: the 1e7 config above is dispatch/adjust
        # bound (docs/results/vegas_roofline.csv: the integrand-free
        # machinery ceiling equals the achieved rate there); the
        # reference's published m-CUBES rates are measured at
        # production ncall, so this is the comparable number
        rate_1e8, rel_1e8 = bench_vegas(ncall=1e8)
        _OUT["detail"]["vegas_6d_poly_1e8_samples_per_sec"] = rate_1e8
        _OUT["detail"]["vegas_6d_rel_err_1e8"] = rel_1e8
    except Exception as e:
        _OUT["detail"]["vegas_1e8_error"] = repr(e)
    try:
        vegas_grid_rate, _ = bench_vegas(importance="grid")
        _OUT["detail"]["vegas_6d_grid_samples_per_sec"] = vegas_grid_rate
    except Exception as e:
        _OUT["detail"]["vegas_grid_error"] = repr(e)
    try:
        # round 4: vector integrands on the hybrid point-gen sampler
        vv_rate, vv_rel = bench_vegas_vector()
        _OUT["detail"]["vegas_6d_vector4_samples_per_sec"] = vv_rate
        _OUT["detail"]["vegas_6d_vector4_rel_err"] = vv_rel
    except Exception as e:
        _OUT["detail"]["vegas_vector_error"] = repr(e)
    try:
        _OUT["detail"]["pallas_f32_8d_evals_per_sec"] = bench_pallas()
    except Exception:      # non-TPU backend or Mosaic unavailable
        _OUT["detail"]["pallas_f32_8d_evals_per_sec"] = None
    try:
        vp_rate, vp_rel = bench_vegas_pallas()
        _OUT["detail"]["vegas_6d_pallas_frozen_samples_per_sec"] = vp_rate
        _OUT["detail"]["vegas_6d_pallas_rel_err"] = vp_rel
    except Exception:      # non-TPU backend or Mosaic unavailable
        _OUT["detail"]["vegas_6d_pallas_frozen_samples_per_sec"] = None
    try:
        # round 5: beyond-ceiling interpolation table cost probe
        _OUT["detail"]["interp2d_512_eval_cost"] = bench_interp_large()
    except Exception as e:
        _OUT["detail"]["interp2d_512_error"] = repr(e)
    try:
        bench_time_to_tolerance_best()   # updates _OUT per completed run
    except Exception as e:  # never lose the whole bench line to one stage
        _OUT["detail"].setdefault("time_to_1e-5_8d_gaussian_s", None)
        _OUT["detail"]["flagship_error"] = repr(e)
    signal.alarm(0)
    print(json.dumps(_OUT))


if __name__ == "__main__":
    main()
