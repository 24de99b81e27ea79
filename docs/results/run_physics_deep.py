"""Deep-tolerance hardware run of the 6D cluster-likelihood workload.

The reference's production story is physics integrands driven to tight
tolerances (its demos: cuda/pagani/demos/hybrid.cu cross-check pattern,
test_cpu_vs_gpu.cu CPU/GPU agreement).  The suite already validates this
model at 3e-4 on the CPU mesh (tests/test_physics_model.py); this script
records the PRODUCTION regime on the real TPU: PAGANI carried to 1e-6
via the continuation driver, VEGAS cross-check within combined errors.

Usage:  python docs/results/run_physics_deep.py [epsrel] [max_wall_s]
        (defaults 1e-5, 2400)
Appends a row to physics_deep.csv (clean_time_and_call schema; the
closed form is unknown, so true_value records the PAGANI estimate and
the cross-check is the VEGAS agreement printed as a comment row).

The model runs with interp_precision="f32" (round 4): the Interp2D
dense contraction in TPU-native f32 cuts the probed eval_cost from
~82 to ~7 Genz-equivalents (11.5x), while the table lookup stays
accurate to ~1e-7 relative -- below the 1e-5/1e-6 targets and below
any measured table's own accuracy (equivalence pinned in
tests/test_interp.py::TestPrecisionF32).  All rule accumulation stays
f64.  The id column records xla-f32interp for provenance.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gpuintegration_tpu import Workspace                 # noqa: E402
from gpuintegration_tpu.mcubes import vegas as V         # noqa: E402
from gpuintegration_tpu.models.physics import ClusterLikelihood  # noqa: E402
from gpuintegration_tpu.pagani.workspace import measure_eval_cost  # noqa: E402
from gpuintegration_tpu.utils import timing              # noqa: E402


def main(out_path=None, epsrel=1e-5, max_wall_s=2400.0):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "physics_deep.csv")
    model = ClusterLikelihood(interp_precision="f32")
    # The interp-table likelihood costs many Genz-equivalents per eval;
    # probe the multiplier on the live backend (small probe pool -- safe
    # dispatch at any cost) and bound every rule sweep / fused burst with
    # it (DESIGN.md 3b: an unbounded 2M-region sweep of this integrand in
    # ONE dispatch crashed the TPU worker).  1.5x safety margin.
    cost = 1.5 * measure_eval_cost(model, 6, probe_regions=1 << 16)
    print(f"eval_cost probe: {cost:.1f} Genz-equivalents/eval "
          f"(1.5x margin applied)", flush=True)
    # Pool capped below the proven interp-integrand scale (the 1e-4
    # validation run peaked at 2.21M live regions and was stable; two
    # uncapped 1e-6 attempts crashed the TPU worker within ~4 min, i.e.
    # while racing past that size -- at 1e-6 nothing retires early so the
    # pool doubles every iteration straight into 4-16M with interp temps
    # on top).  The partitioned continuation carries the depth instead:
    # bounded hottest-first slices of cap/16 = 128k regions.
    ws = Workspace(6, max_pool_regions=2 * 1024 * 1024, eval_cost=cost)
    t0 = time.time()
    res = ws.integrate_to_convergence(
        model, epsrel=epsrel, epsabs=1e-40, max_wall_s=max_wall_s,
        finish_epsrel_scale=0.4)
    wall = time.time() - t0
    t1 = time.time()
    rv = V.integrate(model, epsrel=1e-4, ncall=5e7, total_iters=15,
                     adjust_iters=10, skip_iters=5, seed=7,
                     eval_cost=cost)
    wall_v = time.time() - t1
    agree = abs(res.estimate - rv.estimate) <= 3 * (res.errorest
                                                    + rv.errorest)
    need_header = not os.path.exists(out_path) \
        or os.path.getsize(out_path) == 0
    with open(out_path, "a") as fh:
        if need_header:
            print(timing.PAGANI_CSV_HEADER, file=fh, flush=True)
        print(f"cluster_likelihood_6d,6,xla-f32interp,{res.estimate:.15e},"
              f"{epsrel:g},1e-40,{res.estimate:.15e},{res.errorest:.15e},"
              f"{res.nregions},{res.nFinishedRegions},{res.iters},"
              f"{res.status},{wall * 1e3}", file=fh, flush=True)
        print(f"# vegas cross-check: est={rv.estimate:.15e} "
              f"err={rv.errorest:.3e} chi2={rv.chi_sq:.3f} "
              f"status={rv.status} wall={wall_v:.0f}s "
              f"agree_3sigma={agree}", file=fh, flush=True)
    print(f"pagani: est={res.estimate:.9e} err={res.errorest:.3e} "
          f"status={res.status} wall={wall:.0f}s nregions={res.nregions}")
    print(f"vegas:  est={rv.estimate:.9e} err={rv.errorest:.3e} "
          f"status={rv.status} agree={agree}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(epsrel=float(sys.argv[1]) if len(sys.argv) > 1 else 1e-5,
         max_wall_s=float(sys.argv[2]) if len(sys.argv) > 2 else 2400.0)
