"""Resumable deep-tolerance run of the 6D cluster-likelihood workload.

Round-5 successor to run_physics_deep.py for the BASELINE driver
tolerance (epsrel 1e-6): the round-4 single-sitting attempt ended
status 1 at 7207 s with errorest 3.0x from the certificate and a
trajectory projecting certification at a 2-4x longer run -- longer
than one safe unattended sitting on this tunnel.  This script runs the
SAME integration as budgeted legs through
``integrate_to_convergence(state_path=)``: each leg resumes the banked
ledger + error-sorted slice queue exactly (bit-identical to an
uninterrupted run, tests/test_workspace_features.py::
test_state_path_interrupt_resume_bit_identical) and persists it again
at the wall budget.  A cumulative-wall sidecar JSON keeps the honest
total across legs.

On certification: appends the status-0 row + VEGAS cross-check comment
to physics_deep.csv (clean_time_and_call schema), with wall = the
CUMULATIVE seconds across legs, and removes the sidecar.

Usage: python docs/results/run_physics_resume.py [epsrel] [leg_wall_s]
       (defaults 1e-6, 10800)

Reference pattern: test/cuda/pagani/test_cpu_vs_gpu.cu:12-23 (flagship
validation = executed certificate), demos/hybrid.cu (cross-check).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gpuintegration_tpu import Workspace                 # noqa: E402
from gpuintegration_tpu.mcubes import vegas as V         # noqa: E402
from gpuintegration_tpu.models.physics import ClusterLikelihood  # noqa: E402
from gpuintegration_tpu.pagani.workspace import measure_eval_cost  # noqa: E402
from gpuintegration_tpu.utils import timing              # noqa: E402

HERE = os.path.dirname(__file__)


def main(epsrel=1e-6, leg_wall_s=10800.0):
    tag = f"{epsrel:g}".replace("-", "m")
    state_path = os.path.join(HERE, f"physics_{tag}.state")
    meta_path = os.path.join(HERE, f"physics_{tag}.meta.json")
    out_path = os.path.join(HERE, "physics_deep.csv")
    meta = {"legs": 0, "wall_s": 0.0}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)

    model = ClusterLikelihood(interp_precision="f32")
    # Probe the interp-table cost multiplier on the live backend and
    # bound every sweep/burst with it (DESIGN.md 3b: an unbounded
    # 2M-region sweep of this integrand crashed the TPU worker).
    cost = 1.5 * measure_eval_cost(model, 6, probe_regions=1 << 16)
    print(f"eval_cost probe: {cost:.1f} (1.5x margin); leg "
          f"{meta['legs'] + 1}, cumulative wall so far {meta['wall_s']:.0f}s",
          flush=True)
    # Pool capped below the proven interp-integrand scale (two uncapped
    # 1e-6 attempts crashed the worker; the continuation carries depth).
    ws = Workspace(6, max_pool_regions=2 * 1024 * 1024, eval_cost=cost)
    t0 = time.time()
    res = ws.integrate_to_convergence(
        model, epsrel=epsrel, epsabs=1e-40, max_wall_s=leg_wall_s,
        finish_epsrel_scale=0.4, state_path=state_path)
    leg_wall = time.time() - t0
    meta["legs"] += 1
    meta["wall_s"] += leg_wall
    print(f"leg {meta['legs']}: est={res.estimate:.9e} "
          f"err={res.errorest:.3e} status={res.status} "
          f"leg_wall={leg_wall:.0f}s total_wall={meta['wall_s']:.0f}s "
          f"nregions={res.nregions} iters={res.iters}", flush=True)

    if res.status != 0:
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)
        print(f"unconverged; state at {state_path}.npz -- rerun to "
              f"resume", flush=True)
        return res

    # certified: VEGAS cross-check + the status-0 row (cumulative wall)
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
        print(f"cluster_likelihood_6d,6,xla-f32interp-resume"
              f"{meta['legs']}legs,{res.estimate:.15e},"
              f"{epsrel:g},1e-40,{res.estimate:.15e},{res.errorest:.15e},"
              f"{res.nregions},{res.nFinishedRegions},{res.iters},"
              f"{res.status},{meta['wall_s'] * 1e3}", file=fh, flush=True)
        print(f"# vegas cross-check: est={rv.estimate:.15e} "
              f"err={rv.errorest:.3e} chi2={rv.chi_sq:.3f} "
              f"status={rv.status} wall={wall_v:.0f}s "
              f"agree_3sigma={agree} legs={meta['legs']}",
              file=fh, flush=True)
    if os.path.exists(meta_path):
        os.remove(meta_path)
    print(f"CERTIFIED: est={res.estimate:.9e} err={res.errorest:.3e} "
          f"rel={res.errorest / abs(res.estimate):.3e} "
          f"total_wall={meta['wall_s']:.0f}s legs={meta['legs']}")
    print(f"vegas: est={rv.estimate:.9e} err={rv.errorest:.3e} "
          f"agree={agree}")
    print(f"wrote {out_path}")
    return res


if __name__ == "__main__":
    main(epsrel=float(sys.argv[1]) if len(sys.argv) > 1 else 1e-6,
         leg_wall_s=float(sys.argv[2]) if len(sys.argv) > 2 else 10800.0)
