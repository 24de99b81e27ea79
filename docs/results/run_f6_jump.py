"""f6 8D 1e-6 with jump-aware splitting (round 4 VERDICT r3 #3; made
disk-resumable in round 5 per VERDICT r4 #2).

The midpoint-bisection f6 8D runs wall at 1e-5 with a ~10x-regions
anatomy for 1e-6 (docs/VALIDATION.md 2b): the straddling-surface error
mass is jump x (surface area x normal width), only NORMAL cuts shrink
it, but f6's large smooth exponents make tangential fourth differences
win for many generations so the straddler count multiplies ~2^(d-1)
per sweep.  crease_split=True now carries a jump detector
(rule_eval._split_fraction): confident jumps override the bisection
dimension to the jump normal and cut at the suspect gap's edge plus
the blind-zone margin.

Round 4 measured ~77x/slice stored-error reduction extrapolating the
certificate to ~3-5 h -- longer than one safe unattended sitting on
this tunnel.  Round 5: the run accumulates across budgeted legs via
``integrate_to_convergence(state_path=)`` (banked ledger +
error-sorted slice queue persisted on any status-1 exit, resumed
bit-identically) with a cumulative-wall sidecar, exactly the
run_physics_resume.py pattern.  Each sitting appends nothing until the
run either certifies (status-0 row with CUMULATIVE wall) or a leg is
the last one planned (pass record_partial=1 to append an honest
status-1 row for the round's books).

Usage:  python docs/results/run_f6_jump.py [epsrel] [leg_budget_s]
                                           [record_partial]
        (defaults 1e-6, 1800, 0)

Reference pattern: new_time_and_call.cuh:129-245 (ladder rung rows).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("GPUINT_TPU_CONTINUATION_LOG", "1")

from gpuintegration_tpu import Workspace               # noqa: E402
from gpuintegration_tpu.models import genz             # noqa: E402
from gpuintegration_tpu.utils import timing            # noqa: E402

HERE = os.path.dirname(__file__)


def main(out_path=None, epsrel=1e-6, budget_s=1800.0,
         record_partial=False):
    out_path = out_path or os.path.join(HERE, "pagani_ladders_8d.csv")
    tag = f"{epsrel:g}".replace("-", "m")
    state_path = os.path.join(HERE, f"f6_jump_{tag}.state")
    meta_path = os.path.join(HERE, f"f6_jump_{tag}.meta.json")
    meta = {"legs": 0, "wall_s": 0.0}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    g = genz.f6_discontinuous(8)
    ws = Workspace(8)
    t0 = time.time()
    res = ws.integrate_to_convergence(
        g, epsrel=epsrel, epsabs=1e-40, max_wall_s=budget_s,
        finish_epsrel_scale=0.4, crease_split=True,
        state_path=state_path)
    meta["legs"] += 1
    meta["wall_s"] += time.time() - t0
    wall = meta["wall_s"]
    rel = abs(res.estimate - g.true_value) / abs(g.true_value)
    print(f"leg {meta['legs']}: est={res.estimate:.9e} "
          f"err={res.errorest:.3e} status={res.status} "
          f"true_rel={rel:.3e} total_wall={wall:.0f}s "
          f"nregions={res.nregions}", flush=True)

    if res.status == 0 or record_partial:
        need_header = not os.path.exists(out_path) \
            or os.path.getsize(out_path) == 0
        with open(out_path, "a") as fh:
            if need_header:
                print(timing.PAGANI_CSV_HEADER, file=fh, flush=True)
            print(f"f6_discontinuous_8d_jumpsplit,8,xla,"
                  f"{g.true_value:.15e},{epsrel:g},1e-40,"
                  f"{res.estimate:.15e},{res.errorest:.15e},"
                  f"{res.nregions},{res.nFinishedRegions},{res.iters},"
                  f"{res.status},{wall * 1e3}", file=fh, flush=True)
            print(f"# f6 jump-split eps={epsrel:g}: status={res.status} "
                  f"true_rel_err={rel:.3e} legs={meta['legs']} "
                  f"cumulative_wall={wall:.0f}s (midpoint bisection "
                  f"walls at 1e-5, VALIDATION 2b)", file=fh, flush=True)
        print(f"wrote {out_path}")
    if res.status == 0:
        if os.path.exists(meta_path):
            os.remove(meta_path)
        print(f"CERTIFIED at eps={epsrel:g}, cumulative {wall:.0f}s "
              f"over {meta['legs']} legs")
    else:
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)
        print(f"unconverged; state at {state_path}.npz -- rerun to "
              f"resume", flush=True)
    return res


if __name__ == "__main__":
    main(epsrel=float(sys.argv[1]) if len(sys.argv) > 1 else 1e-6,
         budget_s=float(sys.argv[2]) if len(sys.argv) > 2 else 1800.0,
         record_partial=bool(int(sys.argv[3]))
         if len(sys.argv) > 3 else False)
