"""f1 10D driven the way its own wall anatomy prescribes (round 4,
VERDICT r3 #4).

docs/VALIDATION.md 2b-10D: at 10D the oscillatory integrand's
per-region signed estimates dwarf the 1.55e-6-magnitude integral
(cancellation), so ZERO regions can ever retire under a relative
criterion and the s=0.4 retry is bit-identically walled -- "10D
cancellation needs either an epsabs-driven run or more than 2^31
regions".  This is that epsabs-driven run: epsrel=0, epsabs = 1e-3*|I|
(the same accuracy class as the relative ladder's first rung), with
finish_abs_per_vol = 0.25*epsabs so retired regions can bank at most a
quarter of the absolute budget (disjoint unit volumes sum to <= 1 --
the same soundness argument as the continuation's slice shares).

Either outcome is recorded in pagani_ladders_10d.csv: the first 10D
oscillatory certification in this lineage, or a measured wall with the
absolute-target anatomy.

Round 5: disk-resumable (state_path= + a cumulative-wall sidecar, the
run_physics_resume.py pattern) so the projected 7-12k s certification
accumulates across budgeted legs.

Usage:  python docs/results/run_f1_10d_epsabs.py [budget_s]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("GPUINT_TPU_CONTINUATION_LOG", "1")

from gpuintegration_tpu import Workspace               # noqa: E402
from gpuintegration_tpu.models import genz             # noqa: E402

HERE = os.path.dirname(__file__)


def main(out_path=None, budget_s=2400.0):
    out_path = out_path or os.path.join(HERE, "pagani_ladders_10d.csv")
    state_path = os.path.join(HERE, "f1_10d_epsabs.state")
    meta_path = os.path.join(HERE, "f1_10d_epsabs.meta.json")
    meta = {"legs": 0, "wall_s": 0.0}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    g = genz.f1_oscillatory(10)
    epsabs = 1e-3 * abs(g.true_value)          # ~1.55e-9
    ws = Workspace(10)
    t0 = time.time()
    res = ws.integrate_to_convergence(
        g, epsrel=0.0, epsabs=epsabs, max_wall_s=budget_s,
        finish_abs_per_vol=0.25 * epsabs, state_path=state_path)
    meta["legs"] += 1
    meta["wall_s"] += time.time() - t0
    wall = meta["wall_s"]
    rel = abs(res.estimate - g.true_value) / abs(g.true_value)
    with open(out_path, "a") as fh:
        print(f"f1_oscillatory_10d_epsabs,10,xla,{g.true_value:.15e},"
              f"0,{epsabs:.6e},{res.estimate:.15e},{res.errorest:.15e},"
              f"{res.nregions},{res.nFinishedRegions},{res.iters},"
              f"{res.status},{wall * 1e3}", file=fh, flush=True)
        print(f"# f1 10D epsabs-driven (VALIDATION 2b-10D prescription): "
              f"true_rel_err={rel:.3e} target=1e-3 "
              f"legs={meta['legs']} cumulative_wall={wall:.0f}s",
              file=fh, flush=True)
    if res.status == 0 and os.path.exists(meta_path):
        os.remove(meta_path)
    elif res.status != 0:
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)
    print(f"status={res.status} est={res.estimate:.9e} "
          f"err={res.errorest:.3e} target_abs={epsabs:.3e} "
          f"true_rel={rel:.3e} total_wall={wall:.0f}s "
          f"legs={meta['legs']}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(budget_s=float(sys.argv[1]) if len(sys.argv) > 1 else 2400.0)
