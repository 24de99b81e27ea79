"""f5 8D 1e-7 at the scaling law's own budget (round 4, VERDICT r3 #2).

DESIGN.md 3a-i's measured ~2^(d-2)-per-decade law extrapolates the f5
8D 1e-7 certificate to ~3000-8500 s on this chip; the r02/r03 attempts
ran 963 s and 3032 s budgets (the latter reached 1.35x off the
certificate).  This script runs the ONE dedicated rung at the top of
the law's band (9000 s), finish_epsrel_scale=0.4 like every deep rung.
Either outcome is recorded: a status-0 row closes the last open 8D
wall; a miss at 9000 s falsifies the law and reopens the anatomy.

Usage:  python docs/results/run_f5_law.py  (appends to
pagani_ladders_8d.csv as case f5_c0_8d_law9000)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("GPUINT_TPU_CONTINUATION_LOG", "1")

from gpuintegration_tpu import Workspace               # noqa: E402
from gpuintegration_tpu.models import genz             # noqa: E402
from gpuintegration_tpu.utils import timing            # noqa: E402


def main(out_path=None, budget_s=9000.0):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "pagani_ladders_8d.csv")
    g = genz.f5_c0_continuous(8)
    ws = Workspace(8)
    with open(out_path, "a") as fh:
        good = timing.clean_time_and_call(
            "f5_c0_8d_law9000", g, 1e-7, g.true_value, fh, ndim=8,
            runs_per_epsrel=1, workspace=ws, continuation=True,
            max_wall_s=budget_s, finish_epsrel_scale=0.4)
        print(f"# f5_c0_8d_law9000: certified={good} "
              f"(law band 3000-8500 s, budget {budget_s:.0f} s)",
              file=fh, flush=True)
    print(f"certified={good}; wrote {out_path}")


if __name__ == "__main__":
    main(budget_s=float(sys.argv[1]) if len(sys.argv) > 1 else 9000.0)
