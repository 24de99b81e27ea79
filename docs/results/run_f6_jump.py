"""f6 8D 1e-6 with jump-aware splitting (round 4, VERDICT r3 #3).

The midpoint-bisection f6 8D runs wall at 1e-5 with a ~10x-regions
anatomy for 1e-6 (docs/VALIDATION.md 2b): the straddling-surface error
mass is jump x (surface area x normal width), only NORMAL cuts shrink
it, but f6's large smooth exponents make tangential fourth differences
win for many generations so the straddler count multiplies ~2^(d-1)
per sweep.  crease_split=True now carries a jump detector
(rule_eval._split_fraction): confident jumps override the bisection
dimension to the jump normal and cut at the suspect gap's edge plus
the blind-zone margin.  This runs the 1e-6 rung with that mechanism
and appends to pagani_ladders_8d.csv -- a certified rung or an honest
budget row either way.

Usage:  python docs/results/run_f6_jump.py [epsrel] [budget_s]
        (defaults 1e-6, 1800)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("GPUINT_TPU_CONTINUATION_LOG", "1")

from gpuintegration_tpu import Workspace               # noqa: E402
from gpuintegration_tpu.models import genz             # noqa: E402
from gpuintegration_tpu.utils import timing            # noqa: E402


def main(out_path=None, epsrel=1e-6, budget_s=1800.0):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "pagani_ladders_8d.csv")
    g = genz.f6_discontinuous(8)
    ws = Workspace(8)
    t0 = time.time()
    with open(out_path, "a") as fh:
        good = timing.clean_time_and_call(
            "f6_discontinuous_8d_jumpsplit", g, epsrel, g.true_value, fh,
            ndim=8, runs_per_epsrel=1, workspace=ws, continuation=True,
            max_wall_s=budget_s, finish_epsrel_scale=0.4,
            crease_split=True)
        print(f"# f6 jump-split rung eps={epsrel:g}: certified={good} "
              f"wall={time.time() - t0:.0f}s (midpoint walls at 1e-5, "
              f"VALIDATION 2b)", file=fh, flush=True)
    print(f"certified={good}; wrote {out_path}")


if __name__ == "__main__":
    main(epsrel=float(sys.argv[1]) if len(sys.argv) > 1 else 1e-6,
         budget_s=float(sys.argv[2]) if len(sys.argv) > 2 else 1800.0)
