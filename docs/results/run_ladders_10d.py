"""10D deep-tolerance epsrel ladders on real TPU hardware.

The 10D rung protocol mirrors run_ladders_8d.py (decade rungs, full
continuation runs, honest wall budgets -- reference apparatus
cuda/pagani/demos/new_time_and_call.cuh:129-245).  10D is the real
FEVAL stress: the 2^ndim corner orbit puts feval(10) = 5,857 points on
every region (vs 3,315 at 8D) and the initial uniform split is 2^10 =
1024 regions, so each bisection sweep costs ~1.8x more per region and
the crease/corner shells multiply 2^9 per sweep.

Cases: the members PAGANI owns at 8D (f3 corner peak certified to the
1e-9 north star, f1 oscillatory to 1e-5, f4 gaussian to 1e-6 -- see
docs/results/pagani_ladders_8d.csv).  The f4 10D instance softens the
peak to a=5.0 like the 8D script's 10D row (a=25 at 10D underflows to
an effectively-zero integrand over most of the cube).

Usage:  python docs/results/run_ladders_10d.py [case ...]
Rows append to pagani_ladders_10d.csv with case names; no arguments
reruns every case and rewrites the CSV.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("GPUINT_TPU_CONTINUATION_LOG", "1")

from gpuintegration_tpu import Workspace               # noqa: E402
from gpuintegration_tpu.models import genz             # noqa: E402
from gpuintegration_tpu.utils import timing            # noqa: E402


def main(out_path=None, only=(), case_budget_s=1800.0):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "pagani_ladders_10d.csv")
    cases = [
        ("f3_corner_peak_10d", genz.f3_corner_peak(10), 10, 1e-9),
        ("f4_gaussian_10d", genz.f4_gaussian(10, a=5.0), 10, 1e-9),
        ("f1_oscillatory_10d", genz.f1_oscillatory(10), 10, 1e-9),
    ]
    if only:
        cases = [c for c in cases if c[0] in only]
        missing = set(only) - {c[0] for c in cases}
        if missing:
            raise SystemExit(f"unknown case(s): {sorted(missing)}")
    mode = "a" if only else "w"
    need_header = mode == "w" or not os.path.exists(out_path) \
        or os.path.getsize(out_path) == 0
    with open(out_path, mode) as fh:
        if need_header:
            print(timing.PAGANI_CSV_HEADER, file=fh, flush=True)
        for name, g, ndim, floor in cases:
            ws = Workspace(ndim)
            exp, achieved = 3, float("inf")
            floor_exp = round(-math.log10(floor))
            t_case = time.time()
            while exp <= floor_exp:
                epsrel = float(f"1e-{exp}")
                left = case_budget_s - (time.time() - t_case)
                if left <= 60.0:
                    print(f"# {name}: case budget spent", file=sys.stderr,
                          flush=True)
                    break
                t0 = time.time()
                # retirement scale 0.4 at/below 1e-6 (marginality,
                # DESIGN.md 3a) exactly as the 8D protocol
                scaled = exp >= 6
                extra = {"finish_epsrel_scale": 0.4} if scaled else {}
                good = timing.clean_time_and_call(
                    name, g, epsrel, g.true_value, fh, ndim=ndim,
                    runs_per_epsrel=1, workspace=ws, continuation=True,
                    max_wall_s=min(900.0, left), **extra)
                print(f"# {name} eps={epsrel:.3e} good={good} "
                      f"wall={time.time() - t0:.0f}s",
                      file=sys.stderr, flush=True)
                if not good and not scaled:
                    left = case_budget_s - (time.time() - t_case)
                    if left > 60.0:
                        print(f"# {name} eps={epsrel:.3e} retry s=0.4",
                              file=sys.stderr, flush=True)
                        good = timing.clean_time_and_call(
                            name, g, epsrel, g.true_value, fh, ndim=ndim,
                            runs_per_epsrel=1, workspace=ws,
                            continuation=True,
                            max_wall_s=min(900.0, left),
                            finish_epsrel_scale=0.4)
                if not good:
                    break
                achieved = epsrel
                exp += 1
            print(f"# {name}: achieved epsrel {achieved}", file=fh,
                  flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(only=tuple(sys.argv[1:]))
