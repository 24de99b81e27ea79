"""Generate the reference-style epsrel-ladder CSVs on real TPU hardware.

Mirrors the reference's demo pattern (one CSV row per run, epsrel
tightened 5x until failure -- cuda/pagani/demos/new_interface_*.cu via
clean_time_and_call).  Usage:  python docs/results/run_ladders.py
Writes docs/results/pagani_ladders.csv.  Runtime: minutes (warm ~seconds
per row thanks to the fused adaptive phase; first compiles dominate).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gpuintegration_tpu import Workspace               # noqa: E402
from gpuintegration_tpu.models import genz, misc       # noqa: E402
from gpuintegration_tpu.utils import timing            # noqa: E402


def main(out_path=None):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "pagani_ladders.csv")
    cases = [
        ("f4_gaussian_3d", genz.f4_gaussian(3, a=5.0), 3, 1e-7),
        ("f2_product_peak_5d", genz.f2_product_peak(5), 5, 1e-7),
        ("f4_gaussian_6d", genz.f4_gaussian(6, a=6.0), 6, 1e-7),
        ("fun6", misc.fun6(), 6, 1e-7),
        ("f3_corner_peak_7d", genz.f3_corner_peak(7), 7, 1e-7),
    ]
    with open(out_path, "w") as fh:
        print(timing.PAGANI_CSV_HEADER, file=fh)
        for name, g, ndim, floor in cases:
            ws = Workspace(ndim)
            achieved = timing.epsrel_ladder(
                name, g, g.true_value, fh, start=1e-3, floor=floor,
                runs_per_epsrel=1, workspace=ws)
            print(f"# {name}: achieved epsrel {achieved}", file=fh)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
