"""One-off rung retry: f1_oscillatory 8D at epsrel=1e-4, appending to
pagani_ladders_8d.csv.

The recorded 1e-4 miss was a certificate wall of the oscillatory kind:
every continuation slice is already "converged" relative to its own
signed estimate (slice |est| ~ 1e-3 vs the integral 3.4e-5), so slices
banked their stored errors untouched and the banked sum (4.29e-9)
overshot the global budget (3.44e-9) -- bit-identically under
finish_epsrel_scale 0.4 and 0.2 (the s40/s20 rows; retirement never
fires, the slice-level accuracy test exits first).  The dynamic slice
targets in workspace._partitioned_continuation (re-apportion the
remaining budget by stored-error share, tighten each slice to its share,
volume-apportioned retirement for the zero-crossing regions) engage
automatically -- see docs/DESIGN.md section 3a.

Env knobs: GPUINT_TPU_RETRY_EPSREL (default 1e-4),
GPUINT_TPU_RETRY_WALL_S (default 3000), GPUINT_TPU_RETRY_SCALE
(optional finish_epsrel_scale; default off).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("GPUINT_TPU_CONTINUATION_LOG", "1")

from gpuintegration_tpu import Workspace               # noqa: E402
from gpuintegration_tpu.models import genz             # noqa: E402
from gpuintegration_tpu.utils import timing            # noqa: E402


def main():
    out_path = os.path.join(os.path.dirname(__file__),
                            "pagani_ladders_8d.csv")
    epsrel = float(os.environ.get("GPUINT_TPU_RETRY_EPSREL", "1e-4"))
    wall = float(os.environ.get("GPUINT_TPU_RETRY_WALL_S", "3000"))
    scale = os.environ.get("GPUINT_TPU_RETRY_SCALE")
    extra, tag = {}, "dyn"
    if scale is not None:
        extra["finish_epsrel_scale"] = float(scale)
        tag = f"s{int(float(scale) * 100):02d}"
    g = genz.f1_oscillatory(8)
    ws = Workspace(8)
    with open(out_path, "a") as fh:
        print(f"# dynamic-slice-target rung retry ({tag}, "
              f"epsrel={epsrel:.0e}, max_wall_s={wall:.0f})",
              file=fh, flush=True)
        t0 = time.time()
        good = timing.clean_time_and_call(
            f"f1_oscillatory_8d_{tag}", g, epsrel, g.true_value, fh,
            ndim=8, runs_per_epsrel=1, workspace=ws, continuation=True,
            max_wall_s=wall, **extra)
        print(f"# good={good} wall={time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
