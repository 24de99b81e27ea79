"""VEGAS sampling-throughput table on real TPU hardware.

Sweeps the importance map (poly default / grid parity) and the
adjust/frozen split at 6D, 5e7 calls per iteration -- the configurations
behind README's VEGAS rows -- so round-over-round regressions are
visible in-repo.  Each row: one warmup (compile) + best of 2 timed runs
with distinct seeds (the runtime elides repeated identical dispatches,
so seeds differ; per-run work is identical).

Usage:  python docs/results/run_vegas_table.py
Writes docs/results/vegas_throughput.csv.  Runtime: a few minutes warm,
~15 min with cold compiles.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402

from gpuintegration_tpu.mcubes.vegas import vegas       # noqa: E402


def gauss6(x0, x1, x2, x3, x4, x5):
    # scalar-per-axis so every sampler (XLA batched, fused Pallas) can
    # run the identical integrand
    s = 0.0
    for x in (x0, x1, x2, x3, x4, x5):
        s = s + (x - 0.5) ** 2
    return jnp.exp(-8.0 * s)


CASES = [
    # (label, vegas kwargs beyond the base config).  Samplers are pinned
    # EXPLICITLY: eval_dtype=float32 would otherwise auto-select the
    # fused Pallas sampler on TPU and silently change what a row means
    # across rounds.
    ("poly_adjust5_frozen15", dict(importance="poly", total_iters=20,
                                   adjust_iters=5, sampler="xla")),
    ("poly_adjust20", dict(importance="poly", total_iters=20,
                           adjust_iters=20, sampler="xla")),
    ("poly_adjust5_frozen15_f32eval", dict(importance="poly",
                                           total_iters=20, adjust_iters=5,
                                           eval_dtype=jnp.float32,
                                           sampler="xla")),
    ("pallas_adjust5_frozen15", dict(importance="poly", total_iters=20,
                                     adjust_iters=5, sampler="pallas")),
    ("pallas_adjust20", dict(importance="poly", total_iters=20,
                             adjust_iters=20, sampler="pallas")),
    ("pallas_adjust5_frozen15_1e9", dict(importance="poly", total_iters=20,
                                         adjust_iters=5, sampler="pallas",
                                         ncall=1e9)),
    ("grid_adjust5_frozen15", dict(importance="grid", total_iters=20,
                                   adjust_iters=5,
                                   eval_dtype=jnp.float32)),
    ("grid_adjust20", dict(importance="grid", total_iters=20,
                           adjust_iters=20, eval_dtype=jnp.float32)),
]


def main(out_path=None, ncall=5e7, ndim=6):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "vegas_throughput.csv")
    base = dict(ncall=ncall, ndim=ndim, epsrel=1e-12)
    with open(out_path, "w") as fh:
        print("case,ndim,ncall,backend,total_iters,adjust_iters,neval,"
              "best_s,samples_per_s", file=fh, flush=True)
        for label, kw in CASES:
            kws = {**base, **kw}
            vegas(gauss6, seed=1, **kws)          # warmup/compile
            best, neval = float("inf"), 0
            for s in (2, 3):
                t0 = time.time()
                r = vegas(gauss6, seed=s, **kws)
                best = min(best, time.time() - t0)
                neval = r.neval
            rate = neval / best
            print(f"{label},{ndim},{kws['ncall']:.0e},"
                  f"{jax.default_backend()},"
                  f"{kws['total_iters']},{kws['adjust_iters']},{neval},"
                  f"{best:.3f},{rate:.3e}", file=fh, flush=True)
            print(f"{label:34s} {best:7.2f}s  {rate/1e6:7.1f}M samples/s",
                  flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
