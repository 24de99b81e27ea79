"""Rule-kernel throughput table for the README: 8D + 10D sweeps over the
three compute paths (f64 XLA, f32 XLA, f32 Pallas).

The protocol is the reference's call_cubature_rules sweep
(reference: cuda/pagani/demos/new_time_and_call.cuh:30-70 -- uniform
splits-per-dim sweep, repeats timed, best pass kept); repeats run inside
one jit with a carried dependency (axon runtimes elide repeated
identical dispatches, CLAUDE.md).

Usage:  python docs/results/run_profile_table.py
Writes docs/results/rule_throughput.csv.  Runtime: ~10 min on TPU
(first compiles dominate).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gpuintegration_tpu.models import genz                  # noqa: E402
from gpuintegration_tpu.utils import timing                 # noqa: E402


def gaussian_axes(ndim):
    """Scalar-per-axis twin of genz.f4_gaussian (a=25, b=0.5) -- the
    Mosaic kernel consumes per-axis columns (cubacpp convention)."""
    def g(*xs):
        s = 0.0
        for x in xs:
            s = s + (x - 0.5) ** 2
        import jax.numpy as jnp
        return jnp.exp(-625.0 * s)
    return g


def main(out_path=None):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "rule_throughput.csv")
    # splits chosen so pools span 3 decades (8D: 6.5k / 65k / 1.7M
    # regions; 10D: 1k / 59k / 1M) without the reference's 16M+ top rows
    # -- one 8^8 f64 row alone is ~40 min of device time for no extra
    # information (throughput saturates by ~1M regions).
    configs = [
        # (ndim, dtype, backend, splits sweep)
        (8, "float64", "xla", (3, 4, 6)),
        (8, "float32", "xla", (3, 4, 6)),
        (8, "float32", "pallas", (3, 4, 6)),
        (10, "float64", "xla", (2, 3, 4)),
        (10, "float32", "xla", (2, 3, 4)),
        (10, "float32", "pallas", (2, 3, 4)),
    ]
    with open(out_path, "w") as fh:
        print("ndim,dtype,backend,splits_per_dim,regions,padded_capacity,"
              "feval,best_s,evals_per_sec", file=fh)
        for ndim, dtype, backend, splits in configs:
            g = (gaussian_axes(ndim) if backend == "pallas"
                 else genz.f4_gaussian(ndim))
            rows = timing.call_cubature_rules(
                g, ndim, splits_per_dim=splits, repeats=5,
                dtype=dtype, backend=backend)
            for r in rows:
                print(f"{ndim},{dtype},{backend},{r['splits_per_dim']},"
                      f"{r['regions']},{r['padded_capacity']},"
                      f"{r['feval']},{r['best_s']:.6e},"
                      f"{r['evals_per_sec']:.6e}", file=fh)
            fh.flush()
            best = max(r["evals_per_sec"] for r in rows)
            print(f"{ndim}D {dtype} {backend}: peak {best:.3e} evals/s",
                  flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
