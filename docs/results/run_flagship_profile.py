"""Phase-level wall breakdown of the flagship certified run.

Times every Workspace.integrate call (round-1 wall run + each
continuation slice), make_checkpoint, and the total, on the real TPU.
"""
import time

import gpuintegration_tpu
from gpuintegration_tpu import Workspace
from gpuintegration_tpu.models import genz

orig_integrate = Workspace.integrate
orig_ckpt = Workspace.make_checkpoint


def timed_integrate(self, *a, **k):
    ir = k.get("initial_regions")
    n0 = ir[0].shape[0] if ir is not None else None
    t0 = time.perf_counter()
    r = orig_integrate(self, *a, **k)
    dt = time.perf_counter() - t0
    print(f"[integrate] n_init={n0} epsrel={a[1] if len(a) > 1 else k.get('epsrel')} "
          f"wall={dt:.1f}s status={r.status} iters={r.iters} "
          f"neval={r.neval:.3e} nregions={r.nregions}", flush=True)
    return r


def timed_ckpt(self):
    t0 = time.perf_counter()
    ck = orig_ckpt(self)
    dt = time.perf_counter() - t0
    print(f"[checkpoint] n={ck.lows.shape[0]} wall={dt:.1f}s", flush=True)
    return ck


Workspace.integrate = timed_integrate
Workspace.make_checkpoint = timed_ckpt

g = genz.f4_gaussian(8)
ws = Workspace(8)
t0 = time.perf_counter()
res = ws.integrate_to_convergence(g, epsrel=1e-5, epsabs=1e-40,
                                  max_wall_s=2400.0)
dt = time.perf_counter() - t0
rel = abs(res.estimate - g.true_value) / abs(g.true_value)
print(f"[total] wall={dt:.1f}s status={res.status} rel={rel:.2e} "
      f"neval={res.neval:.3e} nregions={res.nregions}", flush=True)
