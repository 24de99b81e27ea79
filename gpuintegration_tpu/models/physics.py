"""Physics-likelihood workload: a cluster-cosmology-flavored integrand.

The reference validates against a real cosmology model -- a LambdaCDM
comoving-volume element times an interpolated halo-mass-function table
(reference: test/cuda/pagani/model.cu EZ/DV_DO_DZ + Interp2D over
data/HMF_t.dump, consumed by test_cpu_vs_gpu.cu:12-23).  This module
builds an analogous (original, synthetic) 6D likelihood integrand that
exercises the same machinery: a device-callable Interp2D table inside the
integrand, smooth cosmology-like factors, and Gaussian observational
scatter kernels.

Dimensions: (z, logM_unit, obs1, obs2, bias, amp) mapped from [0,1]^6.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.ops.interp import Interp2D
from gpuintegration_tpu.types import Volume


def _ez(z, omega_m=0.3, omega_l=0.7, omega_k=0.0):
    """Simplified LambdaCDM expansion rate E(z)."""
    zp1 = 1.0 + z
    return jnp.sqrt(omega_m * zp1 ** 3 + omega_k * zp1 ** 2 + omega_l)


def make_hmf_table(n_mass: int = 64, n_z: int = 32) -> Interp2D:
    """Synthetic halo-mass-function-like table n(logM, z): log-normal mass
    peak with redshift decay, sampled on a rectilinear grid."""
    log_m = np.linspace(12.0, 15.0, n_mass)
    zs = np.linspace(0.0, 2.0, n_z)
    table = (np.exp(-0.5 * ((log_m[None, :] - 13.2) / 0.6) ** 2)
             * (1.0 + zs[:, None]) ** -2.0)
    return Interp2D(log_m, zs, table)


class ClusterLikelihood:
    """6D toy cluster-count likelihood.

    f(u) = dV-like(z) * HMF(logM, z) * N(obs1 | logM) * N(obs2 | z)
           * N(bias | 1) * amp-weight
    over the unit cube (all variables pre-scaled).  Carries its Interp2D
    state as a pytree closure -- the stateful-integrand pattern
    (reference: StatefulIntegrand.cu, cuda_copy_to_managed).
    """

    ndim = 6

    def __init__(self, omega_m: float = 0.3, hmf: Interp2D | None = None,
                 *, interp_precision: str | None = None):
        """``hmf``: optionally supply the table, e.g. one deserialised
        from a reference-format hexfloat dump (Interp2D.from_text) --
        the reference's own pipeline loads data/HMF_t.dump this way
        (test/cuda/pagani/test_cpu_vs_gpu.cu).

        ``interp_precision``: forwarded to the table's dense-contraction
        precision (ops.interp._PRECISIONS).  "f32" is the deep-run fast
        path: the table lookup runs TPU-native f32 (~1e-7 relative, below
        any physical table's own accuracy) while every rule sum stays
        f64; equivalence is pinned in tests/test_physics_model.py."""
        self.omega_m = omega_m
        self.hmf = make_hmf_table() if hmf is None else hmf
        if interp_precision is not None:
            self.hmf = self.hmf.with_precision(interp_precision)

    def __call__(self, x):
        z = 2.0 * x[..., 0]                    # z in [0, 2]
        log_m = 12.0 + 3.0 * x[..., 1]         # logM in [12, 15]
        obs1 = x[..., 2]
        obs2 = x[..., 3]
        bias = 0.5 + x[..., 4]                 # in [0.5, 1.5]
        amp = x[..., 5]

        ez = _ez(z, self.omega_m, 1.0 - self.omega_m)
        dv = (1.0 + z) ** 2 / ez               # volume-element flavor
        hmf = self.hmf(log_m, z)
        like1 = jnp.exp(-0.5 * ((obs1 - (log_m - 12.0) / 3.0) / 0.15) ** 2)
        like2 = jnp.exp(-0.5 * ((obs2 - z / 2.0) / 0.2) ** 2)
        like3 = jnp.exp(-0.5 * ((bias - 1.0) / 0.25) ** 2)
        return dv * hmf * like1 * like2 * like3 * (0.5 + amp)

    # numpy twin for the CPU oracle (point-wise)
    def numpy_pointwise(self):
        hmf_xs = np.asarray(self.hmf.xs)
        hmf_ys = np.asarray(self.hmf.ys)
        hmf_zs = np.asarray(self.hmf.zs)
        omega_m = self.omega_m

        def f(x):
            z = 2.0 * x[0]
            log_m = 12.0 + 3.0 * x[1]
            obs1, obs2 = x[2], x[3]
            bias = 0.5 + x[4]
            amp = x[5]
            zp1 = 1.0 + z
            ez = math.sqrt(omega_m * zp1 ** 3 + (1 - omega_m))
            dv = zp1 ** 2 / ez
            # bilinear interp (mirror of ops.interp.Interp2D)
            i = np.clip(np.searchsorted(hmf_xs, log_m, side="right") - 1,
                        0, len(hmf_xs) - 2)
            j = np.clip(np.searchsorted(hmf_ys, z, side="right") - 1,
                        0, len(hmf_ys) - 2)
            tx = (log_m - hmf_xs[i]) / (hmf_xs[i + 1] - hmf_xs[i])
            ty = (z - hmf_ys[j]) / (hmf_ys[j + 1] - hmf_ys[j])
            top = hmf_zs[j, i] + tx * (hmf_zs[j, i + 1] - hmf_zs[j, i])
            bot = hmf_zs[j + 1, i] + tx * (hmf_zs[j + 1, i + 1]
                                           - hmf_zs[j + 1, i])
            hmf = top + ty * (bot - top)
            like1 = math.exp(-0.5 * ((obs1 - (log_m - 12.0) / 3.0) / 0.15) ** 2)
            like2 = math.exp(-0.5 * ((obs2 - z / 2.0) / 0.2) ** 2)
            like3 = math.exp(-0.5 * ((bias - 1.0) / 0.25) ** 2)
            return dv * hmf * like1 * like2 * like3 * (0.5 + amp)

        return f

    @property
    def volume(self) -> Volume:
        return Volume(ndim=self.ndim)
