"""Fused Pallas VEGAS sampler tests (mcubes/pallas_vegas.py).

The kernel's arithmetic is verified against a jnp mirror of the exact
same math fed the exact same uniform bits (rng='input' -- Mosaic's
hardware PRNG has no CPU lowering, so interpret-mode tests inject
Threefry bits; on TPU the only difference is where the bits come from).
End-to-end behavior (convergence, determinism, frozen-phase routing,
grid adaptation, mesh SPMD) runs through ``vegas(sampler='pallas')``.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu.mcubes import vegas as V
from gpuintegration_tpu.mcubes.pallas_vegas import TINY, poly_sample_chunk
from gpuintegration_tpu.mcubes.poly_importance import (
    eval_map_and_weight, fit_importance_poly)


def _gauss5(a, b, c, d, e):
    s = ((a - 0.5) ** 2 + (b - 0.5) ** 2 + (c - 0.5) ** 2
         + (d - 0.5) ** 2 + (e - 0.5) ** 2)
    return jnp.exp(-25.0 * s)


_GAUSS5_TRUTH = (math.sqrt(math.pi / 25.0) * math.erf(2.5)) ** 5


class TestKernelArithmetic:
    def test_matches_jnp_mirror(self):
        """Injected-bits kernel output == the same math in plain jnp:
        covers stratified decode, bit->uniform, the joint Chebyshev
        map, volume fold/clamp, masking of padded and >=ncubes cubes,
        the per-cube (fb, f2b) reduction, and the hist (ia, f2) pair."""
        ndim, ng, npg, nbins = 3, 6, 2, 50
        ncubes = ng ** ndim                   # 216 < chunk: exercises mask
        chunk_cubes, A = 256, 1               # 2 tiles of 128 cubes
        rng = np.random.default_rng(0)
        edges = np.sort(rng.uniform(0.05, 1.0, (ndim, nbins - 1)), axis=1)
        xi = np.concatenate([np.zeros((ndim, 1)), edges,
                             np.ones((ndim, 1))], axis=1)
        p_np, q_np = fit_importance_poly(xi, 8)
        p_c = jnp.asarray(p_np, jnp.float32)
        q_c = jnp.asarray(q_np, jnp.float32)
        lo = jnp.asarray([0.1, -1.0, 0.0])
        hi = jnp.asarray([0.9, 2.0, 1.0])
        dx = hi - lo
        xjac = 0.37

        def f_axes(x, y, z):
            return jnp.exp(-(x * x + 2 * y * y)) + 0.5 * jnp.cos(3 * z)

        n_tiles = -(-chunk_cubes // (A * 128))
        bits = jax.random.bits(jax.random.PRNGKey(7),
                               (npg * ndim, n_tiles * A, 128), jnp.uint32)
        acc, ia_k, f2_k = poly_sample_chunk(
            f_axes, ndim, ng, npg, chunk_cubes, nbins, True,
            p_c, q_c, lo, dx, jnp.asarray(xjac),
            jnp.asarray(0, jnp.int32), jnp.asarray(ncubes, jnp.int32),
            None, bits, tile_a=A, interpret=True)

        # ---- mirror ----
        bits_np = np.asarray(bits)
        N = n_tiles * A * 128
        local = np.arange(N)
        valid = (local < chunk_cubes) & (local < ncubes)
        kg = np.zeros((N, ndim), np.int64)
        m = local.copy()
        for d in range(ndim):
            p = ng ** (ndim - d - 1)
            t = m // p
            kg[:, d] = t
            m = m - t * p
        fb = np.zeros(N, np.float32)
        f2s = np.zeros(N, np.float32)
        ia_m = np.zeros((ndim, npg, N), np.int32)
        f2_m = np.zeros((npg, N), np.float32)
        for ps in range(npg):
            s_cols = []
            for d in range(ndim):
                b = bits_np[ps * ndim + d].reshape(-1)
                u = ((b >> np.uint32(8)).astype(np.float32)
                     * np.float32(2.0 ** -24))
                s = ((kg[:, d].astype(np.float32) + (np.float32(1) - u))
                     * np.float32(1.0 / ng))
                s_cols.append(s)
                ia_m[d, ps] = np.clip((s * nbins).astype(np.int32),
                                      0, nbins - 1)
            coords, w = eval_map_and_weight(
                p_c, q_c, jnp.asarray(np.stack(s_cols, -1), jnp.float32))
            lo32 = np.asarray(lo, np.float32)
            dx32 = np.asarray(dx, np.float32)
            x = np.clip(lo32 + np.asarray(coords, np.float32) * dx32,
                        lo32, lo32 + dx32)
            fx = np.asarray(
                f_axes(*[jnp.asarray(x[:, d]) for d in range(ndim)]),
                np.float32)
            fx = np.where(valid, fx * np.asarray(w, np.float32)
                          * np.float32(xjac), 0.0).astype(np.float32)
            fb += fx
            f2_m[ps] = fx * fx
            f2s += f2_m[ps]
        sq = np.sqrt(f2s * np.float32(npg))
        f2b = (sq - fb) * (sq + fb)
        f2b = np.where(f2b <= 0.0, np.float32(TINY), f2b)
        f2b = np.where(valid, f2b, 0.0)

        acc_np = np.asarray(acc)
        assert np.isclose(acc_np[:, 0, :].sum(dtype=np.float64),
                          fb.sum(dtype=np.float64), rtol=2e-5)
        assert np.isclose(acc_np[:, 1, :].sum(dtype=np.float64),
                          f2b.sum(dtype=np.float64), rtol=2e-4)
        # hist pair: kernel emits per-tile p-major blocks of A*128
        B = A * 128
        ia_e = np.zeros_like(np.asarray(ia_k))
        f2_e = np.zeros_like(np.asarray(f2_k))
        for t in range(n_tiles):
            for ps in range(npg):
                dst = slice((t * npg + ps) * B, (t * npg + ps + 1) * B)
                src = slice(t * B, (t + 1) * B)
                ia_e[:, dst] = ia_m[:, ps, src]
                f2_e[dst] = f2_m[ps, src]
        assert np.array_equal(np.asarray(ia_k), ia_e)
        assert np.allclose(np.asarray(f2_k), f2_e, rtol=2e-4, atol=1e-30)


class TestEndToEnd:
    def test_converges_and_deterministic(self):
        r1 = V.vegas(_gauss5, epsrel=1e-3, ncall=2e5, ndim=5,
                     total_iters=20, seed=3, sampler="pallas")
        r2 = V.vegas(_gauss5, epsrel=1e-3, ncall=2e5, ndim=5,
                     total_iters=20, seed=3, sampler="pallas")
        assert r1.status == 0
        rel = abs(r1.estimate - _GAUSS5_TRUTH) / _GAUSS5_TRUTH
        assert rel < 5 * max(r1.errorest / _GAUSS5_TRUTH, 1e-3)
        assert r1.estimate == r2.estimate and r1.errorest == r2.errorest

    def test_frozen_phase_routes_through_kernel(self):
        r = V.vegas(_gauss5, epsrel=1e-4, ncall=5e5, ndim=5,
                    total_iters=25, adjust_iters=3, seed=11,
                    sampler="pallas")
        assert r.iters > 3 and r.lastPhase == 1 and r.status == 0
        rel = abs(r.estimate - _GAUSS5_TRUTH) / _GAUSS5_TRUTH
        assert rel < 5 * max(r.errorest / _GAUSS5_TRUTH, 1e-4)

    def test_grid_adapts(self):
        """Adaptation iterations feed the kernel's (ia, f2) through the
        shared hist gate: the refined grid must concentrate bins inside
        the peak (narrower bins near 0.5 than at the boundary)."""
        st = V.VegasState(xi=__import__(
            "gpuintegration_tpu.mcubes.grid", fromlist=["uniform_grid"]
        ).uniform_grid(5, 500, jnp.float64))
        V.vegas(_gauss5, epsrel=1e-9, ncall=1e5, ndim=5, total_iters=6,
                adjust_iters=6, seed=5, sampler="pallas", state=st)
        xi = np.asarray(st.xi)
        widths = np.diff(xi, axis=1)
        mid = np.abs(xi[:, :-1] + widths / 2 - 0.5) < 0.1
        assert widths[mid].mean() < 0.5 * widths[~mid].mean()

    def test_mesh_spmd(self):
        from gpuintegration_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        assert mesh.devices.size == 8
        r = V.vegas(_gauss5, epsrel=1e-3, ncall=2e5, ndim=5,
                    total_iters=20, seed=3, sampler="pallas", mesh=mesh)
        assert r.status == 0
        rel = abs(r.estimate - _GAUSS5_TRUTH) / _GAUSS5_TRUTH
        assert rel < 5 * max(r.errorest / _GAUSS5_TRUTH, 1e-3)


class TestValidation:
    def test_batched_integrand_rejected(self):
        with pytest.raises(ValueError, match="scalar-per-axis"):
            V.vegas(lambda x: jnp.exp(-jnp.sum(x * x, -1)), ndim=4,
                    ncall=1e4, sampler="pallas")

    def test_grid_importance_rejected(self):
        with pytest.raises(ValueError, match="poly"):
            V.vegas(_gauss5, ncall=1e4, importance="grid",
                    sampler="pallas")

    def test_auto_stays_xla_off_tpu(self):
        # CPU backend without the force env: auto must resolve to 'xla'
        # (kernel math still works in interpret mode, but auto never
        # opts in off-TPU)
        r = V.vegas(_gauss5, epsrel=1e-2, ncall=5e4, ndim=5,
                    total_iters=8, seed=1, eval_dtype=jnp.float32)
        assert r.status in (0, 1)   # resolved + ran the XLA path
