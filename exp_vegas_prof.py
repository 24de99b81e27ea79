"""EXP: where does VEGAS sampling time go?  Times the poly iteration with
and without the adaptation histogram, plus a randoms+clenshaw-only and an
integrand-only variant, on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.integrand import make_integrand
from gpuintegration_tpu.models import genz
from gpuintegration_tpu.mcubes import vegas as V
from gpuintegration_tpu.mcubes import grid as vgrid
from gpuintegration_tpu.mcubes.poly_importance import (
    fit_importance_poly, eval_map_and_weight)

ndim = 6
ncall = 1e7
g = genz.f4_gaussian(ndim, a=8.0)
f, _ = make_integrand(g, ndim)

ng, ncubes = V.compute_ncubes(ncall, ndim)
npg = V.samples_per_cube(ncall, ncubes)
chunk_cubes = min(1 << 20, ncubes)
num_chunks = -(-ncubes // chunk_cubes)
print(f"ng={ng} ncubes={ncubes} npg={npg} chunks={num_chunks}x{chunk_cubes}")

xi = np.tile(np.linspace(0, 1, 51)[None, 1:], (ndim, 1))
p_c, dp_c = fit_importance_poly(np.concatenate([np.zeros((ndim, 1)), xi], 1))
p_c = jnp.asarray(p_c, jnp.float32)
dp_c = jnp.asarray(dp_c, jnp.float32)
regn_lo = jnp.zeros(ndim)
dx = jnp.ones(ndim)
xjac = jnp.asarray(1.0 / (ncubes * npg))
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    rate = ncubes * npg / best
    print(f"{name:28s} {best*1e3:8.1f} ms   {rate/1e6:8.1f} M samples/s")
    return out


# full iteration with histogram (adjustment phase)
timeit("poly + hist", lambda: V._vegas_iteration_poly(
    f, ndim, ng, npg, chunk_cubes, num_chunks, 50, True, "float64",
    key, p_c, dp_c, regn_lo, dx, xjac, ncubes))
# frozen phase (no histogram)
timeit("poly no hist", lambda: V._vegas_iteration_poly(
    f, ndim, ng, npg, chunk_cubes, num_chunks, 50, False, "float64",
    key, p_c, dp_c, regn_lo, dx, xjac, ncubes))


# --- stripped variants to attribute cost ------------------------------
@jax.jit
def randoms_only():
    def body(c, acc):
        ck = jax.random.fold_in(key, c)
        ran = jax.random.uniform(ck, (chunk_cubes, npg, ndim), jnp.float32)
        return acc + jnp.sum(ran)
    return jax.lax.fori_loop(0, num_chunks, body, jnp.zeros((), jnp.float32))


@jax.jit
def randoms_clenshaw():
    def body(c, acc):
        ck = jax.random.fold_in(key, c)
        ran = jax.random.uniform(ck, (chunk_cubes, npg, ndim), jnp.float32)
        rc, w = eval_map_and_weight(p_c, dp_c, ran)
        return acc + jnp.sum(rc) + jnp.sum(w)
    return jax.lax.fori_loop(0, num_chunks, body, jnp.zeros((), jnp.float32))


@jax.jit
def randoms_integrand():
    def body(c, acc):
        ck = jax.random.fold_in(key, c)
        ran = jax.random.uniform(ck, (chunk_cubes, npg, ndim), jnp.float32)
        fx = f(ran.astype(jnp.float64))
        return acc + jnp.sum(fx)
    return jax.lax.fori_loop(0, num_chunks, body, jnp.zeros((), jnp.float64))


@jax.jit
def randoms_integrand_f32():
    def body(c, acc):
        ck = jax.random.fold_in(key, c)
        ran = jax.random.uniform(ck, (chunk_cubes, npg, ndim), jnp.float32)
        fx = f(ran)
        return acc + jnp.sum(fx)
    return jax.lax.fori_loop(0, num_chunks, body,
                             jnp.zeros((), jnp.float32))


timeit("randoms only", randoms_only)
timeit("randoms + clenshaw", randoms_clenshaw)
timeit("randoms + integrand f64", randoms_integrand)
timeit("randoms + integrand f32", randoms_integrand_f32)
