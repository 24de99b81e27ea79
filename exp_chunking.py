"""EXP: dispatch-overhead of host-loop vs in-jit chunked rule eval at a
large bucket, on the real TPU.  Run standalone: python exp_chunking.py"""
import time

import jax
import jax.numpy as jnp

from gpuintegration_tpu.integrand import make_integrand
from gpuintegration_tpu.models import genz
from gpuintegration_tpu.ops import rule_eval
from gpuintegration_tpu.pagani import region_pool

ndim = 8
chunk = 1 << 13
cap = 1 << 20          # 1M regions = 128 chunks
g = genz.f4_gaussian(ndim)
f, _ = make_integrand(g, ndim)
tables = rule_eval.rule_tables(ndim, "float64")
gl = jnp.zeros(ndim)
gr = jnp.ones(ndim)
lo, ln, _ = region_pool.uniform_split(ndim, 2, cap)


def host_loop():
    outs = []
    for i in range(cap // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        outs.append(jax.jit(lambda a, b: rule_eval.apply_rule(
            f, tables, a, b, gl, gr))(lo[:, sl], ln[:, sl]))
    return jax.block_until_ready(outs[-1][0])


fused = jax.jit(lambda a, b: rule_eval.apply_rule(
    f, tables, a, b, gl, gr, chunk_size=chunk))

t0 = time.perf_counter(); host_loop(); print("host warm1", time.perf_counter() - t0)
t0 = time.perf_counter(); host_loop(); print("host warm2", time.perf_counter() - t0)

t0 = time.perf_counter()
jax.block_until_ready(fused(lo, ln))
print("fused cold(compile)", time.perf_counter() - t0)
for i in range(2):
    t0 = time.perf_counter()
    jax.block_until_ready(fused(lo, ln))
    print("fused warm", time.perf_counter() - t0)

rate = cap * tables.feval
print("fused evals/s at 1M:", rate / (time.perf_counter() - t0))
