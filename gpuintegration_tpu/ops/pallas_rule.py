"""Pallas fused rule-evaluation kernel (f32 fast path).

The hot-loop analogue of the reference's SampleRegionBlock
(reference: cuda/pagani/quad/GPUquad/Sample.cuh:152-290): point
generation, integrand evaluation and the rule contraction fused into one
kernel per region tile, so the (regions x points) coordinate and value
tensors never round-trip HBM (the XLA path materialises the value matrix
as the contraction input).

TPU-native design decisions:
  * dims-major layouts -- pools are (ndim, C) and generators (ndim, P) so
    VMEM tiles are (8, 128)-aligned with no lane padding; per-dim point
    coordinates are (TILE_R, P) 2-D arrays handed to scalar-per-axis
    integrands (the cubacpp calling convention, arity.hh:36-75).
  * ONE MXU matmul per tile computes everything downstream of the
    integrand: the 5 embedded rule sums, the center value, and both
    fourth-difference orbit sums are packed as columns of a single
    (P, 128) constant matrix; the kernel emits those 128 columns per
    region and the cheap column arithmetic (error model, argmax) runs in
    plain XLA on (C, 128) data.  (A monolithic kernel with the column
    arithmetic inside trips a Mosaic legalization bug on this toolchain;
    the split costs one extra (C,128) HBM round-trip, negligible.)
  * f32 only: Mosaic has no f64 on TPU.  This is the fast path for
    moderate tolerances (>= ~1e-5); the f64 XLA path (ops.rule_eval)
    remains the default for deep tolerances.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuintegration_tpu.ops.genz_malik import genz_malik_rule

_ERRCOEFF = (5.0, 1.0, 5.0)
LANES = 128


@functools.lru_cache(maxsize=None)
def _combined_matrix(ndim: int):
    """(P, 128) f32 constant: cols 0..4 rule weights, col 5 center
    selector, cols 6..6+n orbit-1 pair sums, cols 6+n..6+2n orbit-2."""
    rule = genz_malik_rule(ndim)
    pts, wts = rule.padded(LANES)
    P = pts.shape[0]
    m = np.zeros((P, LANES), dtype=np.float32)
    m[:, :5] = wts[:, :5]
    m[0, 5] = 1.0  # center point
    for d in range(ndim):
        m[1 + 2 * d, 6 + d] = 1.0
        m[2 + 2 * d, 6 + d] = 1.0
        m[1 + 2 * ndim + 2 * d, 6 + ndim + d] = 1.0
        m[2 + 2 * ndim + 2 * d, 6 + ndim + d] = 1.0
    gen = np.zeros((ndim, P), dtype=np.float32)
    gen[:, :rule.feval] = pts[:rule.feval].T
    scale = rule.scale[:, 1:4].astype(np.float32)   # (9, 3)
    norm = rule.norm[:, 1:4].astype(np.float32)
    return m, gen, scale, norm, float(rule.ratio), rule.feval, P


def _make_kernel(f_axes: Callable, ndim: int):
    def kernel(center_ref, glen_ref, gen_ref, m_ref, out_ref):
        # per-dim coordinates: x_d = center_d - gen_d * len_d, (TILE_R, P)
        xs = []
        for d in range(ndim):
            c = center_ref[d, :]
            l = glen_ref[d, :]
            xs.append(c[:, None] - gen_ref[d, :][None, :] * l[:, None])
        vals = f_axes(*xs)                               # (TILE_R, P)
        # HIGHEST: 3-pass bf16 reproduces f32 products exactly -- the
        # null-rule columns of m are cancelling residues (see rule_eval)
        out_ref[:] = jnp.dot(vals, m_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("f_axes", "ndim", "tile_r", "interpret"))
def pallas_apply_rule(
    f_axes: Callable,
    ndim: int,
    lows: jax.Array,        # (ndim, C) f32, unit space (dims-major)
    lengths: jax.Array,     # (ndim, C)
    global_lo: jax.Array,   # (ndim,)
    global_range: jax.Array,
    *,
    tile_r: int = 128,
    interpret: bool = False,
):
    """Fused f32 rule application.

    ``f_axes`` is a scalar-per-axis integrand f(x0, ..., x_{n-1}) operating
    elementwise on (TILE_R, P) coordinate arrays (cubacpp convention; jnp
    ops only).  Returns (estimate (C,), errorest (C,), split_dim (C,)).
    """
    C = lows.shape[1]
    assert C % tile_r == 0, (C, tile_r)
    f32 = jnp.float32
    lows = lows.astype(f32)
    lengths = lengths.astype(f32)
    gl = global_lo.astype(f32)
    gr = global_range.astype(f32)

    # fold the global volume transform into the dims-major pool arrays
    gcenter = gl[:, None] + (lows + 0.5 * lengths) * gr[:, None]  # (n, C)
    glen = lengths * gr[:, None]                                   # (n, C)

    m, gen, scale, norm, ratio, feval, P = _combined_matrix(ndim)
    kernel = _make_kernel(f_axes, ndim)
    grid = (C // tile_r,)
    pool_spec = pl.BlockSpec((ndim, tile_r), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    gen_spec = pl.BlockSpec((ndim, P), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((P, LANES), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # x64 mode breaks Mosaic lowering (int64 literals in index maps fail to
    # legalize); trace the kernel with x64 off -- everything here is f32.
    with jax.enable_x64(False):
        mixed = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pool_spec, pool_spec, gen_spec, m_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((C, LANES), f32),
            interpret=interpret,
        )(gcenter, glen, jnp.asarray(gen), jnp.asarray(m))

    # cheap column arithmetic in plain XLA on (C, <=22) data
    sums = mixed[:, :5]
    f0 = mixed[:, 5]
    o1 = mixed[:, 6:6 + ndim]
    o2 = mixed[:, 6 + ndim:6 + 2 * ndim]
    fourth = jnp.abs((2.0 * (1.0 - ratio)) * f0[:, None] + ratio * o1 - o2)
    widest = jnp.argmax(lengths, axis=0).astype(jnp.int32)
    best = jnp.argmax(fourth, axis=1).astype(jnp.int32)
    split_dim = jnp.where(jnp.max(fourth, axis=1) > 0, best, widest)

    sc = scale[None, :, :]                                # (1, 9, 3)
    nm = norm[None, :, :]
    s_r = sums[:, 1:4]
    s_r1 = sums[:, 2:5]
    errs = jnp.max(
        jnp.abs(s_r1[:, None, :] + sc * s_r[:, None, :]) * nm, axis=1)
    e1, e2, e3 = errs[:, 0], errs[:, 1], errs[:, 2]
    gated = jnp.where(
        (_ERRCOEFF[0] * e1 <= e2) & (_ERRCOEFF[0] * e2 <= e3),
        _ERRCOEFF[1] * e1,
        _ERRCOEFF[2] * jnp.maximum(jnp.maximum(e1, e2), e3))

    vol = jnp.prod(glen, axis=0)                          # (C,)
    return vol * sums[:, 0], vol * gated, split_dim
