"""Fully-fused Pallas VEGAS sampler (poly importance, f32 eval).

The XLA poly path (mcubes.vegas._vegas_iteration_poly) is already
gather-free, but each chunk still materializes the (C, npg, ndim)
Threefry randoms and the coordinate/weight intermediates through HBM,
and the Threefry keystream itself is ~100 ALU ops per 32 random bits.
This kernel is the m-CUBES sampling loop the way the reference's
vegas_kernel is (reference: cuda/mcubes/vegasT.cuh:401-490 -- per-thread
sub-cube loop, in-register point generation, warp-level accumulation),
re-expressed for the TPU memory hierarchy:

  per-thread LCG (vegas_utils.cuh:24-49)   -> per-core hardware PRNG
                                              (pltpu.prng_random_bits)
  xi[] shared-memory bin lookup            -> SMEM Chebyshev coefficients,
                                              joint P/q Horner recurrence
                                              on (A, 128) VMEM tiles
  atomicAdd(result_dev) block reduction    -> per-tile lane-partial sums,
                                              f64-combined outside
  atomicAdd d[bin,dim] histogram           -> (ia, f2) emitted dims-major
                                              to the VMEM hist kernel
                                              (pallas_lookup.hist_pallas)

Everything between the random bits and the per-cube (fb, f2b) pair lives
in VMEM/registers; HBM traffic for a frozen-phase iteration is ~1 kB of
partial sums per 16k-cube tile (vs ~(5 + ndim) f32 round-trips per
sample on the XLA path).

Layout notes (docs/DESIGN.md invariants): all sample tensors are
(A, 128) blocks -- cubes on the lane axis, 128-aligned, never a small
minor axis; the npg sample slots are a static Python loop, so no
(C, npg, ndim) array ever exists.  f32 only (Mosaic has no f64);
accumulators are widened to f64 outside the kernel at per-lane
granularity (summation depth inside the kernel is A*npg <= ~512).

RNG: ``rng='device'`` seeds the core PRNG with (key-word0, key-word1,
tile-id) -- deterministic for a fixed (seed, chunk/tile decomposition),
but a DIFFERENT stream family than the Threefry XLA path (the estimator
is unbiased for any uniform stream; tested statistically on TPU).
``rng='input'`` takes the uniform bits as an input tensor instead --
used on CPU/interpret (Mosaic's prng has no CPU lowering) and by the
kernel-arithmetic parity tests, which mirror the exact math in jnp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TINY = 1.0e-30      # per-cube variance floor (vegas_utils.cuh:140)
# sublane rows per tile: TILE_C = A * 128 cubes.  Swept 8..256 on v5e at
# 6D/1e9-call frozen phase: 2.9/3.7/4.1/4.3/3.7/2.7 B samples/s for
# A = 8/16/32/64/128/256 -- 64 peaks (32k cubes: VMEM working set ~2 MB,
# grid overhead amortized, no spill).  Override: GPUINT_TPU_VEGAS_TILE_A.
DEFAULT_A = 64


def _cheb_joint(p_flat_ref, q_flat_ref, d: int, kp: int, kq: int, t):
    """Joint Chebyshev T_i recurrence for P_d (kp terms) and q_d (first
    kq terms) at t in [-1, 1] -- the kernel twin of
    poly_importance.eval_map_and_weight's inner loop, with coefficients
    read as scalars from SMEM."""
    p0 = p_flat_ref[d * kp + 0]
    p1 = p_flat_ref[d * kp + 1]
    q0 = q_flat_ref[d * kq + 0]
    acc_p = p0 + p1 * t
    acc_q = q0 + (q_flat_ref[d * kq + 1] * t if kq > 1 else 0.0)
    t_prev, t_cur = jnp.ones_like(t), t
    t2 = t + t
    for i in range(2, kp):
        t_next = t2 * t_cur - t_prev
        acc_p = acc_p + p_flat_ref[d * kp + i] * t_next
        if i < kq:
            acc_q = acc_q + q_flat_ref[d * kq + i] * t_next
        t_prev, t_cur = t_cur, t_next
    return acc_p, acc_q


def _make_kernel(f_axes, ndim: int, ng: int, npg: int, kp: int, kq: int,
                 A: int, nbins: int, with_hist: bool, device_rng: bool,
                 emit_points: bool = False):
    f32 = jnp.float32
    inv_ng = 1.0 / ng
    tile_c = A * 128

    def kernel(sc_ref, vb_ref, pq_p_ref, pq_q_ref, *rest):
        if device_rng:
            ins, outs = (), rest
        else:
            ins, outs = rest[:1], rest[1:]
        if emit_points:
            # hybrid mode (f64 VEGAS): no integrand in-kernel; outputs
            # are the dims-major coordinates + importance weight the XLA
            # side evaluates/accumulates in the accumulator dtype
            xs_ref, wt_ref = outs[0], outs[1]
            hist_outs = outs[2:]
        else:
            acc_ref = outs[0]
            hist_outs = outs[1:]
        pid = pl.program_id(0)
        if device_rng:
            # the hardware PRNG seeds from <= 2 words on this toolchain:
            # fold the tile id into word 0 with a golden-ratio stride
            # (wrapping i32 -- Weyl-sequence tile separation)
            golden = jnp.int32(-1640531527)           # 0x9E3779B9
            pltpu.prng_seed(sc_ref[0] + pid * golden, sc_ref[1])

        rows = jax.lax.broadcasted_iota(jnp.int32, (A, 128), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (A, 128), 1)
        local = pid * tile_c + rows * 128 + lanes
        cube = sc_ref[2] + local                      # global cube id, i32
        valid = (local < sc_ref[4]) & (cube < sc_ref[3])

        # mixed-radix decode (get_indx, vegasT.cuh:141-162), 0-based
        kgs = []
        m = cube
        for d in range(ndim):
            p = ng ** (ndim - d - 1)
            t = m // p
            kgs.append(t.astype(f32))
            m = m - t * p

        xjac = vb_ref[2 * ndim]
        fb = jnp.zeros((A, 128), f32)
        f2s = jnp.zeros((A, 128), f32)
        for ps in range(npg):
            xs = []
            wgt = None
            ias = []
            for d in range(ndim):
                if device_rng:
                    bits = pltpu.prng_random_bits((A, 128))
                else:
                    bits = ins[0][ps * ndim + d]
                # >>8 keeps 24 bits: bitcast to i32 (identical value --
                # Mosaic has no u32->f32 cast) then exact f32 convert
                u = jax.lax.bitcast_convert_type(
                    jax.lax.shift_right_logical(
                        bits.astype(jnp.uint32), jnp.uint32(8)),
                    jnp.int32).astype(f32) * (2.0 ** -24)   # [0, 1)
                s = (kgs[d] + (1.0 - u)) * inv_ng     # ((kg-1)/ng, kg/ng]
                acc_p, acc_q = _cheb_joint(
                    pq_p_ref, pq_q_ref, d, kp, kq, 2.0 * s - 1.0)
                # coefficients are volume-folded: clamp to [lo_d, hi_d]
                # (poly_importance.eval_map_and_weight's unit-cube clip)
                xs.append(jnp.clip(acc_p, vb_ref[d], vb_ref[ndim + d]))
                w = acc_q * acc_q
                wgt = w if wgt is None else wgt * w
                if with_hist:
                    ias.append(jnp.clip((s * nbins).astype(jnp.int32),
                                        0, nbins - 1))
            if emit_points:
                for d in range(ndim):
                    xs_ref[d, ps * A:(ps + 1) * A, :] = xs[d]
                wt_ref[ps * A:(ps + 1) * A, :] = wgt
                if with_hist:
                    ia_ref = hist_outs[0]
                    for d in range(ndim):
                        ia_ref[d, ps * A:(ps + 1) * A, :] = ias[d]
                continue
            fx = f_axes(*xs) * (wgt * xjac)
            fx = jnp.where(valid, fx, 0.0)
            fb = fb + fx
            f2 = fx * fx
            f2s = f2s + f2
            if with_hist:
                ia_ref, f2_ref = hist_outs[0], hist_outs[1]
                for d in range(ndim):
                    ia_ref[d, ps * A:(ps + 1) * A, :] = ias[d]
                f2_ref[ps * A:(ps + 1) * A, :] = f2

        if emit_points:
            return
        # per-cube variance proxy (vegasT.cuh:382-387): npg*sum(f^2)-fb^2
        # in the cancellation-safe (s-fb)(s+fb) form, TINY-floored
        sq = jnp.sqrt(f2s * float(npg))
        f2b = (sq - fb) * (sq + fb)
        f2b = jnp.where(f2b <= 0.0, TINY, f2b)
        f2b = jnp.where(valid, f2b, 0.0)
        acc_ref[0, 0, :] = jnp.sum(fb, axis=0)        # lane-partial ti
        acc_ref[0, 1, :] = jnp.sum(f2b, axis=0)       # lane-partial tsi

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("f_axes", "ndim", "ng", "npg", "chunk_cubes", "nbins",
                     "with_hist", "tile_a", "interpret", "emit_points"))
def poly_sample_chunk(
    f_axes,
    ndim: int,
    ng: int,
    npg: int,
    chunk_cubes: int,
    nbins: int,
    with_hist: bool,
    p_coeffs,       # (ndim, kp) f32, Chebyshev series of P (unit space)
    q_coeffs,       # (ndim, kq) f32, Chebyshev series of q (P' = q^2)
    regn_lo,        # (ndim,)
    dx,             # (ndim,)
    xjac,           # scalar
    cube0,          # traced: first global cube id of this chunk
    ncubes,         # traced: true number of cubes
    key,            # chunk PRNG key (device rng) -- or None with bits
    bits=None,      # rng='input': (npg*ndim, ceil-tiles*A, 128) uint32
    *,
    tile_a: int = DEFAULT_A,
    interpret: bool = False,
    emit_points: bool = False,
):
    """One chunk's worth of VEGAS poly sampling, fused.

    Returns (ti_lanes (n_tiles, 2, 128) f32 partial sums[, ia, f2]):
    caller combines in f64 and, for adaptation iterations, feeds the
    dims-major (ia, f2) pair to the histogram.  ``f_axes`` is the
    scalar-per-axis integrand (cubacpp convention; jnp ops only, f32).

    ``emit_points``: the hybrid f64 mode -- the kernel runs only the
    sampling machinery (hardware PRNG, stratified point-gen, Chebyshev
    importance map) and EMITS dims-major coordinates plus the f32
    importance weight for an XLA-side integrand evaluation in the
    accumulator dtype; returns (xs (ndim, n_tiles*npg*A, 128) f32,
    wt (n_tiles*npg*A, 128) f32[, ia]).  ``f_axes`` is unused (may be
    None) and the integrand may be any traceable callable downstream.
    Sample order matches the fused outputs: tile-major, then sample
    slot, then (A, 128) cube rows/lanes.
    """
    f32 = jnp.float32
    kp = p_coeffs.shape[1]
    kq = q_coeffs.shape[1]
    A = tile_a
    tile_c = A * 128
    n_tiles = -(-chunk_cubes // tile_c)
    device_rng = bits is None

    # fold the volume transform into the map coefficients:
    # x = lo + P(s) * dx  ==  (lo + c0*dx) + sum_i (c_i*dx) T_i  (T_0 = 1)
    pf = p_coeffs.astype(f32) * dx.astype(f32)[:, None]
    pf = pf.at[:, 0].add(regn_lo.astype(f32))
    p_flat = pf.reshape(-1)
    q_flat = q_coeffs.astype(f32).reshape(-1)

    lo32 = regn_lo.astype(f32)
    hi32 = lo32 + dx.astype(f32)
    fbounds = jnp.concatenate(
        [lo32, hi32, jnp.asarray(xjac, f32)[None]])    # (2*ndim+1,)

    if device_rng:
        seeds = jax.lax.bitcast_convert_type(
            jax.random.key_data(key).astype(jnp.uint32), jnp.int32)
    else:
        seeds = jnp.zeros((2,), jnp.int32)
    scalars = jnp.concatenate([
        seeds.reshape(2),
        jnp.asarray(cube0, jnp.int32)[None],
        jnp.asarray(ncubes, jnp.int32)[None],
        jnp.asarray(chunk_cubes, jnp.int32)[None]])    # (5,) i32

    kernel = _make_kernel(f_axes, ndim, ng, npg, kp, kq, A, nbins,
                          with_hist, device_rng, emit_points=emit_points)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem, smem, smem, smem]
    operands = [scalars, fbounds, p_flat, q_flat]
    if not device_rng:
        in_specs.append(pl.BlockSpec((npg * ndim, A, 128),
                                     lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bits)

    if emit_points:
        out_shapes = [
            jax.ShapeDtypeStruct((ndim, n_tiles * npg * A, 128), f32),
            jax.ShapeDtypeStruct((n_tiles * npg * A, 128), f32)]
        out_specs = [
            pl.BlockSpec((ndim, npg * A, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npg * A, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)]
    else:
        out_shapes = [jax.ShapeDtypeStruct((n_tiles, 2, 128), f32)]
        out_specs = [pl.BlockSpec((1, 2, 128), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
    if with_hist:
        out_shapes += [
            jax.ShapeDtypeStruct((ndim, n_tiles * npg * A, 128), jnp.int32)]
        out_specs += [
            pl.BlockSpec((ndim, npg * A, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)]
        if not emit_points:
            out_shapes += [
                jax.ShapeDtypeStruct((n_tiles * npg * A, 128), f32)]
            out_specs += [
                pl.BlockSpec((npg * A, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]

    # x64 mode breaks Mosaic lowering (pallas_rule.py precedent)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
            out_shape=(tuple(out_shapes) if len(out_shapes) > 1
                       else out_shapes[0]),
            interpret=interpret,
        )(*operands)
    if emit_points:
        if with_hist:
            xs3, wt2, ia3 = outs
            return xs3, wt2, ia3.reshape(ndim, -1)
        xs3, wt2 = outs
        return xs3, wt2
    if with_hist:
        acc, ia3, f23 = outs
        return acc, ia3.reshape(ndim, -1), f23.reshape(-1)
    return (outs,)
