"""Fixed-shape padded region pool and its pipeline stages.

The reference grows/shrinks raw device arrays every iteration
(reference: cuda/pagani/quad/GPUquad/Sub_regions.cuh:38-258,
Sub_region_filter.cuh:49-151, Sub_region_splitter.cuh:48-88).  On TPU all
shapes must be static, so the pool lives in power-of-two "bucket"
capacities with the first ``n`` slots holding real regions and the rest
padding; every stage is a jitted function of static capacity and a traced
region count.

Pool memory layout is DIMS-MAJOR: coordinates are (ndim, R) with the huge
region axis minor.  TPU tiles rank-2 arrays as (8 sublanes, 128 lanes); a
region-major (R, ndim<=~16) array pads its minor axis 16x (measured: an
8M-region f64 pool ballooned to 16 GB of HLO temps through the x64
rewriter's f32 halves).  Dims-major is also the reference's own layout
(dLeftCoord[dim * size + i], Sub_regions.cuh:131).

Layout contract (load-bearing for the two-level error estimate): after a
split of ``m`` parents, the left children occupy slots [0, m) and the right
children slots [m, 2m), and the compacted parent estimates align with
child index mod m -- exactly the layout RefineError assumes
(reference: Phases.cuh:219-268, Sub_region_splitter.cuh:25-44).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


def uniform_split(ndim: int, partitions_per_axis: int, capacity: int,
                  dtype=jnp.float64):
    """Initial uniform n-ary partition of the unit cube.

    Region ``i`` gets per-dim interval id ``(i // div**dim) % div``
    (reference: Sub_regions.cuh:11-36 create_uniform_split).  Padding slots
    (>= div**ndim) replicate region 0 so padded evaluations stay finite;
    they are masked out by the region count downstream.

    Returns (lows (ndim, capacity), lengths (ndim, capacity), n_regions).
    """
    div = partitions_per_axis
    n_regions = div ** ndim
    if capacity < n_regions:
        raise ValueError(f"capacity {capacity} < {n_regions} initial regions")
    length = 1.0 / div
    idx = jax.lax.broadcasted_iota(jnp.int32, (ndim, capacity), 1)
    dim = jax.lax.broadcasted_iota(jnp.int32, (ndim, capacity), 0)
    idx = jnp.where(idx < n_regions, idx, 0)  # padding replicates region 0
    strides = (div ** dim.astype(jnp.int64)).astype(jnp.int64)
    interval_id = (idx.astype(jnp.int64) // strides) % div
    lows = interval_id.astype(dtype) * jnp.asarray(length, dtype)
    lengths = jnp.full((ndim, capacity), length, dtype=dtype)
    return lows, lengths, n_regions


def region_mask(capacity: int, n: jax.Array) -> jax.Array:
    """Boolean mask of the first ``n`` (traced) slots of a capacity-sized axis."""
    ids = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    return ids < n


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def compact(
    active: jax.Array,      # (cap,) 0/1 flags (already masked to idx < n)
    lows: jax.Array,        # (ndim, cap)
    lengths: jax.Array,     # (ndim, cap)
    split_dim: jax.Array,   # (cap,) int32
    estimates: jax.Array,   # (cap,)
    errorests: jax.Array,   # (cap,)
    *,
    out_capacity: int,
):
    """Stream-compact active regions to the front of a new pool.

    Replaces the reference's thrust exclusive_scan + alignRegions gather
    (reference: Sub_region_filter.cuh:8-47, 61-138) with a cumsum and a
    scatter whose out-of-bounds (inactive) writes are dropped.  The
    surviving regions' estimates become the next iteration's parents
    (alignRegions:39-40).

    Returns (n_active, new_lows, new_lengths, new_split_dim,
             parent_estimates, parent_errorests); padding slots replicate
    slot 0 so later evaluations stay finite.
    """
    ndim, cap = lows.shape
    flags = active.astype(jnp.int32)
    scan = jnp.cumsum(flags)
    n_active = scan[-1]
    # Target slot for active regions; inactive -> out_capacity (dropped).
    target = jnp.where(active > 0, scan - 1, out_capacity)

    def scatter_1d(src):
        out = jnp.zeros((out_capacity,), dtype=src.dtype)
        return out.at[target].set(src, mode="drop")

    pad_mask = jax.lax.broadcasted_iota(
        jnp.int32, (out_capacity,), 0) >= n_active

    def scatter_pool(src, fill_first: bool):
        # dims-major: ndim separate 1-D scatters.  A single 2-D scatter on
        # axis 1 makes XLA transpose the operand to put indices leading,
        # re-creating the 16x-padded (R, ndim) temps this layout avoids.
        rows = []
        for d in range(ndim):
            row = jnp.zeros((out_capacity,), dtype=src.dtype)
            row = row.at[target].set(src[d], mode="drop")
            if fill_first:
                # replicate slot 0 into padding for finite padded evals
                row = jnp.where(pad_mask, row[0], row)
            rows.append(row)
        return jnp.stack(rows)

    new_lows = scatter_pool(lows, True)
    new_lengths = scatter_pool(lengths, True)
    new_split = scatter_1d(split_dim)
    parent_est = scatter_1d(estimates)
    parent_err = scatter_1d(errorests)
    return n_active, new_lows, new_lengths, new_split, parent_est, parent_err


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def split(
    lows: jax.Array,       # (ndim, cap) compacted active regions
    lengths: jax.Array,    # (ndim, cap)
    split_dim: jax.Array,  # (cap,) int32
    n: jax.Array,          # traced number of real regions
    *,
    out_capacity: int,
):
    """Bisect each region along its chosen dimension.

    Left children -> slots [0, n), right children -> slots [n, 2n)
    (layout parity with divideIntervalsGPU, Sub_region_splitter.cuh:25-44).
    Padding beyond 2n replicates child 0.

    Returns (child_lows, child_lengths, n_children).
    """
    ndim, cap = lows.shape
    dim_ids = jax.lax.broadcasted_iota(jnp.int32, (ndim, cap), 0)
    sel = dim_ids == split_dim[None, :]
    half = lengths * 0.5
    child_len = jnp.where(sel, half, lengths)
    left_lows = lows
    right_lows = jnp.where(sel, lows + half, lows)

    ids = jax.lax.broadcasted_iota(jnp.int32, (out_capacity,), 0)
    # slot i: left child i if i < n; right child (i - n) if n <= i < 2n;
    # else replicate child 0.
    src = jnp.where(ids < n, ids, ids - n)
    src = jnp.where(ids < 2 * n, src, 0)
    is_right = (ids >= n) & (ids < 2 * n)
    src = jnp.clip(src, 0, cap - 1)

    # per-dim 1-D gathers (see scatter_pool: 2-D axis-1 gathers transpose)
    lo_rows, len_rows = [], []
    for d in range(ndim):
        lo_rows.append(jnp.where(is_right, jnp.take(right_lows[d], src),
                                 jnp.take(left_lows[d], src)))
        len_rows.append(jnp.take(child_len[d], src))
    child_lows = jnp.stack(lo_rows)
    child_lengths = jnp.stack(len_rows)
    return child_lows, child_lengths, 2 * n
