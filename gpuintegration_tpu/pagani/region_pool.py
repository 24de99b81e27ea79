"""Fixed-shape padded region pool and its pipeline stages.

The reference grows/shrinks raw device arrays every iteration
(reference: cuda/pagani/quad/GPUquad/Sub_regions.cuh:38-258,
Sub_region_filter.cuh:49-151, Sub_region_splitter.cuh:48-88).  On TPU all
shapes must be static, so the pool lives in power-of-two "bucket"
capacities with the first ``n`` slots holding real regions and the rest
padding; every stage is a jitted function of static capacity and a traced
region count.

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

    Returns (lows (capacity, ndim), lengths (capacity, ndim), n_regions).
    """
    div = partitions_per_axis
    n_regions = div ** ndim
    if capacity < n_regions:
        raise ValueError(f"capacity {capacity} < {n_regions} initial regions")
    length = 1.0 / div
    idx = jax.lax.broadcasted_iota(jnp.int32, (capacity, ndim), 0)
    dim = jax.lax.broadcasted_iota(jnp.int32, (capacity, ndim), 1)
    idx = jnp.where(idx < n_regions, idx, 0)  # padding replicates region 0
    strides = (div ** dim.astype(jnp.int64)).astype(jnp.int64)
    interval_id = (idx.astype(jnp.int64) // strides) % div
    lows = interval_id.astype(dtype) * jnp.asarray(length, dtype)
    lengths = jnp.full((capacity, ndim), length, dtype=dtype)
    return lows, lengths, n_regions


def region_mask(capacity: int, n: jax.Array) -> jax.Array:
    """Boolean mask of the first ``n`` (traced) slots of a capacity-sized axis."""
    ids = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    return ids < n


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def compact(
    active: jax.Array,      # (cap,) 0/1 flags (already masked to idx < n)
    lows: jax.Array,        # (cap, ndim)
    lengths: jax.Array,     # (cap, ndim)
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
    cap, ndim = lows.shape
    flags = active.astype(jnp.int32)
    scan = jnp.cumsum(flags)
    n_active = scan[-1]
    # Target slot for active regions; inactive -> out_capacity (dropped).
    target = jnp.where(active > 0, scan - 1, out_capacity)

    def scatter_1d(src):
        out = jnp.zeros((out_capacity,), dtype=src.dtype)
        return out.at[target].set(src, mode="drop")

    def scatter_pool(src, fill_first: bool):
        # NOTE: scattered as a FLAT (cap*ndim,) array.  Scattering the
        # (cap, ndim) shape directly makes the x64 rewriter's f32 halves
        # (X64SplitHigh custom-calls) take lane-tiled T(8,128) layouts --
        # a 16x HBM blow-up that OOMs 16M-region pools.
        dim_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, ndim), 1)
        flat_target = jnp.where(
            (active > 0)[:, None],
            target[:, None] * ndim + dim_ids,
            out_capacity * ndim).reshape(-1)
        out = jnp.zeros((out_capacity * ndim,), dtype=src.dtype)
        out = out.at[flat_target].set(src.reshape(-1), mode="drop")
        out = out.reshape(out_capacity, ndim)
        if fill_first:
            # replicate slot 0 into padding for finite padded evals
            pad_mask = jax.lax.broadcasted_iota(
                jnp.int32, (out_capacity,), 0) >= n_active
            out = jnp.where(pad_mask[:, None], out[0], out)
        return out

    new_lows = scatter_pool(lows, True)
    new_lengths = scatter_pool(lengths, True)
    new_split = scatter_1d(split_dim)
    parent_est = scatter_1d(estimates)
    parent_err = scatter_1d(errorests)
    return n_active, new_lows, new_lengths, new_split, parent_est, parent_err


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def split(
    lows: jax.Array,       # (cap, ndim) compacted active regions
    lengths: jax.Array,    # (cap, ndim)
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
    cap, ndim = lows.shape
    assert out_capacity >= 2 * cap or True  # capacity checked by caller
    one_hot = jax.nn.one_hot(split_dim, ndim, dtype=lengths.dtype)
    half = lengths * 0.5
    child_len = jnp.where(one_hot > 0, half, lengths)
    left_lows = lows
    right_lows = jnp.where(one_hot > 0, lows + half, lows)

    ids = jax.lax.broadcasted_iota(jnp.int32, (out_capacity,), 0)
    # slot i: left child i if i < n; right child (i - n) if n <= i < 2n;
    # else replicate child 0.
    src = jnp.where(ids < n, ids, ids - n)
    src = jnp.where(ids < 2 * n, src, 0)
    is_right = (ids >= n) & (ids < 2 * n)
    src = jnp.clip(src, 0, cap - 1)

    # flat gathers (see compact: 2-D gathers on (cap, ndim) f64 trigger
    # 16x-padded tiled layouts via the x64 rewriter)
    dim_ids = jax.lax.broadcasted_iota(jnp.int32, (out_capacity, ndim), 1)
    flat_src = (src[:, None] * ndim + dim_ids).reshape(-1)

    def gather_pool(arr):
        return jnp.take(arr.reshape(-1), flat_src).reshape(
            out_capacity, ndim)

    child_lows = jnp.where(
        is_right[:, None], gather_pool(right_lows), gather_pool(left_lows))
    child_lengths = gather_pool(child_len)
    return child_lows, child_lengths, 2 * n
