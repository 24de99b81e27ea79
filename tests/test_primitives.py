"""Parallel-primitive parity tests.

The reference implements and unit-tests its own device primitives
(reference: test/cuda/common/Reduction.cu:49-104 custom reduce,
prefix_sum.cu:19-81 Blelloch exclusive scan at pow-2/non-pow-2/odd sizes,
min_max.cu:28-303 block-edge cases, custom_functions.cuh:16-630).  This
framework deliberately uses XLA's deterministic built-ins instead; these
tests pin the same contracts (exactness, edge sizes, determinism) on the
primitives the pipeline actually relies on.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

SIZES = [1, 2, 63, 64, 65, 127, 128, 1000, 1024, 4095, 4096]


@pytest.mark.parametrize("n", SIZES)
def test_reduction_exact_integer_sums(n):
    """Sum of 0..n-1 is exact (Reduction.cu uses the same known-sum check)."""
    x = jnp.arange(n, dtype=jnp.float64)
    assert float(jnp.sum(x)) == n * (n - 1) / 2


@pytest.mark.parametrize("n", SIZES)
def test_exclusive_scan_edge_sizes(n):
    """cumsum-based exclusive scan at pow-2/non-pow-2/odd sizes
    (prefix_sum.cu:19-81)."""
    rng = np.random.default_rng(n)
    flags = rng.integers(0, 2, n)
    scan = np.asarray(jnp.cumsum(jnp.asarray(flags))) - flags  # exclusive
    np.testing.assert_array_equal(
        scan, np.concatenate([[0], np.cumsum(flags)[:-1]]))


@pytest.mark.parametrize("n", [64, 65, 96, 127, 4096])
def test_min_max_block_edges(n):
    """(min_max.cu:28-303: half/full/misaligned block sizes)."""
    rng = np.random.default_rng(n)
    x = rng.normal(size=n)
    jx = jnp.asarray(x)
    assert float(jnp.min(jx)) == x.min()
    assert float(jnp.max(jx)) == x.max()


def test_dot_product_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=4096)
    b = rng.normal(size=4096)
    got = float(jnp.sum(jnp.asarray(a) * jnp.asarray(b)))
    np.testing.assert_allclose(got, np.dot(a, b), rtol=1e-13)


def test_reductions_are_deterministic():
    """XLA reductions are bitwise repeatable -- the property the reference
    needed atomics-avoidance and racecheck for (SURVEY.md section 5.2)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=100000))

    @jax.jit
    def s(v):
        return jnp.sum(v), jnp.sum(v * v)

    r1 = [float(v) for v in s(x)]
    r2 = [float(v) for v in s(x)]
    assert r1 == r2


def test_segment_sum_matches_serial():
    """The histogram primitive replacing atomicAdd (vegasT.cuh:309-313)."""
    rng = np.random.default_rng(2)
    seg = rng.integers(0, 50, 10000)
    vals = rng.normal(size=10000)
    got = np.asarray(jax.ops.segment_sum(
        jnp.asarray(vals), jnp.asarray(seg), num_segments=50))
    want = np.zeros(50)
    np.add.at(want, seg, vals)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
