"""Stage-level tests with hand-constructed region sets.

Mirrors the reference's pipeline-stage fixtures:
  * RegionFiltering.cu:42-388  -- scan+compaction against flag patterns
  * RegionSplitting.cu:41,111  -- children coordinates after split
  * Uniform_sub_division.cu:23-73 -- initial partition bounds

Pools are dims-major (ndim, R) -- see region_pool.py for the TPU layout
rationale (it is also the reference's own layout).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu.pagani import region_pool
from gpuintegration_tpu.pagani.two_level import refine_error


class TestUniformSplit:
    @pytest.mark.parametrize("ndim,parts", [(2, 4), (3, 2), (5, 2), (3, 3)])
    def test_partition_covers_unit_cube(self, ndim, parts):
        n = parts ** ndim
        cap = region_pool.next_pow2(n)
        lows, lengths, count = region_pool.uniform_split(ndim, parts, cap)
        assert count == n
        lows = np.asarray(lows)[:, :n]            # (ndim, n)
        lengths = np.asarray(lengths)[:, :n]
        np.testing.assert_allclose(lengths, 1.0 / parts)
        # all region corners distinct and on the grid
        corners = {tuple(np.round(lows[:, i] * parts).astype(int))
                   for i in range(n)}
        assert len(corners) == n
        assert np.all(lows >= 0) and np.all(lows + lengths <= 1 + 1e-12)

    def test_volume_sums_to_one(self):
        lows, lengths, n = region_pool.uniform_split(4, 3, 128)
        vols = np.prod(np.asarray(lengths)[:, :n], axis=0)
        assert vols.sum() == pytest.approx(1.0)


class TestCompaction:
    def _run(self, active, n_total, out_cap=8):
        ndim = 2
        lows = np.arange(n_total * ndim, dtype=np.float64).reshape(
            ndim, n_total)
        lengths = lows + 100.0
        sdim = np.arange(n_total, dtype=np.int32) % ndim
        est = np.arange(n_total, dtype=np.float64) * 1.5
        err = np.arange(n_total, dtype=np.float64) * 0.5
        act = jnp.asarray(active, jnp.float64)
        out = region_pool.compact(
            act, jnp.asarray(lows), jnp.asarray(lengths),
            jnp.asarray(sdim), jnp.asarray(est), jnp.asarray(err),
            out_capacity=out_cap)
        n_active, nl, nn, nsd, pest, perr = out
        keep = [i for i in range(n_total) if active[i] == 1]
        assert int(n_active) == len(keep)
        for j, i in enumerate(keep):
            np.testing.assert_array_equal(np.asarray(nl)[:, j], lows[:, i])
            np.testing.assert_array_equal(np.asarray(nn)[:, j], lengths[:, i])
            assert int(np.asarray(nsd)[j]) == sdim[i]
            assert float(np.asarray(pest)[j]) == est[i]
            assert float(np.asarray(perr)[j]) == err[i]

    def test_all_active(self):
        self._run([1, 1, 1, 1], 4)

    def test_single_inactive(self):
        self._run([1, 1, 0, 1], 4)

    def test_first_inactive(self):
        self._run([0, 1, 1, 1], 4)

    def test_last_inactive(self):
        self._run([1, 1, 1, 0], 4)

    def test_none_active(self):
        self._run([0, 0, 0, 0], 4)

    def test_alternating(self):
        self._run([1, 0, 1, 0, 1, 0], 6)

    def test_randomized_masks(self):
        """Property test of the bitwise shift compaction (region_pool.compact)
        against a NumPy reference on random flag patterns."""
        rng = np.random.default_rng(7)
        for _ in range(25):
            cap = int(rng.choice([4, 16, 64, 256]))
            ndim = int(rng.integers(2, 6))
            active = (rng.uniform(size=cap) < rng.uniform()).astype(float)
            lows = rng.uniform(size=(ndim, cap))
            lengths = rng.uniform(size=(ndim, cap))
            sdim = rng.integers(0, ndim, cap).astype(np.int32)
            est = rng.normal(size=cap)
            err = rng.uniform(size=cap)
            na, nl, nn, nsd, pe, pr = region_pool.compact(
                jnp.asarray(active), jnp.asarray(lows), jnp.asarray(lengths),
                jnp.asarray(sdim), jnp.asarray(est), jnp.asarray(err),
                out_capacity=cap)
            keep = np.nonzero(active)[0]
            assert int(na) == len(keep)
            k = len(keep)
            np.testing.assert_array_equal(np.asarray(nl)[:, :k], lows[:, keep])
            np.testing.assert_array_equal(np.asarray(nn)[:, :k],
                                          lengths[:, keep])
            np.testing.assert_array_equal(np.asarray(nsd)[:k], sdim[keep])
            np.testing.assert_array_equal(np.asarray(pe)[:k], est[keep])
            np.testing.assert_array_equal(np.asarray(pr)[:k], err[keep])


class TestSplitting:
    def test_children_coordinates(self):
        # two regions, split along dim 1 and dim 0 resp. (dims-major)
        lows = jnp.asarray([[0.0, 0.5], [0.0, 0.25]], jnp.float64)
        lengths = jnp.asarray([[0.5, 0.25], [1.0, 0.5]], jnp.float64)
        sdim = jnp.asarray([1, 0], jnp.int32)
        cl, cn, n_children = region_pool.split(
            lows, lengths, sdim, jnp.asarray(2), out_capacity=4)
        cl, cn = np.asarray(cl), np.asarray(cn)
        # blocked: left children in [0, cap), right children in [cap, 2cap)
        np.testing.assert_allclose(cl[:, 0], [0.0, 0.0])
        np.testing.assert_allclose(cn[:, 0], [0.5, 0.5])
        np.testing.assert_allclose(cl[:, 1], [0.5, 0.25])
        np.testing.assert_allclose(cn[:, 1], [0.125, 0.5])
        np.testing.assert_allclose(cl[:, 2], [0.0, 0.5])
        np.testing.assert_allclose(cn[:, 2], [0.5, 0.5])
        np.testing.assert_allclose(cl[:, 3], [0.625, 0.25])
        np.testing.assert_allclose(cn[:, 3], [0.125, 0.5])

    def test_children_tile_parent(self):
        lows = jnp.asarray([[0.25], [0.5], [0.0]], jnp.float64)
        lengths = jnp.asarray([[0.5], [0.25], [1.0]], jnp.float64)
        for d in range(3):
            cl, cn, _ = region_pool.split(
                lows, lengths, jnp.asarray([d], jnp.int32),
                jnp.asarray(1), out_capacity=2)
            v = np.prod(np.asarray(cn)[:, :2], axis=0).sum()
            assert v == pytest.approx(np.prod(np.asarray(lengths)))


class TestTwoLevelError:
    def test_perfect_children_match_parent(self):
        """When self+sibling == parent the error is unchanged (diff=0)."""
        est = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float64)
        err = jnp.asarray([0.1, 0.2, 0.3, 0.4], jnp.float64)
        # blocked pairing: siblings (0,2) and (1,3); parent = slot % 2
        parents = jnp.asarray([1.0 + 3.0, 2.0 + 4.0], jnp.float64)
        refined, active = refine_error(est, err, parents, jnp.asarray(4),
                                       epsrel=1e-3)
        np.testing.assert_allclose(np.asarray(refined), np.asarray(err))

    def test_discrepancy_inflates_error(self):
        """diff = |self+sibl-parent|/4 inflates err by (1+2 diff/errsum)+diff
        (reference: Phases.cuh:251-261)."""
        est = jnp.asarray([1.0, 3.0], jnp.float64)
        err = jnp.asarray([0.5, 0.5], jnp.float64)
        parents = jnp.asarray([3.0], jnp.float64)  # children sum to 4
        refined, _ = refine_error(est, err, parents, jnp.asarray(2),
                                  epsrel=1e-3)
        diff = abs(0.25 * (1.0 + 3.0 - 3.0))
        expect = 0.5 * (1 + 2 * diff / 1.0) + diff
        assert float(refined[0]) == pytest.approx(expect)
        assert float(refined[1]) == pytest.approx(expect)

    def test_finished_classification(self):
        est = jnp.asarray([100.0, 100.0], jnp.float64)
        err = jnp.asarray([1e-12, 50.0], jnp.float64)
        parents = jnp.asarray([200.0], jnp.float64)
        refined, active = refine_error(est, err, parents, jnp.asarray(2),
                                       epsrel=1e-3)
        assert float(active[0]) == 0.0  # tiny error -> finished
        assert float(active[1]) == 1.0  # large error -> active

    def test_relerr_classification_disabled(self):
        est = jnp.asarray([100.0, 100.0], jnp.float64)
        err = jnp.asarray([1e-12, 50.0], jnp.float64)
        parents = jnp.asarray([200.0], jnp.float64)
        _, active = refine_error(est, err, parents, jnp.asarray(2),
                                 epsrel=1e-3, relerr_classification=False)
        np.testing.assert_array_equal(np.asarray(active), [1.0, 1.0])

    def test_volume_apportioned_retirement(self):
        """A zero-estimate (zero-crossing) region can NEVER pass the
        relative finished test; the volume-apportioned absolute term
        retires it once refined < abs_per_vol * vol (two_level.py module
        docstring -- the oscillatory certificate-wall mechanism)."""
        est = jnp.asarray([0.0, 0.0], jnp.float64)
        err = jnp.asarray([1e-9, 1e-9], jnp.float64)
        parents = jnp.asarray([0.0], jnp.float64)
        vols = jnp.asarray([1e-3, 1e-12], jnp.float64)
        # relative-only: zero-estimate regions stay active forever
        _, active = refine_error(est, err, parents, jnp.asarray(2),
                                 epsrel=1e-3)
        np.testing.assert_array_equal(np.asarray(active), [1.0, 1.0])
        # volume term: region 0 (1e-9 < 1e-4 * 1e-3) retires; region 1's
        # bound (1e-4 * 1e-12) is below its error -> stays active
        _, active = refine_error(est, err, parents, jnp.asarray(2),
                                 epsrel=1e-3, volumes=vols,
                                 abs_per_vol=1e-4)
        np.testing.assert_array_equal(np.asarray(active), [0.0, 1.0])

    def test_padding_masked(self):
        # blocked layout, n=2: real children at slot 0 (left block) and
        # slot 2 (right block); slots 1 and 3 are padding.
        est = jnp.asarray([1.0, 99.0, 1.0, 99.0], jnp.float64)
        err = jnp.asarray([0.1, 99.0, 0.1, 99.0], jnp.float64)
        parents = jnp.asarray([2.0, 0.0], jnp.float64)
        refined, active = refine_error(est, err, parents, jnp.asarray(2),
                                       epsrel=1e-3)
        assert float(refined[0]) == pytest.approx(0.1)
        assert float(refined[2]) == pytest.approx(0.1)
        assert float(refined[1]) == 0.0 and float(refined[3]) == 0.0
        assert float(active[1]) == 0.0 and float(active[3]) == 0.0


class TestDynamicTripEval:
    """apply_rule(n=..., blocked=...) must agree with the full-capacity
    sweep on every occupied slot and return exact zeros on skipped chunks
    (the dynamic-trip path makes eval work proportional to the real
    population instead of the power-of-two bucket capacity)."""

    def _pool(self, ndim, cap, seed=0):
        rng = np.random.default_rng(seed)
        lows = jnp.asarray(rng.uniform(0.0, 0.6, (ndim, cap)))
        lengths = jnp.asarray(rng.uniform(0.05, 0.4, (ndim, cap)))
        return lows, lengths

    @pytest.mark.parametrize("blocked,n", [(False, 40), (False, 64),
                                           (True, 24), (True, 64)])
    def test_matches_full_sweep(self, blocked, n):
        from gpuintegration_tpu.ops import rule_eval
        ndim, cap, chunk = 3, 64, 16
        lows, lengths = self._pool(ndim, cap)
        tables = rule_eval.rule_tables(ndim, "float64")

        def f(x):
            return jnp.sum(x ** 3, axis=-1) + jnp.prod(x, axis=-1)

        gl = jnp.zeros(ndim)
        gr = jnp.ones(ndim)
        full = rule_eval.apply_rule(f, tables, lows, lengths, gl, gr,
                                    chunk_size=chunk)
        dyn = rule_eval.apply_rule(f, tables, lows, lengths, gl, gr,
                                   chunk_size=chunk,
                                   n=jnp.asarray(n, jnp.int32),
                                   blocked=blocked)
        mask = np.asarray(region_pool.block_mask(
            cap, jnp.asarray(n, jnp.int32), blocked))
        for a, b in zip(dyn, full):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_array_equal(a[mask], b[mask])
        # every chunk with no occupied slot stays exactly zero
        est = np.asarray(dyn[0])
        for c in range(cap // chunk):
            sl = slice(c * chunk, (c + 1) * chunk)
            if not mask[sl].any():
                np.testing.assert_array_equal(est[sl], 0.0)

    def test_workspace_uses_dynamic_path(self):
        """End-to-end: a Workspace run with cap > chunk converges to the
        same result whether or not the pool is padded (the dynamic path is
        exercised whenever bucket capacity exceeds chunk_size)."""
        from gpuintegration_tpu import Workspace
        from gpuintegration_tpu.models import genz
        g = genz.f4_gaussian(3, a=4.0)
        res = Workspace(3, chunk_size=64).integrate(
            g, epsrel=1e-6, epsabs=1e-40)
        assert res.status == 0
        assert abs(res.estimate - g.true_value) <= max(
            res.errorest, 1e-6 * abs(g.true_value))

    def test_unaligned_blocked_cap_falls_back_safely(self):
        """A blocked pool whose half is NOT chunk-aligned (impossible via
        Workspace, possible via direct apply_rule) must not take the
        chunk-skipping path: a straddling chunk would be mis-skipped and
        silently zero occupied regions.  The fallback is the full sweep."""
        from gpuintegration_tpu.ops import rule_eval
        ndim, cap, chunk, n = 3, 12, 4, 4
        lows, lengths = self._pool(ndim, cap, seed=3)
        tables = rule_eval.rule_tables(ndim, "float64")

        def f(x):
            return jnp.sum(x, axis=-1)

        gl, gr = jnp.zeros(ndim), jnp.ones(ndim)
        full = rule_eval.apply_rule(f, tables, lows, lengths, gl, gr,
                                    chunk_size=chunk)
        dyn = rule_eval.apply_rule(f, tables, lows, lengths, gl, gr,
                                   chunk_size=chunk,
                                   n=jnp.asarray(n, jnp.int32), blocked=True)
        # blocked occupied slots: [0, 2) and [6, 8); all must be computed
        # (bitwise equal to the static chunked sweep it falls back to)
        mask = np.asarray(region_pool.block_mask(
            cap, jnp.asarray(n, jnp.int32), True))
        for a, b in zip(dyn, full):
            np.testing.assert_array_equal(
                np.asarray(a)[mask], np.asarray(b)[mask])
