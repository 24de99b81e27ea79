"""Harness and CLI smoke tests (CSV schema parity with the reference's
clean_time_and_call / mcubes_time_and_call output rows)."""
import io

import pytest

import numpy as np
import jax.numpy as jnp
from gpuintegration_tpu import Workspace
from gpuintegration_tpu.models import genz
from gpuintegration_tpu.utils import timing


class TestCleanTimeAndCall:
    def test_csv_rows_and_convergence(self):
        g = genz.f4_gaussian(3, a=5.0)
        buf = io.StringIO()
        ws = Workspace(3, chunk_size=1024)
        good = timing.clean_time_and_call(
            "f4_3d", g, 1e-4, g.true_value, buf, runs_per_epsrel=2,
            workspace=ws)
        assert good
        rows = buf.getvalue().strip().splitlines()
        assert len(rows) == 2
        cols = rows[0].split(",")
        # id,ndim,backend,true,epsrel,epsabs,est,err,nregions,nfinished,
        # iters,status,ms
        assert len(cols) == len(timing.PAGANI_CSV_HEADER.split(","))
        assert cols[0] == "f4_3d" and cols[1] == "3"
        assert int(cols[11]) == 0  # status

    def test_epsrel_ladder_tightens(self):
        g = genz.f4_gaussian(2, a=3.0)
        ws = Workspace(2, chunk_size=1024)
        achieved = timing.epsrel_ladder(
            "f4_2d", g, g.true_value, None, start=1e-3, floor=1e-5,
            runs_per_epsrel=1, workspace=ws)
        assert achieved <= 1e-3


class TestMcubesTimeAndCall:
    def test_csv_rows(self):
        g = genz.f4_gaussian(2, a=3.0)
        buf = io.StringIO()
        good = timing.mcubes_time_and_call(
            "f4_2d", g, 5e-3, g.true_value, buf, ncall=2e4,
            total_iters=8, adjust_iters=5, runs=1, seed=3)
        rows = buf.getvalue().strip().splitlines()
        assert len(rows) == 1
        assert len(rows[0].split(",")) == len(
            timing.MCUBES_CSV_HEADER.split(","))


class TestCLI:
    def test_pagani_subcommand(self, capsys):
        from gpuintegration_tpu.cli import main
        rc = main(["pagani", "--integrand", "f4_gaussian", "--ndim", "2",
                   "--epsrel", "1e-3", "--runs", "1"])
        out = capsys.readouterr().out
        assert rc == 0
        assert out.startswith(timing.PAGANI_CSV_HEADER)

    def test_pagani_continuation_flags(self, capsys):
        """--continuation/--finish-scale drive integrate_to_convergence
        with tightened retirement; the CSV row still certifies at the
        CLI's epsrel."""
        from gpuintegration_tpu.cli import main
        rc = main(["pagani", "--integrand", "f4_gaussian", "--ndim", "2",
                   "--epsrel", "1e-4", "--runs", "1", "--continuation",
                   "--finish-scale", "0.5", "--max-wall-s", "120"])
        out = capsys.readouterr().out
        assert rc == 0
        row = out.strip().splitlines()[1].split(",")
        est, err = float(row[6]), float(row[7])
        assert err / abs(est) <= 1e-4

    def test_mcubes_subcommand(self, capsys):
        from gpuintegration_tpu.cli import main
        rc = main(["mcubes", "--integrand", "addition", "--ndim", "2",
                   "--epsrel", "1e-2", "--ncall", "1e4"])
        out = capsys.readouterr().out
        assert rc == 0
        assert out.startswith(timing.MCUBES_CSV_HEADER)

    def test_suave_subcommand(self, capsys):
        from gpuintegration_tpu.cli import main
        rc = main(["suave", "--integrand", "f4_gaussian", "--ndim", "2",
                   "--epsrel", "5e-3", "--nnew", "512", "--seed", "2"])
        out = capsys.readouterr().out
        assert rc == 0
        header, row = out.strip().splitlines()[:2]
        assert header.startswith("id,ndim,true_value")
        cols = row.split(",")
        assert cols[0] == "f4_gaussian" and cols[1] == "2"
        assert int(cols[10]) == 0  # status

    def test_unknown_integrand_errors(self):
        from gpuintegration_tpu.cli import main
        with pytest.raises(SystemExit):
            main(["pagani", "--integrand", "nope"])


class TestDemoIntegrands:
    """The remaining reference-demo integrand families (fixed-dimension
    demos: cuda/pagani/demos/{absCosSum5D,XYZ,fun6,diagonalRidge2D}.cu,
    genz_1abs_5d.cuh) converge to their stated truths."""

    def test_xyz(self):
        from gpuintegration_tpu import Workspace
        from gpuintegration_tpu.models import misc
        g = misc.xyz()
        r = Workspace(3, chunk_size=1024).integrate(
            g, epsrel=1e-6, epsabs=1e-40)
        assert r.status == 0
        assert abs(r.estimate - 0.125) < 1e-6 * 0.125

    def test_fun6(self):
        from gpuintegration_tpu import Workspace
        from gpuintegration_tpu.models import misc
        g = misc.fun6()
        r = Workspace(6, chunk_size=1024).integrate(
            g, epsrel=1e-4, epsabs=1e-40)
        assert r.status == 0
        assert abs(r.estimate - 1.0) < 1e-4

    def test_cos_sum_plus1_truth_is_exact(self):
        from gpuintegration_tpu import Workspace
        from gpuintegration_tpu.models import misc
        g = misc.cos_sum_plus1_5d()
        r = Workspace(5, chunk_size=1024).integrate(
            g, epsrel=1e-5, epsabs=1e-40)
        assert r.status == 0
        assert abs(r.estimate - g.true_value) < 1e-5 * abs(g.true_value)

    def test_diagonal_ridge(self):
        from gpuintegration_tpu import Workspace
        from gpuintegration_tpu.models import misc
        g, vol = misc.diagonal_ridge_2d()
        r = Workspace(2, chunk_size=1024).integrate(
            g, epsrel=1e-4, epsabs=1e-40, vol=vol)
        assert r.status == 0
        assert abs(r.estimate - 1.0) < 5e-4  # k constant is itself ~8-digit

    def test_abs_cos_sum_variants_scale(self):
        # genz_1abs_5d is abs_cos_sum_5d / 0.6371054 by construction
        from gpuintegration_tpu.models import misc
        import jax.numpy as jnp
        import numpy as np
        g = misc.abs_cos_sum_5d()
        gn = misc.abs_cos_sum_5d(normalized=True)
        x = jnp.asarray(np.random.default_rng(0).random((32, 5)))
        np.testing.assert_allclose(
            np.asarray(g.f(x)) / 0.6371054, np.asarray(gn.f(x)), rtol=1e-12)

    def test_cli_fixed_dim_integrands(self, capsys):
        from gpuintegration_tpu.cli import main
        rc = main(["pagani", "--integrand", "xyz", "--epsrel", "1e-3",
                   "--runs", "1"])
        assert rc == 0
        assert capsys.readouterr().out.startswith(timing.PAGANI_CSV_HEADER)


class TestModelTruths:
    """Closed-form truths validated independently (review regressions)."""


    def test_f6_truth_clamps_bounds_past_one(self):
        """Default b_i = (i+2)/10 exceeds 1 at ndim >= 9; the truth must
        integrate over [0,1], not to b_i (the unclamped formula was 3.3x
        off at 10D).  Cross-check by direct MC inside the box."""
        from gpuintegration_tpu.models import genz
        g = genz.f6_discontinuous(10)
        # independent numeric check: the integral factorizes per dim as
        # int_0^min(b_i,1) exp(a_i x) dx -- evaluate by fine trapezoid
        truth = 1.0
        for i in range(10):
            a_i, b_i = i + 3, min((i + 2) / 10.0, 1.0)
            xs = np.linspace(0.0, b_i, 200_001)
            truth *= np.trapezoid(np.exp(a_i * xs), xs)
        assert abs(truth - g.true_value) < 1e-6 * abs(g.true_value), (
            truth, g.true_value)
        # and the integrand really is zero past the clamp
        x_out = np.full((1, 10), 0.95)
        assert float(np.asarray(g(jnp.asarray(x_out)))[0]) == 0.0

    def test_box_published_and_dp_cross_check(self):
        """(8,15)/(8,25) pin to the published constants; the even-s DP
        recursion independently reproduces the published (8,22) value."""
        from gpuintegration_tpu.models.misc import box_integral
        assert box_integral(8, 15).true_value == 8879.851175413485
        assert box_integral(8, 25).true_value == 14996089.096112404019
        b22 = box_integral(8, 22)
        assert b22.truth_exact
        assert abs(b22.true_value - 1495369.283757217694) < 1e-6
        assert not box_integral(6, 5).truth_exact  # numeric, flagged

    def test_profile_counts_real_regions(self):
        """call_cubature_rules reports s^ndim real regions, not the
        padded capacity (65x inflation at 3D splits=5)."""
        from gpuintegration_tpu.utils.timing import call_cubature_rules
        rows = call_cubature_rules(
            lambda x, y, z: x * y * z, 3, splits_per_dim=[5],
            repeats=2, chunk=1024)
        assert rows[0]["regions"] == 125
        # minimal padding: next pow2 floored at the 128 Pallas tile (the
        # old chunk floor evaluated 1024 slots for 125 real regions)
        assert rows[0]["padded_capacity"] == 128


class TestCheckpointPaths:
    def test_save_load_without_npz_suffix(self, tmp_path):
        """np.savez appends .npz on save but load does not (round-trip
        crashed for suffix-less paths)."""
        from gpuintegration_tpu import Workspace
        from gpuintegration_tpu.models import genz
        from gpuintegration_tpu.utils.checkpoint import PaganiCheckpoint
        ws = Workspace(2, chunk_size=256)
        ws.integrate(genz.f4_gaussian(2, a=8.0), epsrel=1e-10,
                     epsabs=1e-40, max_iterations=3)
        ck = ws.make_checkpoint()
        p = str(tmp_path / "ck_no_suffix")
        ck.save(p)
        ck2 = PaganiCheckpoint.load(p)
        np.testing.assert_array_equal(ck.lows, ck2.lows)
        assert ck2.estimate == ck.estimate

    def test_vegas_state_roundtrip_with_it0(self, tmp_path):
        from gpuintegration_tpu.mcubes.vegas import VegasState
        from gpuintegration_tpu.mcubes import grid as vgrid
        from gpuintegration_tpu.utils.checkpoint import (
            load_vegas_state, save_vegas_state)
        st = VegasState(xi=vgrid.uniform_grid(2, 32), si=1.5, swgt=2.5,
                        schi=3.5, it0=7)
        p = str(tmp_path / "vs")
        save_vegas_state(st, p)
        st2 = load_vegas_state(p)
        assert st2.it0 == 7 and st2.si == 1.5


def test_cli_scan_matches_truth_and_grad(capsys):
    """scan: vmapped frozen-mesh parameter scan; estimates match the
    Gaussian closed form and dI/da matches its derivative."""
    import math
    from gpuintegration_tpu.cli import main
    rc = main(["scan", "--integrand", "f4_gaussian", "--ndim", "2",
               "--values", "2:4:2", "--partitions", "6", "--grad"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "a,estimate,errorest,dI_da"

    def truth(a):
        return (math.sqrt(math.pi) / a * math.erf(a / 2.0)) ** 2

    h = 1e-6
    for line in out[1:]:
        a_s, est_s, _, g_s = line.split(",")
        a = float(a_s)
        assert abs(float(est_s) - truth(a)) < 1e-6 * truth(a)
        d = (truth(a + h) - truth(a - h)) / (2 * h)
        assert abs(float(g_s) - d) < 1e-4 * abs(d)


class TestResultFormatting:
    def test_str_and_pretty_layouts(self):
        import numpy as np
        from gpuintegration_tpu.types import IntegrationResult
        r = IntegrationResult(estimate=2.5, errorest=0.01, neval=100,
                              nregions=7, status=0, chi_sq=1.25, prob=0.4)
        # CSV parity (integration_result.hh:26-32)
        assert str(r) == "2.5,0.01,7,1.25,0"
        # cubacpp operator<< parity (cubacpp/integration_result.hh:116-124)
        assert r.pretty() == ("neval: 100 nregions: 7 status: 0\n"
                              "Value: 2.5 +/- 0.01 prob: 0.4")
        rv = IntegrationResult(estimate=1.0, errorest=0.1, neval=5,
                               nregions=1, status=1,
                               estimates=np.array([1.0, 2.0]),
                               errorests=np.array([0.1, 0.2]),
                               probs=np.array([0.3, 0.7]))
        out = rv.pretty().splitlines()
        assert out[0] == "neval: 5 nregions: 1 status: 1"
        assert len(out) == 3 and "prob: 0.7" in out[2]
