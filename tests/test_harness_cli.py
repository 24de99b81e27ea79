"""Harness and CLI smoke tests (CSV schema parity with the reference's
clean_time_and_call / mcubes_time_and_call output rows)."""
import io

import pytest

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

    def test_mcubes_subcommand(self, capsys):
        from gpuintegration_tpu.cli import main
        rc = main(["mcubes", "--integrand", "addition", "--ndim", "2",
                   "--epsrel", "1e-2", "--ncall", "1e4"])
        out = capsys.readouterr().out
        assert rc == 0
        assert out.startswith(timing.MCUBES_CSV_HEADER)

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
