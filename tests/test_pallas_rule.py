"""Pallas fused rule kernel: interpret-mode parity with the XLA path.

On real TPU hardware the compiled kernel is bit-identical to interpret
mode; these tests run the interpreter on the CPU mesh and check agreement
with ops.rule_eval in f32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu.integrand import make_integrand
from gpuintegration_tpu.ops import rule_eval
from gpuintegration_tpu.ops.pallas_rule import pallas_apply_rule
from gpuintegration_tpu.pagani import region_pool


def _gauss4(x0, x1, x2, x3):
    s = (x0 - .5) ** 2 + (x1 - .5) ** 2 + (x2 - .5) ** 2 + (x3 - .5) ** 2
    return jnp.exp(-25.0 * s)


def _osc4(x0, x1, x2, x3):
    return jnp.cos(x0 + 2 * x1 + 3 * x2 + 4 * x3)


@pytest.mark.parametrize("f_axes", [_gauss4, _osc4])
def test_pallas_matches_xla_f32(f_axes):
    ndim = 4
    lo, ln, _ = region_pool.uniform_split(ndim, 2, 256, jnp.float32)
    gl = jnp.zeros(ndim, jnp.float32)
    gr = jnp.ones(ndim, jnp.float32)
    est_p, err_p, sd_p = pallas_apply_rule(
        f_axes, ndim, lo, ln, gl, gr, interpret=True)

    f, _ = make_integrand(f_axes, ndim)
    tables = rule_eval.rule_tables(ndim, "float32")
    est_x, err_x, sd_x = rule_eval.apply_rule(f, tables, lo, ln, gl, gr)

    np.testing.assert_allclose(np.asarray(est_p), np.asarray(est_x),
                               rtol=5e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(err_p), np.asarray(err_x),
                               rtol=5e-3, atol=1e-8)
    # split dims agree except where fourth differences tie at f32 noise
    agree = np.mean(np.asarray(sd_p) == np.asarray(sd_x))
    assert agree > 0.95


def test_pallas_volume_transform():
    ndim = 4
    lo, ln, _ = region_pool.uniform_split(ndim, 2, 256, jnp.float32)
    gl = jnp.full((ndim,), -1.0, jnp.float32)
    gr = jnp.full((ndim,), 2.0, jnp.float32)

    def const(x0, x1, x2, x3):
        return 1.0 + 0.0 * x0

    est, err, _ = pallas_apply_rule(const, ndim, lo, ln, gl, gr,
                                    interpret=True)
    # constant over [-1,1]^4 split into 16 real regions (rest padding):
    # each region contributes exactly 1
    np.testing.assert_allclose(np.asarray(est), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(est[:16])), 16.0, rtol=1e-5)
