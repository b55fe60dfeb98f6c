"""The Pallas radial-return kernel matches the XLA-fused kernel.

Runs in interpreter mode on the CPU test platform; the same kernel
compiles natively on TPU (benchmarked in bench.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.ops.j2_radial_return import make_j2_radial_return
from cmad_tpu.ops.pallas_radial_return import make_pallas_j2_radial_return

from tests.support.problems import J2AnalyticalProblem


def test_pallas_matches_xla_radial_return():
    problem = J2AnalyticalProblem()
    params = problem.J2_parameters

    rng = np.random.RandomState(0)
    B = 333  # deliberately not a tile multiple (exercises padding)
    eps = rng.normal(0.0, 1.5e-3, size=(B, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    grad_u = jnp.asarray(eps)
    grad_u_prev = jnp.zeros((B, 3, 3))
    xi_prev = jnp.zeros((B, 7))

    ref = make_j2_radial_return(params)
    pal = make_pallas_j2_radial_return(params)

    xi_r, sig_r = ref(xi_prev, grad_u, grad_u_prev, params.values)
    xi_p, sig_p = pal(xi_prev, grad_u, grad_u_prev, params.values)
    assert np.allclose(np.asarray(xi_p), np.asarray(xi_r), atol=1e-10)
    assert np.allclose(np.asarray(sig_p), np.asarray(sig_r), atol=1e-10)

    # mixed elastic/plastic batch and path continuation
    assert 0.3 < float((np.asarray(xi_p[:, 6]) > 0).mean()) < 1.0
    xi2_r, _ = ref(xi_r, grad_u * 1.7, grad_u, params.values)
    xi2_p, _ = pal(xi_p, grad_u * 1.7, grad_u, params.values)
    assert np.allclose(np.asarray(xi2_p), np.asarray(xi2_r), atol=1e-10)


def test_pallas_total_form_matches_xla():
    from cmad_tpu.ops.j2_radial_return import make_j2_radial_return_total
    from cmad_tpu.ops.pallas_radial_return import (
        make_pallas_j2_radial_return_total,
    )

    problem = J2AnalyticalProblem()
    params = problem.J2_parameters
    rng = np.random.RandomState(2)
    B = 300  # not a tile multiple
    eps = rng.normal(0.0, 1.5e-3, size=(B, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    grad_u = jnp.asarray(eps)
    grad_u_prev = jnp.zeros((B, 3, 3))
    xi_prev = jnp.zeros((B, 7))

    ref = make_j2_radial_return_total(params)
    pal = make_pallas_j2_radial_return_total(params)
    xi_r, sig_r = ref(xi_prev, grad_u, grad_u_prev, params.values)
    xi_p, sig_p = pal(xi_prev, grad_u, grad_u_prev, params.values)
    assert np.allclose(np.asarray(xi_p), np.asarray(xi_r), atol=1e-10)
    assert np.allclose(np.asarray(sig_p), np.asarray(sig_r), atol=1e-10)

    xi2_r, _ = ref(xi_r, grad_u * 1.7, grad_u, params.values)
    xi2_p, _ = pal(xi_p, grad_u * 1.7, grad_u, params.values)
    assert np.allclose(np.asarray(xi2_p), np.asarray(xi2_r), atol=1e-10)
