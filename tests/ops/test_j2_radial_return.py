"""The analytic J2 radial return matches the generic IFT-Newton kernel."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic
from cmad_tpu.ops.j2_radial_return import make_j2_radial_return
from cmad_tpu.ops.return_map import make_batched_return_map

from tests.support.problems import J2AnalyticalProblem


def test_radial_return_matches_generic_newton():
    problem = J2AnalyticalProblem()
    params = problem.J2_parameters
    model = SmallRateElasticPlastic(params)

    rng = np.random.RandomState(0)
    B = 256
    eps = rng.normal(0.0, 1.5e-3, size=(B, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    grad_u = jnp.asarray(eps)
    grad_u_prev = jnp.zeros((B, 3, 3))
    xi_prev = jnp.zeros((B, model.num_dofs))

    generic = make_batched_return_map(model)
    xi_g, sigma_g = generic(xi_prev, grad_u, grad_u_prev, params.values)

    fast = make_j2_radial_return(params)
    xi_f, sigma_f = fast(xi_prev, grad_u, grad_u_prev, params.values)

    frac_plastic = float((np.asarray(xi_g[:, 6]) > 0).mean())
    assert 0.3 < frac_plastic < 1.0  # mixed batch
    assert np.allclose(np.asarray(xi_f), np.asarray(xi_g), atol=1e-9)
    assert np.allclose(np.asarray(sigma_f), np.asarray(sigma_g),
                       atol=1e-9)

    # second step continues the path identically
    grad_u2 = grad_u * 1.7
    xi2_g, _ = generic(xi_g, grad_u2, grad_u, params.values)
    xi2_f, _ = fast(xi_f, grad_u2, grad_u, params.values)
    assert np.allclose(np.asarray(xi2_f), np.asarray(xi2_g), atol=1e-9)


def test_specialize_dispatch():
    """make_batched_return_map(specialize=True) routes J2+Voce FULL_3D
    to the radial return and leaves other models on the generic path."""
    from cmad_tpu.models.deformation_types import DefType
    from cmad_tpu.ops.return_map import j2_voce_specializable

    problem = J2AnalyticalProblem()
    params = problem.J2_parameters
    model = SmallRateElasticPlastic(params)
    assert j2_voce_specializable(model)
    assert not j2_voce_specializable(
        SmallRateElasticPlastic(params, def_type=DefType.PLANE_STRESS))

    rng = np.random.RandomState(1)
    B = 64
    eps = rng.normal(0.0, 1.5e-3, size=(B, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    grad_u = jnp.asarray(eps)
    grad_u_prev = jnp.zeros((B, 3, 3))
    xi_prev = jnp.zeros((B, model.num_dofs))

    fast = make_batched_return_map(model, specialize=True)
    slow = make_batched_return_map(model)
    xi_f, sig_f = fast(xi_prev, grad_u, grad_u_prev, params.values)
    xi_s, sig_s = slow(xi_prev, grad_u, grad_u_prev, params.values)
    assert np.allclose(np.asarray(xi_f), np.asarray(xi_s), atol=1e-9)
    assert np.allclose(np.asarray(sig_f), np.asarray(sig_s), atol=1e-9)


def test_total_form_radial_return_matches_generic():
    """make_j2_radial_return_total == the generic Newton on the
    TOTAL-form small_elastic_plastic model."""
    from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
    from cmad_tpu.ops.j2_radial_return import make_j2_radial_return_total

    problem = J2AnalyticalProblem()
    params = problem.J2_parameters
    model = SmallElasticPlastic(params)

    rng = np.random.RandomState(0)
    B = 256
    eps = rng.normal(0.0, 1.5e-3, size=(B, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    grad_u = jnp.asarray(eps)
    grad_u_prev = jnp.zeros((B, 3, 3))
    xi_prev = jnp.zeros((B, model.num_dofs))

    generic = make_batched_return_map(model)
    xi_g, sigma_g = generic(xi_prev, grad_u, grad_u_prev, params.values)
    fast = make_j2_radial_return_total(params)
    xi_f, sigma_f = fast(xi_prev, grad_u, grad_u_prev, params.values)

    frac_plastic = float((np.asarray(xi_g[:, 6]) > 0).mean())
    assert 0.3 < frac_plastic < 1.0
    assert np.allclose(np.asarray(xi_f), np.asarray(xi_g), atol=1e-9)
    assert np.allclose(np.asarray(sigma_f), np.asarray(sigma_g), atol=1e-9)

    # second step continues the path (total form: state is pstrain)
    xi2_g, _ = generic(xi_g, grad_u * 1.7, grad_u, params.values)
    xi2_f, _ = fast(xi_f, grad_u * 1.7, grad_u, params.values)
    assert np.allclose(np.asarray(xi2_f), np.asarray(xi2_g), atol=1e-9)

    # specialize dispatch picks it up
    from cmad_tpu.ops.return_map import j2_voce_kind
    assert j2_voce_kind(model) == "total"
    sp = make_batched_return_map(model, specialize=True)
    xi_sp, _ = sp(xi_prev, grad_u, grad_u_prev, params.values)
    assert np.allclose(np.asarray(xi_sp), np.asarray(xi_g), atol=1e-9)
