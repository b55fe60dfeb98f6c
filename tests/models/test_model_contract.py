"""Model base-class contract: derivative surface consistency and the
flat state layout.

Mirrors the reference ``tests/models/test_abc_contract.py`` intent for
the functional redesign: every jitted Jacobian must equal the AD of the
residual at the same point, the layout must tile the state exactly, and
the flat-params adapter must agree with the pytree path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic

from tests.support.problems import J2AnalyticalProblem


def _setup():
    model = SmallRateElasticPlastic(
        J2AnalyticalProblem(scale_params=False).J2_parameters)
    rng = np.random.RandomState(0)
    F = np.eye(3) + 1e-3 * rng.normal(size=(3, 3))
    U = mp_U_from_F(jnp.asarray(F))
    U_prev = mp_U_from_F(jnp.eye(3))
    xi = jnp.asarray(rng.normal(scale=5.0, size=model.num_dofs))
    xi_prev = jnp.zeros(model.num_dofs)
    return model, xi, xi_prev, U, U_prev


def test_layout_tiles_state_exactly():
    model, *_ = _setup()
    layout = model.layout
    covered = np.zeros(model.num_dofs, dtype=int)
    for name in layout.var_names:
        covered[layout.slc(name)] += 1
    np.testing.assert_array_equal(covered, 1)
    assert model.num_residuals == len(layout.var_names)


def test_jacobians_match_ad_of_residual():
    model, xi, xi_prev, U, U_prev = _setup()
    p = model.parameters.values
    args = (xi, xi_prev, p, U, U_prev)
    for name, argnum in (("jac_xi", 0), ("jac_xi_prev", 1)):
        J = np.asarray(getattr(model, name)(*args))
        J_ref = np.asarray(jax.jacfwd(model.residual_fun, argnum)(*args))
        np.testing.assert_allclose(J, J_ref, rtol=1e-12, atol=1e-14,
                                   err_msg=name)
        assert J.shape == (model.num_dofs, model.num_dofs)


def test_flat_params_jacobian_matches_pytree_path():
    model, xi, xi_prev, U, U_prev = _setup()
    p = model.parameters.values
    p_flat = model.flat_params()

    Jp_flat = np.asarray(model.jac_params_flat(xi, xi_prev, p_flat, U,
                                               U_prev))
    # pytree-path jacobian, ravelled in the same leaf order
    Jp_tree = jax.jacfwd(model.residual_fun, 2)(xi, xi_prev, p, U,
                                                U_prev)
    from jax.flatten_util import ravel_pytree
    leaves = jax.tree_util.tree_leaves(Jp_tree)
    cols = [np.asarray(leaf).reshape(model.num_dofs, -1)
            for leaf in leaves]
    Jp_ref = np.concatenate(cols, axis=1)
    np.testing.assert_allclose(Jp_flat, Jp_ref, rtol=1e-12, atol=1e-14)
    assert Jp_flat.shape == (model.num_dofs, p_flat.shape[0])


def test_hessian_blocks_symmetry():
    model, xi, xi_prev, U, U_prev = _setup()
    p = model.parameters.values
    H = np.asarray(model.hess_xi_xi(xi, xi_prev, p, U, U_prev))
    assert H.shape == (model.num_dofs, model.num_dofs, model.num_dofs)
    np.testing.assert_allclose(H, np.swapaxes(H, 1, 2), atol=1e-10)


def test_init_xi_matches_layout_defaults():
    model, *_ = _setup()
    xi0 = np.asarray(model.init_xi())
    assert xi0.shape == (model.num_dofs,)
    # stress and alpha start at zero for the rate model
    np.testing.assert_allclose(xi0[:7], 0.0)
