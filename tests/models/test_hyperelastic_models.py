"""Hyperelastic Elastic-model solves under uniaxial stress.

Parity: reference ``tests/models/test_hyperelastic_models.py`` — the
potential-derived neo-Hookean stress (AD of psi(I1, I3)) matches the
closed-form neo-Hookean stress through a Newton-solved uniaxial-stress
stretch history, and both reduce to linear elasticity at small strain
while diverging from it at finite stretch.
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.elastic_potential import (
    compressible_neohookean_potential,
    compute_cauchy_from_psi_b,
)
from cmad_tpu.models.elastic_stress import (
    compressible_neohookean_cauchy_stress,
    isotropic_linear_elastic_cauchy_stress,
)
from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.parameters.parameters import Parameters

KAPPA, MU = 0.5, 0.375  # MPa (reference fixture values)


def _params():
    return Parameters({"elastic": {"kappa": KAPPA, "mu": MU}})


def _drive_uniaxial(model, stretches):
    """Solve the uniaxial-stress model at each stretch; returns the
    axial Cauchy stress history."""
    solve = make_newton_solve(model.residual_fun)
    params = model.parameters.values
    xi = model.init_xi()
    F_prev = jnp.eye(3)
    out = []
    for lam in stretches:
        F = jnp.eye(3).at[0, 0].set(lam)
        U, U_prev = mp_U_from_F(F), mp_U_from_F(F_prev)
        xi = solve(xi, xi, params, U, U_prev)
        sigma = model.cauchy_fun(xi, xi, params, U, U_prev)
        out.append(float(sigma[0, 0]))
        F_prev = F
    return np.asarray(out)


def test_potential_matches_analytic_and_departs_from_linear():
    stretches = np.linspace(1.02, 1.6, 8)

    potential_model = Elastic(
        _params(),
        elastic_stress_fun=partial(
            compute_cauchy_from_psi_b,
            psi_b_fun=compressible_neohookean_potential),
        def_type=DefType.UNIAXIAL_STRESS)
    analytic_model = Elastic(
        _params(),
        elastic_stress_fun=compressible_neohookean_cauchy_stress,
        def_type=DefType.UNIAXIAL_STRESS)
    linear_model = Elastic(
        _params(),
        elastic_stress_fun=isotropic_linear_elastic_cauchy_stress,
        def_type=DefType.UNIAXIAL_STRESS)

    s_pot = _drive_uniaxial(potential_model, stretches)
    s_ana = _drive_uniaxial(analytic_model, stretches)
    s_lin = _drive_uniaxial(linear_model, stretches)

    # AD-of-potential == closed form through the solved histories
    assert np.allclose(s_pot, s_ana, rtol=1e-10, atol=1e-12)
    # finite-strain response departs from the linear model at 60% stretch
    assert abs(s_ana[-1] - s_lin[-1]) > 0.05 * abs(s_lin[-1])


def test_neohookean_small_strain_limit():
    """At 0.1% stretch the neo-Hookean uniaxial stress matches linear
    elasticity (E from kappa/mu) to first order."""
    model = Elastic(
        _params(),
        elastic_stress_fun=compressible_neohookean_cauchy_stress,
        def_type=DefType.UNIAXIAL_STRESS)
    eps = 1e-3
    s = _drive_uniaxial(model, [1.0 + eps])
    E = 9.0 * KAPPA * MU / (3.0 * KAPPA + MU)
    assert abs(s[0] - E * eps) < 2e-3 * abs(E * eps)
