"""Postprocess: IP stress recovery and element averaging on a uniform
field.

Mirrors the reference's ``tests/fem`` postprocess coverage:
``evaluate_cauchy_at_ips`` in both modes against the exact uniform
uniaxial-stress field, COUPLED state-variable extraction, and
``ip_average_to_element``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.driver import fe_quasistatic_drive
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.fem.postprocess import (
    evaluate_cauchy_at_ips,
    evaluate_state_var_at_ips,
)
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.io.results import ip_average_to_element
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.models.var_types import sym_tensor_from_vector
from cmad_tpu.parameters.parameters import Parameters

E_MOD, NU, EPS = 1000.0, 0.3, 0.01


def _solved(mode):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [
        DirichletBC(["xmin_sides"], "u", [0], None),
        DirichletBC(["ymin_sides"], "u", [1], None),
        DirichletBC(["zmin_sides"], "u", [2], None),
        DirichletBC(["xmax_sides"], "u", [0],
                    lambda c, t: EPS * t * jnp.ones((c.shape[0], 1))),
    ]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": E_MOD, "nu": NU}}))
    fe = build_fe_problem(mesh, dof_map, SmallDispEquilibrium(ndims=3),
                          {"all": model}, modes_by_block={"all": mode})
    state, _ = fe_quasistatic_drive(fe, [0.0, 1.0])
    return fe, state


@pytest.mark.parametrize("mode", [GlobalResidualMode.CLOSED_FORM,
                                  GlobalResidualMode.COUPLED])
def test_cauchy_at_ips_uniform_uniaxial(mode):
    """Uniaxial-strain ramp: every IP carries the exact uniform stress."""
    fe, state = _solved(mode)
    sig_vec = evaluate_cauchy_at_ips(fe, state, 1, "all")
    n_e = len(fe.mesh.element_blocks["all"])
    assert sig_vec.shape == (n_e, fe.num_ips(), 6)

    sigma = np.asarray(sym_tensor_from_vector(jnp.asarray(sig_vec[0, 0]),
                                              3))
    exact_xx = E_MOD * EPS  # uniaxial stress (lateral faces traction-free)
    np.testing.assert_allclose(sigma[0, 0], exact_xx, rtol=1e-10)
    np.testing.assert_allclose(sigma[1, 1], 0.0, atol=1e-8)
    # uniform across all elements/IPs
    np.testing.assert_allclose(sig_vec - sig_vec[0, 0], 0.0, atol=1e-8)


def test_ip_average_matches_uniform_value():
    fe, state = _solved(GlobalResidualMode.CLOSED_FORM)
    sig_vec = evaluate_cauchy_at_ips(fe, state, 1, "all")
    avg = ip_average_to_element(sig_vec, fe.geometry_cache, "all")
    n_e = len(fe.mesh.element_blocks["all"])
    assert avg.shape == (n_e, 6)
    np.testing.assert_allclose(avg, sig_vec[:, 0, :], rtol=1e-9,
                               atol=1e-8)


def test_state_var_extraction_coupled():
    fe, state = _solved(GlobalResidualMode.COUPLED)
    model = fe.models_by_block["all"]
    # the elastic model's xi is the stress itself (sym-vec slice)
    var = evaluate_state_var_at_ips(fe, state, 1, "all", 0)
    sig_vec = evaluate_cauchy_at_ips(fe, state, 1, "all")
    np.testing.assert_allclose(var[..., 0], sig_vec[..., 0], rtol=1e-9)
    assert model.num_dofs >= 6
