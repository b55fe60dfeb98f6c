"""Neumann surface-flux assembly units + geometry precompute checks.

Mirrors the reference's ``tests/fem/test_neumann*.py`` intent: a
constant traction integrates to exactly traction x area, distributed
with the surface partition of unity; expression fluxes integrate
linear fields exactly; precomputed measures sum to volumes.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.fem.bcs import DirichletBC, NeumannBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh, hex_to_tet_split
from cmad_tpu.fem.neumann import assemble_side_neumann
from cmad_tpu.fem.precompute import compute_ip_quadrature_weights
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.parameters.parameters import Parameters


def _fe(mesh, bcs=(), nbcs=()):
    from cmad_tpu.fem.elements import P1_TET
    from cmad_tpu.fem.topology import ElementFamily

    layout = (P1_TET if mesh.element_family == ElementFamily.TET_LINEAR
              else Q1_HEX)
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", layout)],
                            list(bcs), {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    return build_fe_problem(mesh, dof_map, SmallDispEquilibrium(ndims=3),
                            {"all": model}, neumann_bcs=list(nbcs))


def _neumann_R(fe, t=1.0):
    return np.asarray(assemble_side_neumann(
        fe.dof_map, fe.kernel_arrays.neumann_side_arrays,
        fe.resolved_neumann_bcs, t))


def test_constant_traction_total_force():
    """R from a constant traction sums to -t_bar * area per component
    (the assembly convention folds F_ext with a minus sign)."""
    mesh = StructuredHexMesh((2.0, 1.0, 1.0), (2, 2, 2))
    tbar = [3.0, -1.0, 0.5]
    fe = _fe(mesh, nbcs=[NeumannBC(["xmax_sides"], "u", tbar)])
    R = _neumann_R(fe)
    area = 1.0  # the x = 2 face of the 2x1x1 box
    for c in range(3):
        np.testing.assert_allclose(R[c::3].sum(), -tbar[c] * area,
                                   rtol=1e-13)


def test_constant_traction_total_force_tets():
    mesh = hex_to_tet_split(StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2)))
    fe = _fe(mesh, nbcs=[NeumannBC(["zmax_sides"], "u", [0.0, 0.0, 2.0])])
    R = _neumann_R(fe)
    np.testing.assert_allclose(R[2::3].sum(), -2.0, rtol=1e-13)
    np.testing.assert_allclose(R[0::3].sum(), 0.0, atol=1e-14)


def test_linear_traction_moment():
    """t_x = y on the xmax face of the unit cube: total force 1/2 and
    y-weighted moment 1/3 (exact for bilinear faces, 2-pt surface
    quadrature)."""
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))

    def traction(coords, t):
        y = coords[:, 1]
        z = jnp.zeros_like(y)
        return t * jnp.stack([y, z, z], axis=-1)

    fe = _fe(mesh, nbcs=[NeumannBC(["xmax_sides"], "u", traction)])
    R = _neumann_R(fe)
    np.testing.assert_allclose(R[0::3].sum(), -0.5, rtol=1e-13)
    y_nodes = np.asarray(fe.mesh.nodes[:, 1])
    np.testing.assert_allclose((R[0::3] * y_nodes).sum(), -1.0 / 3.0,
                               rtol=1e-13)


def test_traction_scales_with_time():
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    fe = _fe(mesh, nbcs=[NeumannBC(
        ["ymax_sides"], "u", lambda c, t: t * jnp.ones((c.shape[0], 3)))])
    R1, R2 = _neumann_R(fe, 1.0), _neumann_R(fe, 2.0)
    np.testing.assert_allclose(R2, 2.0 * R1, rtol=1e-13)


def test_precomputed_measures_sum_to_volume():
    for mesh, vol in ((StructuredHexMesh((2.0, 1.0, 0.5), (2, 2, 1)),
                       1.0),
                      (hex_to_tet_split(
                          StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))),
                       1.0)):
        fe = _fe(mesh)
        w = compute_ip_quadrature_weights(fe.geometry_cache)["all"]
        n_e = mesh.connectivity.shape[0]
        assert w.shape[0] == n_e
        np.testing.assert_allclose(float(np.asarray(w).sum()), vol,
                                   rtol=1e-13)
