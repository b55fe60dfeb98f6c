"""Depth tests for Neumann resolution/grouping and its assembly wiring.

Mirrors the remaining intents of reference tests/fem/test_neumann.py:
side-group formation, empty short circuits, validation errors, slant
tet faces, and the contribution landing in assemble_global's R.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.bcs import DirichletBC, NeumannBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import EntityType, FiniteElement, Q1_HEX, P1_TET, hex_linear
from cmad_tpu.fem.mesh import StructuredHexMesh, hex_to_tet_split
from cmad_tpu.fem.neumann import (
    build_neumann_side_arrays,
    resolve_neumann_bcs,
)
from cmad_tpu.fem.quadrature import quad_quadrature, tri_quadrature
from cmad_tpu.fem.topology import ElementFamily


def _hex_setup(div=(2, 2, 2)):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), div)
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], [],
                            {"u": 3})
    return mesh, dof_map


# ------------------------------------------------------------- resolve


def test_grouping_single_sideset_one_group():
    mesh, dof_map = _hex_setup()
    nbc = NeumannBC(["zmax_sides"], "u", [0.0, 0.0, 1.0])
    resolved = resolve_neumann_bcs(mesh, dof_map, [nbc])
    assert len(resolved) == 1
    groups = resolved[0].elem_ids_by_side
    assert len(groups) == 1
    (family, side), ids = next(iter(groups.items()))
    assert family == ElementFamily.HEX_LINEAR and side == 1
    assert ids.shape == (4,)  # 2x2 top elements


def test_grouping_multi_sideset_two_groups():
    mesh, dof_map = _hex_setup()
    nbc = NeumannBC(["zmax_sides", "xmax_sides"], "u", [1.0, 0.0, 0.0])
    resolved = resolve_neumann_bcs(mesh, dof_map, [nbc])
    groups = resolved[0].elem_ids_by_side
    assert len(groups) == 2
    sides = sorted(side for _f, side in groups)
    assert sides == [1, 3]  # +z and +x local faces


def test_empty_nbc_list_short_circuits():
    mesh, dof_map = _hex_setup()
    assert resolve_neumann_bcs(mesh, dof_map, []) == []
    assert build_neumann_side_arrays(
        mesh, dof_map, [],
        {ElementFamily.HEX_LINEAR: quad_quadrature(2)}) == ()


def test_unknown_field_raises():
    mesh, dof_map = _hex_setup()
    with pytest.raises(ValueError, match="unknown"):
        resolve_neumann_bcs(mesh, dof_map,
                            [NeumannBC(["zmax_sides"], "v", [1.0])])


def test_unknown_sideset_raises():
    mesh, dof_map = _hex_setup()
    with pytest.raises(ValueError, match="nope"):
        resolve_neumann_bcs(
            mesh, dof_map,
            [NeumannBC(["nope"], "u", [1.0, 0.0, 0.0])])


def test_values_length_mismatch_raises():
    mesh, dof_map = _hex_setup()
    with pytest.raises(ValueError, match="shape"):
        resolve_neumann_bcs(
            mesh, dof_map, [NeumannBC(["zmax_sides"], "u", [1.0])])


def test_non_vertex_fe_raises():
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    cell_fe = FiniteElement("DG0_HEX", ElementFamily.HEX_LINEAR,
                            {EntityType.CELL: 1}, hex_linear)
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("p", cell_fe)], [],
                            {"p": 1})
    with pytest.raises(NotImplementedError, match="VERTEX"):
        resolve_neumann_bcs(mesh, dof_map,
                            [NeumannBC(["zmax_sides"], "p", [1.0])])


# ---------------------------------------------------------- side arrays


def test_side_arrays_measure_slant_tet_face():
    """Total measure of the tet mesh's zmax faces is the full square:
    the split's slanted interior faces never leak into boundary sets,
    and the surface jacobian handles non-axis-aligned faces exactly."""
    mesh = hex_to_tet_split(StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2)))
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", P1_TET)], [],
                            {"u": 3})
    nbc = NeumannBC(["zmax_sides"], "u", [0.0, 0.0, 1.0])
    resolved = resolve_neumann_bcs(mesh, dof_map, [nbc])
    arrays = build_neumann_side_arrays(
        mesh, dof_map, resolved,
        {ElementFamily.TET_LINEAR: tri_quadrature(2)})
    total = 0.0
    for g in arrays[0].values():
        total += float(jnp.sum(g["dA"] * g["side_w"][None, :]))
    assert np.isclose(total, 1.0)


def test_side_arrays_ip_coords_on_face():
    mesh, dof_map = _hex_setup()
    nbc = NeumannBC(["xmax_sides"], "u", [1.0, 0.0, 0.0])
    resolved = resolve_neumann_bcs(mesh, dof_map, [nbc])
    arrays = build_neumann_side_arrays(
        mesh, dof_map, resolved,
        {ElementFamily.HEX_LINEAR: quad_quadrature(2)})
    for g in arrays[0].values():
        assert np.allclose(np.asarray(g["coords_ip"][..., 0]), 1.0)


# ---------------------------------------------------- assembly threading


def test_assemble_global_includes_neumann_contribution():
    """assemble_global's R with a traction must differ from the
    traction-free R by exactly the standalone Neumann contribution."""
    from cmad_tpu.fem.assembly import assemble_global
    from cmad_tpu.fem.fe_problem import build_fe_problem
    from cmad_tpu.fem.neumann import assemble_side_neumann
    from cmad_tpu.global_residuals.modes import GlobalResidualMode
    from cmad_tpu.global_residuals.small_disp_equilibrium import (
        SmallDispEquilibrium,
    )
    from cmad_tpu.models.elastic import Elastic
    from cmad_tpu.parameters.parameters import Parameters

    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [DirichletBC(["xmin_sides"], "u", [0, 1, 2], None)]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": 100.0, "nu": 0.3}}))
    gr = SmallDispEquilibrium(ndims=3)
    traction = [0.0, 0.0, 2.5]

    def build(nbcs):
        return build_fe_problem(
            mesh=mesh, dof_map=dof_map, gr=gr,
            models_by_block={"all": model},
            modes_by_block={"all": GlobalResidualMode.CLOSED_FORM},
            neumann_bcs=nbcs)

    fe0 = build([])
    fe1 = build([NeumannBC(["zmax_sides"], "u", traction)])
    params = {"all": model.parameters.values}
    n = dof_map.num_total_dofs
    U = jnp.zeros(n)

    _, R0, _ = assemble_global(fe0, fe0.kernel_arrays, params, U, U, 1.0)
    _, R1, _ = assemble_global(fe1, fe1.kernel_arrays, params, U, U, 1.0)
    R_nbc = assemble_side_neumann(
        dof_map, fe1.kernel_arrays.neumann_side_arrays,
        fe1.resolved_neumann_bcs, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(R1 - R0), np.asarray(R_nbc),
                               atol=1e-12)
    # and the net downward load is traction * area
    assert np.isclose(float(jnp.sum(R_nbc[2::3])), -2.5, rtol=1e-12)
