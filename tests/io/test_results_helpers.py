"""Results helpers and gmsh reader error paths."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.io.gmsh import read_mesh as read_gmsh
from cmad_tpu.io.results import (
    ip_average_to_element,
    volume_average_global_field,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.parameters.parameters import Parameters


def _fe():
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 1, 1))
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], [],
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": 1.0, "nu": 0.3}}))
    return build_fe_problem(mesh, dof_map, SmallDispEquilibrium(ndims=3),
                            {"all": model})


def test_volume_average_of_linear_field_is_centroid_value():
    """u = (x, 2y, 0): the element volume average equals u at the
    centroid for a linear field on an affine element."""
    fe = _fe()
    x = np.asarray(fe.mesh.nodes)
    U = np.zeros(fe.dof_map.num_total_dofs)
    U[0::3], U[1::3] = x[:, 0], 2.0 * x[:, 1]

    avg = np.asarray(volume_average_global_field(jnp.asarray(U), fe,
                                                 "all", "u"))
    assert avg.shape == (2, 3)
    # elements span x in [0, .5] and [.5, 1]; centroids at x = .25 / .75
    np.testing.assert_allclose(avg[:, 0], [0.25, 0.75], atol=1e-13)
    np.testing.assert_allclose(avg[:, 1], 1.0, atol=1e-13)  # 2 * 0.5
    np.testing.assert_allclose(avg[:, 2], 0.0, atol=1e-14)


def test_volume_average_unknown_field_raises():
    fe = _fe()
    U = jnp.zeros(fe.dof_map.num_total_dofs)
    with pytest.raises(ValueError, match="'p'"):
        volume_average_global_field(U, fe, "all", "p")


def test_ip_average_shape_mismatch_raises():
    fe = _fe()
    with pytest.raises(ValueError, match="weights"):
        ip_average_to_element(np.zeros((3, 99, 6)), fe.geometry_cache,
                              "all")


def test_polynomial_ip_average_is_exact_volume_integral():
    """x^2 on a one-element unit cube: 2x2x2 Gauss integrates cubics
    exactly, so the IP average must equal int x^2 dV / V = 1/3
    (reference parity: tests/io/test_results.py polynomial volume
    average)."""
    from cmad_tpu.fem.mesh import Mesh

    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], [],
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": 1.0, "nu": 0.3}}))
    fe = build_fe_problem(mesh, dof_map,
                          SmallDispEquilibrium(ndims=3), {"all": model})
    N = np.asarray(fe.geometry_cache["all"]["shared"]["N"][0])
    coords_elem = np.asarray(mesh.nodes)[np.asarray(mesh.connectivity)]
    x_ip = np.einsum("pa,eak->epk", N, coords_elem)
    avg = ip_average_to_element(x_ip[..., 0] ** 2, fe.geometry_cache,
                                "all")
    np.testing.assert_allclose(avg, [1.0 / 3.0], atol=1e-13)


def test_constant_global_field_returns_constant_per_element():
    fe = _fe()
    U = np.zeros(fe.dof_map.num_total_dofs)
    U[1::3] = 7.5
    avg = np.asarray(volume_average_global_field(jnp.asarray(U), fe,
                                                 "all", "u"))
    np.testing.assert_allclose(avg[:, 1], 7.5, atol=1e-12)
    np.testing.assert_allclose(avg[:, [0, 2]], 0.0, atol=1e-13)


def test_block_dispatch_isolates_other_blocks():
    """Per-block volume averages on a two-block mesh match the same
    elements' averages computed on the single-block problem (reference
    parity: block dispatch isolates other blocks)."""
    from cmad_tpu.fem.mesh import Mesh

    base = StructuredHexMesh((1.0, 1.0, 1.0), (2, 1, 1))
    mesh = Mesh(
        nodes=base.nodes, connectivity=base.connectivity,
        element_family=base.element_family,
        element_blocks={"left": np.array([0], dtype=np.intp),
                        "right": np.array([1], dtype=np.intp)},
        node_sets=base.node_sets, side_sets=base.side_sets)
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], [],
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": 1.0, "nu": 0.3}}))
    fe2 = build_fe_problem(mesh, dof_map,
                           SmallDispEquilibrium(ndims=3),
                           {"left": model, "right": model})
    x = np.asarray(mesh.nodes)
    U = np.zeros(dof_map.num_total_dofs)
    U[0::3] = x[:, 0]

    left = np.asarray(volume_average_global_field(
        jnp.asarray(U), fe2, "left", "u"))
    right = np.asarray(volume_average_global_field(
        jnp.asarray(U), fe2, "right", "u"))
    fe1 = _fe()
    both = np.asarray(volume_average_global_field(
        jnp.asarray(U), fe1, "all", "u"))
    np.testing.assert_allclose(left, both[[0]], atol=1e-13)
    np.testing.assert_allclose(right, both[[1]], atol=1e-13)


def test_gmsh_reader_error_paths(tmp_path):
    with pytest.raises(FileNotFoundError, match="mesh file not found"):
        read_gmsh(tmp_path / "missing.msh")
    bad = tmp_path / "bad.msh"
    bad.write_text("this is not a gmsh file\n")
    with pytest.raises(ValueError, match="not a gmsh"):
        read_gmsh(bad)
