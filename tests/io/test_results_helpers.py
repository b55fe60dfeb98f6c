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


def test_gmsh_reader_error_paths(tmp_path):
    with pytest.raises(FileNotFoundError, match="mesh file not found"):
        read_gmsh(tmp_path / "missing.msh")
    bad = tmp_path / "bad.msh"
    bad.write_text("this is not a gmsh file\n")
    with pytest.raises(ValueError, match="not a gmsh"):
        read_gmsh(bad)
