"""BC declaration validation (mirrors the reference's bcs semantics)."""
from __future__ import annotations

import pytest

from cmad_tpu.fem.bcs import DirichletBC, NeumannBC


def test_dirichlet_valid_forms():
    DirichletBC(["xmin_sides"], "u", [0])                 # homogeneous
    DirichletBC(["xmin_sides"], "u", [0, 2], [1.0, 2.0])  # constants
    DirichletBC(["xmin_sides"], "u", [1], lambda c, t: c[:, :1] * t)


def test_dirichlet_requires_sidesets_and_dofs():
    with pytest.raises(ValueError, match="sideset_names"):
        DirichletBC([], "u", [0])
    with pytest.raises(ValueError, match="dofs"):
        DirichletBC(["xmin_sides"], "u", [])


def test_dirichlet_value_length_must_match_dofs():
    with pytest.raises(ValueError, match="length"):
        DirichletBC(["xmin_sides"], "u", [0, 1], [1.0])


def test_neumann_requires_values():
    with pytest.raises(ValueError, match="values"):
        NeumannBC(["xmax_sides"], "u")
    with pytest.raises(ValueError, match="values"):
        NeumannBC(["xmax_sides"], "u", [])
    NeumannBC(["xmax_sides"], "u", [1.0, 0.0, 0.0])
    NeumannBC(["xmax_sides"], "u", lambda c, t: c * t)


def test_neumann_requires_sidesets():
    with pytest.raises(ValueError, match="sideset_names"):
        NeumannBC([], "u", [1.0])


def test_declarations_are_frozen():
    bc = DirichletBC(["xmin_sides"], "u", [0])
    with pytest.raises(Exception):
        bc.field_name = "p"
