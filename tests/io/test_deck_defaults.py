"""Deck default-filling and mesh-suffix dispatch.

Mirrors the reference ``tests/io`` deck/mesh_io coverage.
"""
from __future__ import annotations

import pytest

from cmad_tpu.io.deck import apply_deck_defaults, unwrap_top_level
from cmad_tpu.io.mesh_io import read_mesh_file


def test_fe_defaults_fill_residual_and_solver_sections():
    deck = {"problem": {"type": "fe", "name": "t"},
            "discretization": {"mesh file": "m.exo"},
            "residuals": {"global residual": {
                "type": "small_disp_equilibrium"}}}
    resolved = apply_deck_defaults(deck)
    gr = resolved["residuals"]["global residual"]
    assert "nonlinear max iters" in gr
    assert "nonlinear absolute tol" in gr
    assert resolved["linear solver"]["type"] in ("direct", "cg", "gmres")
    # input deck is not mutated
    assert "linear solver" not in deck


def test_mp_defaults_fill_newton():
    deck = {"problem": {"type": "material_point", "name": "t"}}
    resolved = apply_deck_defaults(deck)
    assert "newton" in resolved["solver"]
    assert "max_iters" in resolved["solver"]["newton"] or \
        len(resolved["solver"]["newton"]) > 0


def test_explicit_values_survive_defaults():
    deck = {"problem": {"type": "fe", "name": "t"},
            "residuals": {"global residual": {
                "type": "small_disp_equilibrium",
                "nonlinear max iters": 99}},
            "linear solver": {"type": "cg"}}
    resolved = apply_deck_defaults(deck)
    assert resolved["residuals"]["global residual"][
        "nonlinear max iters"] == 99
    assert resolved["linear solver"]["type"] == "cg"


def test_unwrap_top_level():
    assert unwrap_top_level({"cmad": {"problem": {}}}) == {"problem": {}}
    assert unwrap_top_level({"problem": {}}) == {"problem": {}}


def test_mesh_suffix_dispatch_error():
    with pytest.raises(ValueError, match="unsupported mesh extension"):
        read_mesh_file("mesh.vtk")
