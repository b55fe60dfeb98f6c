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


def _fe_deck(solver):
    return {"problem": {"type": "fe", "name": "t"},
            "discretization": {"mesh file": "m.exo", "num steps": 1,
                               "step size": 1.0},
            "residuals": {
                "global residual": {"type": "small_disp_equilibrium",
                                    "def_type": "full_3d"},
                "local residual": {
                    "type": "elastic",
                    "materials": {"all": {
                        "elastic": {"E": 1.0, "nu": 0.3}}}}},
            "dirichlet bcs": {},
            "linear solver": solver}


def test_pyamg_preconditioner_migrates_to_two_level():
    """A reference deck naming pyamg (reference
    cmad/io/schemas/linear_solver.yaml pyamg const) runs unchanged:
    mapped to the device-native two_level arm with a logged note."""
    from cmad_tpu.io.schema import validate_deck

    deck = _fe_deck({"type": "cg", "rtol": 1.0e-8,
                     "preconditioner": {"type": "pyamg",
                                        "kwargs": {"max_levels": 3}}})
    with pytest.warns(UserWarning, match="two_level"):
        resolved = apply_deck_defaults(deck)
    precon = resolved["linear solver"]["preconditioner"]
    assert precon["type"] == "two_level"
    assert "kwargs" not in precon
    validate_deck(resolved, "primal")   # mapped deck passes the schema
    # original deck is untouched
    assert deck["linear solver"]["preconditioner"]["type"] == "pyamg"


def test_block_amg_inner_migrates_to_chebyshev():
    from cmad_tpu.io.schema import validate_deck

    deck = _fe_deck({"type": "gmres", "rtol": 1.0e-8,
                     "preconditioner": {"type": "block",
                                        "inner": "amg"}})
    with pytest.warns(UserWarning, match="chebyshev"):
        resolved = apply_deck_defaults(deck)
    assert resolved["linear solver"]["preconditioner"][
        "inner"] == "chebyshev"
    validate_deck(resolved, "primal")
