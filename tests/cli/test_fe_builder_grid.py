"""Deck -> FEProblem builder grid: every deck-section form and error
path of build_fe_problem_from_deck.

Mirrors the intent of reference tests/cli/test_build_fe_problem.py
(34 tests): t-schedule forms, BC/forcing expression forms and their
rejections, FE/quadrature overrides, coordinate-sideset building, and
the mixed-formulation solver gate.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
import yaml

from cmad_tpu.cli.fe_common import build_fe_problem_from_deck
from cmad_tpu.fem.mesh import Mesh, StructuredHexMesh, hex_to_tet_split
from cmad_tpu.io.exodus import ExodusWriter


def _write_mesh(tmp_path, tet=False, strip_sidesets=False):
    (tmp_path / "meshes").mkdir(exist_ok=True)
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (1, 1, 1))
    if tet:
        mesh = hex_to_tet_split(mesh)
    if strip_sidesets:
        mesh = Mesh(nodes=mesh.nodes, connectivity=mesh.connectivity,
                    element_family=mesh.element_family,
                    element_blocks=mesh.element_blocks,
                    node_sets=mesh.node_sets, side_sets={})
    ExodusWriter(tmp_path / "meshes" / "m.exo", mesh).close()
    return mesh


def _deck(**over):
    deck = {
        "problem": {"type": "fe", "name": "grid"},
        "discretization": {"mesh file": "meshes/m.exo",
                           "num steps": 2, "step size": 0.5},
        "residuals": {
            "global residual": {"type": "small_disp_equilibrium",
                                "def_type": "full_3d"},
            "local residual": {
                "type": "elastic", "mode": "closed_form",
                "materials": {"all": {"elastic": {
                    "E": {"value": 1000.0}, "nu": {"value": 0.3}}}}}},
        "dirichlet bcs": {"expression": {
            "pin_x": ["equilibrium", 0, "xmin_sides", "0.0"],
            "pin_y": ["equilibrium", 1, "ymin_sides", "0.0"],
            "pin_z": ["equilibrium", 2, "zmin_sides", "0.0"],
            "ramp_x": ["equilibrium", 0, "xmax_sides", "0.01 * t"]}},
        "linear solver": {"type": "direct"},
    }
    for key, val in over.items():
        if val is None:
            deck.pop(key, None)
        else:
            deck[key] = val
    return deck


def _build(tmp_path, deck, subcommand="primal"):
    path = tmp_path / "deck.yaml"
    path.write_text(yaml.safe_dump(deck))
    return build_fe_problem_from_deck(path, subcommand)


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    _write_mesh(tmp_path)
    monkeypatch.chdir(tmp_path)
    return tmp_path


# ----------------------------------------------------------- t schedule


def test_num_steps_step_size_form(workdir):
    bundle = _build(workdir, _deck())
    assert np.allclose(bundle.t_schedule, [0.0, 0.5, 1.0])


def test_inline_times_form(workdir):
    deck = _deck()
    disc = deck["discretization"]
    disc.pop("num steps"), disc.pop("step size")
    disc["times"] = [0.0, 0.25, 1.0]
    bundle = _build(workdir, deck)
    assert np.allclose(bundle.t_schedule, [0.0, 0.25, 1.0])


def test_times_file_npy(workdir):
    np.save(workdir / "times.npy", np.array([0.0, 0.1, 0.2]))
    deck = _deck()
    disc = deck["discretization"]
    disc.pop("num steps"), disc.pop("step size")
    disc["times file"] = "times.npy"
    bundle = _build(workdir, deck)
    assert np.allclose(bundle.t_schedule, [0.0, 0.1, 0.2])


def test_times_file_txt(workdir):
    (workdir / "times.txt").write_text("0.0\n0.5\n2.0\n")
    deck = _deck()
    disc = deck["discretization"]
    disc.pop("num steps"), disc.pop("step size")
    disc["times file"] = "times.txt"
    bundle = _build(workdir, deck)
    assert np.allclose(bundle.t_schedule, [0.0, 0.5, 2.0])


def test_times_file_unsupported_extension_raises(workdir):
    (workdir / "times.json").write_text("[0, 1]")
    deck = _deck()
    disc = deck["discretization"]
    disc.pop("num steps"), disc.pop("step size")
    disc["times file"] = "times.json"
    with pytest.raises(ValueError, match="unsupported extension"):
        _build(workdir, deck)


# ------------------------------------------------------------- sections


def test_resolved_deck_preserves_keys(workdir):
    bundle = _build(workdir, _deck())
    for key in ("problem", "discretization", "residuals",
                "dirichlet bcs", "linear solver"):
        assert key in bundle.resolved


def test_dbc_string_expression_time_ramp(workdir):
    bundle = _build(workdir, _deck())
    dm = bundle.fe_problem.dof_map
    arrays = bundle.fe_problem.kernel_arrays.dbc_arrays
    v0 = np.asarray(dm.evaluate_prescribed_values(arrays, 0.0))
    v1 = np.asarray(dm.evaluate_prescribed_values(arrays, 1.0))
    assert np.isclose(np.abs(v0).max(), 0.0)
    assert np.isclose(np.abs(v1).max(), 0.01)


def test_unknown_resid_name_in_dbc_raises(workdir):
    deck = _deck()
    deck["dirichlet bcs"]["expression"]["bad"] = [
        "momentum", 0, "xmin_sides", "0.0"]
    with pytest.raises(ValueError, match="momentum"):
        _build(workdir, deck)


def test_dbc_eq_out_of_range_raises(workdir):
    deck = _deck()
    deck["dirichlet bcs"]["expression"]["bad"] = [
        "equilibrium", 3, "xmin_sides", "0.0"]
    with pytest.raises(ValueError, match="out of range"):
        _build(workdir, deck)


def test_nbc_component_count_mismatch_raises(workdir):
    deck = _deck()
    deck["surface flux bcs"] = {"expression": {
        "pull": ["equilibrium", "xmax_sides", "1.0"]}}  # needs 3 comps
    with pytest.raises(ValueError, match="components"):
        _build(workdir, deck)


def test_nbc_expression_builds_and_traces(workdir):
    import jax
    import jax.numpy as jnp

    deck = _deck()
    del deck["dirichlet bcs"]["expression"]["ramp_x"]
    deck["surface flux bcs"] = {"expression": {
        "pull": ["equilibrium", "xmax_sides", "2.0 * t", "0.0", "x"]}}
    bundle = _build(workdir, deck)
    nbc = bundle.fe_problem.neumann_bcs[0]
    coords = jnp.asarray(np.random.RandomState(0).rand(4, 3))
    vals = jax.jit(nbc.values)(coords, jnp.asarray(0.5))
    assert vals.shape == (4, 3)
    assert np.allclose(np.asarray(vals[:, 0]), 1.0)
    assert np.allclose(np.asarray(vals[:, 2]), np.asarray(coords[:, 0]))


def test_body_force_string_components_trace(workdir):
    import jax
    import jax.numpy as jnp

    deck = _deck()
    deck["body forces"] = {"expression": {
        "grav": ["equilibrium", "0.0", "0.0", "-9.8 * t"]}}
    bundle = _build(workdir, deck)
    fn = bundle.fe_problem.forcing_fns_by_block_idx[0]
    out = jax.jit(fn)(jnp.asarray([0.1, 0.2, 0.3]), jnp.asarray(2.0))
    assert np.allclose(np.asarray(out), [0.0, 0.0, -19.6])


def test_duplicate_body_force_for_resid_raises(workdir):
    deck = _deck()
    deck["body forces"] = {"expression": {
        "one": ["equilibrium", "0.0", "0.0", "1.0"],
        "two": ["equilibrium", "1.0", "0.0", "0.0"]}}
    with pytest.raises(ValueError, match="already has"):
        _build(workdir, deck)


def test_body_force_component_count_mismatch_raises(workdir):
    deck = _deck()
    deck["body forces"] = {"expression": {
        "grav": ["equilibrium", "0.0"]}}
    with pytest.raises(ValueError, match="components"):
        _build(workdir, deck)


# ------------------------------------------------- FE / quadrature forms


def test_default_fe_for_hex_mesh(workdir):
    bundle = _build(workdir, _deck())
    fls = bundle.fe_problem.dof_map.field_layouts
    assert fls[0].finite_element.name == "Q1_HEX"


def test_explicit_fe_override(workdir):
    deck = _deck()
    deck["discretization"]["finite elements"] = {"u": "Q1_HEX"}
    bundle = _build(workdir, deck)
    assert bundle.fe_problem.dof_map.field_layouts[0].finite_element.name \
        == "Q1_HEX"


def test_unknown_var_name_in_finite_elements_raises(workdir):
    deck = _deck()
    deck["discretization"]["finite elements"] = {"w": "Q1_HEX"}
    with pytest.raises(ValueError, match="unknown var_name"):
        _build(workdir, deck)


def test_fe_family_mismatch_raises(workdir):
    deck = _deck()
    deck["discretization"]["finite elements"] = {"u": "P1_TET"}
    with pytest.raises(ValueError, match="HEX"):
        _build(workdir, deck)


def test_unknown_fe_name_raises(workdir):
    deck = _deck()
    deck["discretization"]["finite elements"] = {"u": "Q9"}
    with pytest.raises(ValueError, match="unknown FE"):
        _build(workdir, deck)


def test_volume_degree_override_changes_ip_count(workdir):
    base = _build(workdir, _deck())
    deck = _deck()
    deck["discretization"]["quadrature"] = {"volume degree": 5}
    high = _build(workdir, deck)
    n_base = base.fe_problem.geometry_cache["all"]["shared"]["quad_w"].shape[0]
    n_high = high.fe_problem.geometry_cache["all"]["shared"]["quad_w"].shape[0]
    assert n_high > n_base


def test_block_name_mismatch_raises(workdir):
    deck = _deck()
    deck["residuals"]["local residual"]["materials"] = {
        "body": {"elastic": {"E": {"value": 1.0}, "nu": {"value": 0.3}}}}
    with pytest.raises(ValueError, match="match mesh blocks"):
        _build(workdir, deck)


# -------------------------------------------------- coordinate sidesets


def test_option_builds_sidesets_for_a_mesh_with_none(tmp_path,
                                                     monkeypatch):
    _write_mesh(tmp_path, strip_sidesets=True)
    monkeypatch.chdir(tmp_path)
    deck = _deck()
    deck["discretization"]["build coordinate sidesets"] = True
    bundle = _build(tmp_path, deck)
    assert "xmin_sides" in bundle.fe_problem.mesh.side_sets


def test_collision_with_existing_sideset_raises(workdir):
    deck = _deck()
    deck["discretization"]["build coordinate sidesets"] = True
    with pytest.raises(ValueError, match="redefine"):
        _build(workdir, deck)


# ----------------------------------------------------- mixed solver gate


def _mixed_deck(**solver):
    deck = _deck()
    deck["residuals"]["global residual"]["mixed"] = True
    deck["linear solver"] = solver
    return deck


def test_mixed_rejects_plain_iterative(workdir):
    with pytest.raises(ValueError, match="mixed"):
        _build(workdir, _mixed_deck(type="cg"))


def test_mixed_accepts_direct_and_block_gmres(workdir):
    b1 = _build(workdir, _mixed_deck(type="direct"))
    assert b1.fe_problem.gr.mixed
    b2 = _build(workdir, _mixed_deck(
        type="gmres", preconditioner={"type": "block",
                                      "inner": "chebyshev",
                                      "diagonal_block": "assembled"}))
    assert b2.fe_problem.gr.mixed


def test_mixed_accepts_two_level_gmres(workdir):
    b = _build(workdir, _mixed_deck(
        type="gmres", preconditioner={"type": "two_level"}))
    assert b.fe_problem.gr.mixed


def test_mixed_forces_degree2_volume_quadrature(workdir):
    b = _build(workdir, _mixed_deck(type="direct"))
    n_ips = b.fe_problem.geometry_cache["all"]["shared"]["quad_w"].shape[0]
    assert n_ips == 8  # degree-2 hex: 2x2x2 Gauss points
