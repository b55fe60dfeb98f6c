"""CLI round-trip of a two-block, two-material FE deck.

The series composite of a soft and a stiff elastic half under uniaxial
strain has an exact closed-form stress; the deck drives both blocks
through the materials section and the Exodus output carries per-block
element fields.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
import yaml

from cmad_tpu.cli.main import main as cmad_main
from cmad_tpu.fem.mesh import Mesh, StructuredHexMesh
from cmad_tpu.io.exodus import ExodusWriter, read_results
from cmad_tpu.io.results import FieldSpec
from cmad_tpu.models.var_types import VarType

E_SOFT, E_STIFF = 500.0, 2000.0


def _two_block_mesh(n=2):
    base = StructuredHexMesh((1.0, 1.0, 1.0), (n, n, n))
    centroids = base.nodes[base.connectivity].mean(axis=1)
    left = np.where(centroids[:, 0] < 0.5)[0]
    right = np.where(centroids[:, 0] >= 0.5)[0]
    return Mesh(
        nodes=base.nodes, connectivity=base.connectivity,
        element_family=base.element_family,
        element_blocks={"soft": left.astype(np.intp),
                        "stiff": right.astype(np.intp)},
        node_sets=base.node_sets, side_sets=base.side_sets)


def test_two_material_deck_roundtrip(tmp_path, monkeypatch):
    (tmp_path / "meshes").mkdir()
    ExodusWriter(tmp_path / "meshes" / "two.exo",
                 _two_block_mesh()).close()

    def mat(E):
        return {"elastic": {"E": {"value": E}, "nu": {"value": 0.0}}}

    ramp = 0.01
    deck = {
        "problem": {"type": "fe", "name": "composite"},
        "discretization": {"mesh file": "meshes/two.exo",
                           "num steps": 1, "step size": 1.0},
        "residuals": {
            "global residual": {"type": "small_disp_equilibrium",
                                "def_type": "full_3d"},
            "local residual": {"type": "elastic", "mode": "closed_form",
                               "materials": {"soft": mat(E_SOFT),
                                             "stiff": mat(E_STIFF)}}},
        "dirichlet bcs": {"expression": {
            "pin_x": ["equilibrium", 0, "xmin_sides", "0.0"],
            "pin_y": ["equilibrium", 1, "ymin_sides", "0.0"],
            "pin_z": ["equilibrium", 2, "zmin_sides", "0.0"],
            "ramp_x": ["equilibrium", 0, "xmax_sides", f"{ramp} * t"]}},
        "linear solver": {"type": "direct"},
        "output": {"path": "out"},
    }
    (tmp_path / "deck.yaml").write_text(yaml.safe_dump(deck))
    monkeypatch.chdir(tmp_path)
    assert cmad_main(["primal", "deck.yaml"]) == 0

    res = read_results(next(Path("out").glob("*.exo")),
                       element_field_specs=[
                           FieldSpec("cauchy", VarType.SYM_TENSOR)])
    # series composite (nu = 0): sigma_xx uniform; strain splits
    # inversely to stiffness -> sigma = ramp / (0.5/Es + 0.5/Et)
    sigma_exact = ramp / (0.5 / E_SOFT + 0.5 / E_STIFF)
    for block in ("soft", "stiff"):
        sig = res.element["cauchy"][block][-1]
        np.testing.assert_allclose(sig[:, 0], sigma_exact, rtol=1e-9,
                                   err_msg=block)
        np.testing.assert_allclose(sig[:, 1], 0.0, atol=1e-8)


def test_per_block_output_selection_sparse_truth_table(tmp_path,
                                                       monkeypatch):
    """output.local residual selecting fields on one block only yields
    a sparse elem_var_tab: the unselected block stores nothing (no fill
    padding), flat-spec reads skip it, and explicitly requesting it
    raises."""
    from cmad_tpu.io.exodus import ExodusFormatError

    (tmp_path / "meshes").mkdir()
    ExodusWriter(tmp_path / "meshes" / "two.exo",
                 _two_block_mesh()).close()

    def mat(E):
        return {"elastic": {"E": {"value": E}, "nu": {"value": 0.0}}}

    deck = {
        "problem": {"type": "fe", "name": "composite"},
        "discretization": {"mesh file": "meshes/two.exo",
                           "num steps": 1, "step size": 1.0},
        "residuals": {
            "global residual": {"type": "small_disp_equilibrium",
                                "def_type": "full_3d"},
            "local residual": {"type": "elastic", "mode": "closed_form",
                               "materials": {"soft": mat(E_SOFT),
                                             "stiff": mat(E_STIFF)}}},
        "dirichlet bcs": {"expression": {
            "pin_x": ["equilibrium", 0, "xmin_sides", "0.0"],
            "pin_y": ["equilibrium", 1, "ymin_sides", "0.0"],
            "pin_z": ["equilibrium", 2, "zmin_sides", "0.0"],
            "ramp_x": ["equilibrium", 0, "xmax_sides", "0.01 * t"]}},
        "linear solver": {"type": "direct"},
        "output": {"path": "out",
                   "local residual": {"soft": ["cauchy"], "stiff": []}},
    }
    (tmp_path / "deck.yaml").write_text(yaml.safe_dump(deck))
    monkeypatch.chdir(tmp_path)
    assert cmad_main(["primal", "deck.yaml"]) == 0
    exo = next(Path("out").glob("*.exo"))

    from scipy.io import netcdf_file
    with netcdf_file(str(exo), "r", mmap=False) as nc:
        tab = np.asarray(nc.variables["elem_var_tab"][:])
    assert tab.shape[1] == 6  # six cauchy components
    # block order follows mesh.element_blocks: soft then stiff
    np.testing.assert_array_equal(tab[0], 1)
    np.testing.assert_array_equal(tab[1], 0)

    res = read_results(exo, element_field_specs=[
        FieldSpec("cauchy", VarType.SYM_TENSOR)])
    assert set(res.element["cauchy"]) == {"soft"}
    with pytest.raises(ExodusFormatError, match="truth-table"):
        read_results(exo, element_field_specs={
            "stiff": [FieldSpec("cauchy", VarType.SYM_TENSOR)]})
