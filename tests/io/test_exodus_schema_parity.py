"""Read-side field aliases, per-block element schemas, and truth-table
sparsity.

Reference parity: ``cmad/io/exodus.py:433`` (``read_results`` with
per-block element specs + ``field_name_aliases``), ``:813-828``
(``elem_var_tab`` truth table), and the alias/truth-table cases of
reference ``tests/io/test_exodus.py``.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.fem.mesh import Mesh, StructuredHexMesh
from cmad_tpu.io.exodus import (
    ExodusFormatError,
    ExodusWriter,
    read_results,
)
from cmad_tpu.io.results import FieldSpec
from cmad_tpu.models.var_types import VarType


def _two_block_mesh():
    base = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    n = base.connectivity.shape[0]
    half = n // 2
    return Mesh(
        nodes=base.nodes, connectivity=base.connectivity,
        element_family=base.element_family,
        element_blocks={"lower": np.arange(half, dtype=np.intp),
                        "upper": np.arange(half, n, dtype=np.intp)},
        node_sets=base.node_sets, side_sets=base.side_sets,
        element_block_ids={"lower": 1, "upper": 2},
        side_set_ids=base.side_set_ids)


def _write_sparse(tmp_path):
    """eqps declared on 'lower' only; damage on 'upper' only."""
    mesh = _two_block_mesh()
    path = tmp_path / "sparse.exo"
    w = ExodusWriter(path, mesh,
                     element_var_names={"lower": ["eqps"],
                                        "upper": ["damage"]})
    n_lo = len(mesh.element_blocks["lower"])
    n_up = len(mesh.element_blocks["upper"])
    w.write_step(0.0, element_values={
        "eqps": {"lower": np.full(n_lo, 0.25)},
        "damage": {"upper": np.full(n_up, 0.5)}})
    w.close()
    return path, n_lo, n_up


def test_writer_truth_table_sparsity(tmp_path):
    path, n_lo, n_up = _write_sparse(tmp_path)
    from scipy.io import netcdf_file
    with netcdf_file(str(path), "r", mmap=False) as nc:
        tab = np.asarray(nc.variables["elem_var_tab"][:])
        # rows: blocks (lower, upper); cols: vars (eqps, damage)
        np.testing.assert_array_equal(tab, [[1, 0], [0, 1]])
        # only the declared (var, block) pairs get storage
        assert "vals_elem_var1eb1" in nc.variables
        assert "vals_elem_var2eb2" in nc.variables
        assert "vals_elem_var1eb2" not in nc.variables
        assert "vals_elem_var2eb1" not in nc.variables


def test_raw_read_respects_truth_table(tmp_path):
    path, n_lo, n_up = _write_sparse(tmp_path)
    res = read_results(path)
    assert set(res.element["eqps"]) == {"lower"}
    assert set(res.element["damage"]) == {"upper"}
    np.testing.assert_allclose(res.element["eqps"]["lower"][0],
                               np.full(n_lo, 0.25))


def test_writer_rejects_step_on_undeclared_block(tmp_path):
    mesh = _two_block_mesh()
    w = ExodusWriter(tmp_path / "o.exo", mesh,
                     element_var_names={"lower": ["eqps"]})
    n_up = len(mesh.element_blocks["upper"])
    with pytest.raises(ValueError, match="truth-table"):
        w.write_step(0.0, element_values={
            "eqps": {"upper": np.zeros(n_up)}})
    w.close()


def test_writer_rejects_unknown_block_in_schema(tmp_path):
    with pytest.raises(ValueError, match="unknown blocks"):
        ExodusWriter(tmp_path / "o.exo", _two_block_mesh(),
                     element_var_names={"nope": ["eqps"]})


def test_flat_specs_skip_absent_blocks(tmp_path):
    path, n_lo, _ = _write_sparse(tmp_path)
    res = read_results(path, element_field_specs=[
        FieldSpec("eqps", VarType.SCALAR)])
    assert set(res.element["eqps"]) == {"lower"}
    assert res.element["eqps"]["lower"].shape == (1, n_lo, 1)


def test_per_block_specs_read_and_truth_table_error(tmp_path):
    path, n_lo, _ = _write_sparse(tmp_path)
    res = read_results(path, element_field_specs={
        "lower": [FieldSpec("eqps", VarType.SCALAR)]})
    assert res.element["eqps"]["lower"].shape == (1, n_lo, 1)
    with pytest.raises(ExodusFormatError, match="truth-table"):
        read_results(path, element_field_specs={
            "upper": [FieldSpec("eqps", VarType.SCALAR)]})


def test_per_block_specs_reject_unknown_block(tmp_path):
    path, _, _ = _write_sparse(tmp_path)
    with pytest.raises(ExodusFormatError, match="not in file"):
        read_results(path, element_field_specs={
            "nope": [FieldSpec("eqps", VarType.SCALAR)]})


def _write_named(tmp_path):
    mesh = _two_block_mesh()
    n_nodes = mesh.nodes.shape[0]
    path = tmp_path / "named.exo"
    w = ExodusWriter(path, mesh, nodal_var_names=["temp"],
                     element_var_names=["eqps"])
    n_lo = len(mesh.element_blocks["lower"])
    n_up = len(mesh.element_blocks["upper"])
    w.write_step(0.0,
                 nodal_values={"temp": np.linspace(0, 1, n_nodes)},
                 element_values={"eqps": {"lower": np.zeros(n_lo),
                                          "upper": np.ones(n_up)}})
    w.close()
    return path, n_nodes


def test_alias_renames_on_read(tmp_path):
    path, n_nodes = _write_named(tmp_path)
    res = read_results(
        path,
        nodal_field_specs=[FieldSpec("T", VarType.SCALAR)],
        element_field_specs=[FieldSpec("ep", VarType.SCALAR)],
        field_name_aliases={"T": "temp", "ep": "eqps"})
    # returned keys are the requested names, values the disk series
    assert set(res.nodal) == {"T"}
    assert set(res.element) == {"ep"}
    np.testing.assert_allclose(res.nodal["T"][0, :, 0],
                               np.linspace(0, 1, n_nodes))
    np.testing.assert_allclose(res.element["ep"]["upper"][0, :, 0], 1.0)


def test_alias_unknown_key_rejected(tmp_path):
    path, _ = _write_named(tmp_path)
    with pytest.raises(ExodusFormatError, match="aliases"):
        read_results(path,
                     nodal_field_specs=[FieldSpec("temp", VarType.SCALAR)],
                     field_name_aliases={"zzz": "temp"})


def test_read_rejects_missing_nodal_component(tmp_path):
    path, _ = _write_named(tmp_path)
    with pytest.raises(ExodusFormatError, match="not found"):
        read_results(path,
                     nodal_field_specs=[FieldSpec("nope", VarType.SCALAR)])


def test_read_rejects_missing_element_component(tmp_path):
    path, _ = _write_named(tmp_path)
    with pytest.raises(ExodusFormatError, match="not found"):
        read_results(path, element_field_specs=[
            FieldSpec("nope", VarType.SCALAR)])
