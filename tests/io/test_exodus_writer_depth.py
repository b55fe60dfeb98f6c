"""Depth tests for the Exodus writer schema contract and id round trips.

Mirrors the remaining writer intents of reference tests/io/test_exodus.py
(schema fixed at open, rejection messages, zero-step files, interchange
id preservation).
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.fem.mesh import Mesh, StructuredHexMesh
from cmad_tpu.fem.topology import ElementFamily
from cmad_tpu.io.exodus import ExodusWriter, read_mesh, read_results


def _mesh():
    return StructuredHexMesh((1.0, 1.0, 1.0), (2, 1, 1))


def test_write_step_rejects_unknown_nodal_name(tmp_path):
    w = ExodusWriter(tmp_path / "o.exo", _mesh(), nodal_var_names=["u_x"])
    with pytest.raises(ValueError, match="writer schema"):
        w.write_step(0.0, nodal_values={"v_x": np.zeros(12)})
    w.close()


def test_write_step_rejects_nodal_shape_mismatch(tmp_path):
    w = ExodusWriter(tmp_path / "o.exo", _mesh(), nodal_var_names=["u_x"])
    with pytest.raises(ValueError, match="shape"):
        w.write_step(0.0, nodal_values={"u_x": np.zeros(5)})
    w.close()


def test_write_step_rejects_unknown_element_name(tmp_path):
    w = ExodusWriter(tmp_path / "o.exo", _mesh(),
                     element_var_names=["eqps"])
    with pytest.raises(ValueError, match="writer schema"):
        w.write_step(0.0, element_values={"nope": {"all": np.zeros(2)}})
    w.close()


def test_write_step_rejects_unknown_block(tmp_path):
    w = ExodusWriter(tmp_path / "o.exo", _mesh(),
                     element_var_names=["eqps"])
    with pytest.raises(ValueError, match="unknown block"):
        w.write_step(0.0, element_values={"eqps": {"b2": np.zeros(2)}})
    w.close()


def test_write_step_rejects_element_shape_mismatch(tmp_path):
    w = ExodusWriter(tmp_path / "o.exo", _mesh(),
                     element_var_names=["eqps"])
    with pytest.raises(ValueError, match="shape"):
        w.write_step(0.0, element_values={"eqps": {"all": np.zeros(3)}})
    w.close()


def test_write_step_rejects_when_no_specs(tmp_path):
    w = ExodusWriter(tmp_path / "o.exo", _mesh())
    with pytest.raises(ValueError, match="writer schema"):
        w.write_step(0.0, nodal_values={"u_x": np.zeros(12)})
    w.close()


def test_zero_steps_close_does_not_corrupt(tmp_path):
    path = tmp_path / "o.exo"
    w = ExodusWriter(path, _mesh(), nodal_var_names=["u_x"])
    w.close()
    res = read_results(path)
    assert res.times.shape == (0,)
    mesh = read_mesh(path)
    assert mesh.connectivity.shape == (2, 8)


def test_round_trip_preserves_non_sequential_ids(tmp_path):
    m0 = _mesh()
    m = Mesh(nodes=m0.nodes, connectivity=m0.connectivity,
             element_family=ElementFamily.HEX_LINEAR,
             element_blocks={"a": np.array([0], dtype=np.intp),
                             "b": np.array([1], dtype=np.intp)},
             node_sets={"pin": np.array([0, 1], dtype=np.intp)},
             side_sets={"load": np.array([[1, 3]], dtype=np.intp)},
             element_block_ids={"a": 10, "b": 77},
             node_set_ids={"pin": 42},
             side_set_ids={"load": 99})
    path = tmp_path / "o.exo"
    ExodusWriter(path, m).close()
    back = read_mesh(path)
    assert back.element_block_ids == {"a": 10, "b": 77}
    assert back.node_set_ids == {"pin": 42}
    assert back.side_set_ids == {"load": 99}
    assert np.array_equal(np.sort(back.element_blocks["a"]), [0])
    assert np.array_equal(back.side_sets["load"], [[1, 3]])


def test_writer_assigns_sequential_ids_when_empty(tmp_path):
    path = tmp_path / "o.exo"
    ExodusWriter(path, _mesh()).close()
    back = read_mesh(path)
    assert back.element_block_ids == {"all": 1}
    assert sorted(back.node_set_ids.values()) == [1, 2, 3, 4, 5, 6]
    assert sorted(back.side_set_ids.values()) == [1, 2, 3, 4, 5, 6]


def test_write_step_appends_time_and_values(tmp_path):
    path = tmp_path / "o.exo"
    mesh = _mesh()
    w = ExodusWriter(path, mesh, nodal_var_names=["u_x"],
                     element_var_names=["eqps"])
    for k, t in enumerate((0.0, 0.5, 1.0)):
        w.write_step(t, nodal_values={"u_x": np.full(12, float(k))},
                     element_values={"eqps": {"all": np.full(2, 10.0 * k)}})
    w.close()
    res = read_results(path)
    assert np.allclose(res.times, [0.0, 0.5, 1.0])
    assert res.nodal["u_x"].shape == (3, 12)
    assert np.allclose(res.nodal["u_x"][2], 2.0)
    assert np.allclose(res.element["eqps"]["all"][1], 5.0 * 2)
