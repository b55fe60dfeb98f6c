"""Exodus II time-series round-trips: mesh + nodal/element variables.

Mirrors the reference ``tests/io/test_exodus.py`` results intent: write
time-stepped nodal vector fields and per-block element sym-tensor fields
through :class:`ExodusWriter`, read them back with ``read_results`` (raw
per-component and spec-assembled forms), and check the storage-order
conventions survive the round trip.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.fem.mesh import StructuredHexMesh, hex_to_tet_split
from cmad_tpu.io.exodus import ExodusWriter, read_mesh, read_results
from cmad_tpu.io.results import (
    FieldSpec,
    component_names,
    from_exodus_storage,
    to_exodus_storage,
)
from cmad_tpu.models.var_types import VarType


@pytest.fixture
def mesh():
    return StructuredHexMesh((1.0, 2.0, 3.0), (2, 1, 1))


def test_mesh_skeleton_round_trip(tmp_path, mesh):
    path = tmp_path / "skel.exo"
    w = ExodusWriter(path, mesh)
    w.close()
    back = read_mesh(path)
    np.testing.assert_allclose(back.nodes, mesh.nodes)
    np.testing.assert_array_equal(back.connectivity, mesh.connectivity)
    assert set(back.element_blocks) == set(mesh.element_blocks)
    for name, elems in mesh.element_blocks.items():
        np.testing.assert_array_equal(back.element_blocks[name], elems)
    assert set(back.node_sets) == set(mesh.node_sets)
    assert set(back.side_sets) == set(mesh.side_sets)


def test_tet_mesh_round_trip(tmp_path, mesh):
    tet = hex_to_tet_split(mesh)
    path = tmp_path / "tet.exo"
    ExodusWriter(path, tet).close()
    back = read_mesh(path)
    np.testing.assert_array_equal(back.connectivity, tet.connectivity)
    assert back.element_family == tet.element_family


def test_nodal_vector_series_round_trip(tmp_path, mesh):
    n = mesh.nodes.shape[0]
    comps = component_names("u", VarType.VECTOR)
    assert tuple(comps) == ("u_x", "u_y", "u_z")

    path = tmp_path / "res.exo"
    w = ExodusWriter(path, mesh, nodal_var_names=comps)
    rng = np.random.RandomState(0)
    steps = [rng.normal(size=(n, 3)) for _ in range(3)]
    times = [0.0, 0.5, 1.0]
    for t, u in zip(times, steps):
        w.write_step(t, nodal_values={c: u[:, k]
                                      for k, c in enumerate(comps)})
    w.close()

    res = read_results(path,
                       nodal_field_specs=[FieldSpec("u", VarType.VECTOR)])
    np.testing.assert_allclose(res.times, times)
    assert res.nodal["u"].shape == (3, n, 3)
    for s, u in enumerate(steps):
        np.testing.assert_allclose(res.nodal["u"][s], u, rtol=1e-14)


def test_element_sym_tensor_series_round_trip(tmp_path, mesh):
    comps = component_names("cauchy", VarType.SYM_TENSOR)
    n_e = mesh.connectivity.shape[0]
    path = tmp_path / "elem.exo"
    w = ExodusWriter(path, mesh, element_var_names=comps)

    rng = np.random.RandomState(1)
    internal = rng.normal(size=(n_e, 6))  # internal sym-vec order
    exo = to_exodus_storage(internal, VarType.SYM_TENSOR)
    w.write_step(1.0, element_values={
        c: {"all": exo[:, k]} for k, c in enumerate(comps)})
    w.close()

    res = read_results(path, element_field_specs=[
        FieldSpec("cauchy", VarType.SYM_TENSOR)])
    got = res.element["cauchy"]["all"][0]  # step 0
    back = from_exodus_storage(got, VarType.SYM_TENSOR)
    np.testing.assert_allclose(back, internal, rtol=1e-14)


def test_raw_read_without_specs(tmp_path, mesh):
    n = mesh.nodes.shape[0]
    path = tmp_path / "raw.exo"
    w = ExodusWriter(path, mesh, nodal_var_names=["temp"])
    w.write_step(0.0, nodal_values={"temp": np.arange(n, dtype=float)})
    w.write_step(1.0, nodal_values={"temp": 2.0 * np.arange(n)})
    w.close()

    res = read_results(path)
    assert res.nodal["temp"].shape == (2, n)
    np.testing.assert_allclose(res.nodal["temp"][1],
                               2.0 * np.arange(n))


def test_classic_packed_nodal_layout(tmp_path, mesh):
    """netCDF4-based writers (e.g. the reference through its shim) pack
    nodal vars as one (time, var, node) array; the reader must handle
    both that and our per-variable layout."""
    from scipy.io import netcdf_file

    n = mesh.nodes.shape[0]
    # minimal classic-layout results file built directly
    packed = tmp_path / "classic.exo"
    dst = netcdf_file(str(packed), "w", version=2, mmap=False)
    dst.createDimension("time_step", None)
    dst.createDimension("num_nodes", n)
    dst.createDimension("num_nod_var", 3)
    dst.createDimension("len_string", 33)
    tv = dst.createVariable("time_whole", "d", ("time_step",))
    names = dst.createVariable("name_nod_var", "c",
                               ("num_nod_var", "len_string"))
    arr = np.zeros((3, 33), dtype="S1")
    for i, nm in enumerate(("u_x", "u_y", "u_z")):
        for j, ch in enumerate(nm):
            arr[i, j] = ch.encode()
    names[:] = arr
    pv = dst.createVariable("vals_nod_var", "d",
                            ("time_step", "num_nod_var", "num_nodes"))
    rng = np.random.RandomState(3)
    series = rng.normal(size=(1, 3, n))
    tv[0] = 0.5
    pv[0] = series[0]
    dst.close()

    res = read_results(packed,
                       nodal_field_specs=[FieldSpec("u", VarType.VECTOR)])
    np.testing.assert_allclose(res.nodal["u"][0],
                               series[0].T, rtol=1e-14)
    raw = read_results(packed)
    np.testing.assert_allclose(raw.nodal["u_y"][0], series[0, 1],
                               rtol=1e-14)


def test_storage_order_is_exodus_convention():
    """Internal order (xx yy zz xy yz xz) -> Exodus (xx yy zz xy yz zx):
    round trip must be the identity even when the permutation is not."""
    v = np.arange(6.0)[None, :]
    exo = to_exodus_storage(v, VarType.SYM_TENSOR)
    back = from_exodus_storage(exo, VarType.SYM_TENSOR)
    np.testing.assert_allclose(back, v)
