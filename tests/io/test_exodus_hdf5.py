"""HDF5-format (netCDF4) Exodus reading.

The reference's netCDF4 backend reads classic-NetCDF3 AND HDF5 ``.exo``
files transparently (``/root/reference/cmad/io/exodus.py:247``); modern
Exodus producers (SEACAS, Cubit, meshio) emit HDF5 by default. These
tests pin the h5py-backed read path (``io/exodus.py _H5NetCDF``):

1. against a REAL third-party fixture — the reference repo's
   meshio-written ``small_hex.exo`` (HDF5) — when mounted;
2. against an in-test NetCDF3 -> netCDF4-layout-HDF5 transcoding of our
   own writer's output: read(HDF5 transcript) must equal read(NetCDF3).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
from scipy.io import netcdf_file

from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.io.exodus import (
    ExodusFormatError,
    ExodusWriter,
    read_mesh,
    read_results,
)

REF_FIXTURE = Path("/root/reference/tests/io/fixtures/small_hex.exo")

_NOT_A_VAR = (b"This is a netCDF dimension but not a netCDF variable."
              b"%10d")


def _transcode_netcdf3_to_hdf5(src: Path, dst: Path) -> None:
    """Rewrite a classic-NetCDF3 file in the netCDF4-on-HDF5 layout
    (root datasets; dimensions as HDF5 dimension scales; attributes as
    HDF5 attrs) — the structure netCDF4-based writers produce."""
    import h5py

    nc = netcdf_file(str(src), "r", mmap=False)
    try:
        with h5py.File(str(dst), "w") as f:
            scales = {}
            for dname, size in nc.dimensions.items():
                if size is None:  # unlimited: current record count
                    size = nc.variables["time_whole"].shape[0]
                if dname in nc.variables:
                    continue  # coordinate variable: created below
                d = f.create_dataset(dname, shape=(max(size, 1),),
                                     dtype="f4")
                d.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
                d.attrs["NAME"] = np.bytes_(_NOT_A_VAR % max(size, 1))
                d.make_scale(dname)
                scales[dname] = d
            for vname, var in nc.variables.items():
                data = np.asarray(var[:])
                ds = f.create_dataset(vname, data=data)
                for aname in ("elem_type", "name"):
                    if hasattr(var, aname):
                        ds.attrs[aname] = np.bytes_(getattr(var, aname))
                if vname in nc.dimensions:  # coordinate variable
                    ds.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
                    ds.attrs["NAME"] = np.bytes_(vname)
                    ds.make_scale(vname)
                    scales[vname] = ds
            for vname, var in nc.variables.items():
                if vname in scales:
                    continue
                ds = f[vname]
                for axis, dname in enumerate(var.dimensions):
                    if dname in scales:
                        ds.dims[axis].attach_scale(scales[dname])
    finally:
        nc.close()


@pytest.fixture
def mesh():
    return StructuredHexMesh((1.0, 2.0, 3.0), (2, 2, 1))


@pytest.mark.skipif(not REF_FIXTURE.exists(),
                    reason="reference fixture not mounted")
def test_reads_reference_meshio_hdf5_fixture():
    m = read_mesh(REF_FIXTURE)
    assert m.nodes.shape == (27, 3)
    assert m.connectivity.shape == (8, 8)
    assert set(m.node_sets) == {"xmin_nodes", "xmax_nodes"}
    assert all(len(v) == 9 for v in m.node_sets.values())
    # connectivity indices in range and 0-based
    assert m.connectivity.min() == 0
    assert m.connectivity.max() == 26


def test_hdf5_mesh_matches_netcdf3(tmp_path, mesh):
    nc3 = tmp_path / "m.exo"
    h5 = tmp_path / "m_h5.exo"
    ExodusWriter(nc3, mesh).close()
    _transcode_netcdf3_to_hdf5(nc3, h5)

    with open(h5, "rb") as fh:
        assert fh.read(4) == b"\x89HDF"

    a, b = read_mesh(nc3), read_mesh(h5)
    np.testing.assert_allclose(a.nodes, b.nodes)
    np.testing.assert_array_equal(a.connectivity, b.connectivity)
    assert set(a.element_blocks) == set(b.element_blocks)
    assert set(a.node_sets) == set(b.node_sets)
    assert set(a.side_sets) == set(b.side_sets)
    for k in a.side_sets:
        np.testing.assert_array_equal(a.side_sets[k], b.side_sets[k])


def test_hdf5_results_match_netcdf3(tmp_path, mesh):
    nc3 = tmp_path / "r.exo"
    h5 = tmp_path / "r_h5.exo"
    rng = np.random.RandomState(0)
    n = mesh.nodes.shape[0]
    w = ExodusWriter(nc3, mesh, nodal_var_names=["u_x", "u_y"],
                     element_var_names=["alpha"])
    series = []
    for s, t in enumerate([0.0, 0.5, 1.0]):
        ux, uy = rng.normal(size=n), rng.normal(size=n)
        al = {name: rng.normal(size=len(idx))
              for name, idx in mesh.element_blocks.items()}
        series.append((t, ux, uy, al))
        w.write_step(t, {"u_x": ux, "u_y": uy}, {"alpha": al})
        del s
    w.close()
    _transcode_netcdf3_to_hdf5(nc3, h5)

    a = read_results(nc3)
    b = read_results(h5)
    np.testing.assert_allclose(b.times, a.times)
    for k in a.nodal:
        np.testing.assert_allclose(b.nodal[k], a.nodal[k])
    for k in a.element:
        for blk in a.element[k]:
            np.testing.assert_allclose(b.element[k][blk],
                                       a.element[k][blk])
    np.testing.assert_allclose(b.nodal["u_x"][1], series[1][1])


def test_garbage_magic_raises_actionably(tmp_path):
    bad = tmp_path / "bad.exo"
    bad.write_bytes(b"not an exodus file at all")
    with pytest.raises(ExodusFormatError, match="NetCDF3"):
        read_mesh(bad)
