"""Measure the reference's notch_hosford forward-solve wall-clock on CPU.

BASELINE.md north star #2: "notch_hosford calibration wall-clock". The
reference ships no calibration deck for the notch, so the recorded
baseline is the primal (forward) wall-clock of its shipped example
(``/root/reference/examples/notch_hosford.yaml``: Hosford a=100, 4 load
steps, direct SuperLU linear solves) on the host CPU, run unmodified
via its own CLI with netCDF4/pyamg stubbed (absent in this image; the
notch mesh is CDF-2 so scipy reads it, and the direct solver never
invokes AMG).

Writes benchmarks/notch_hosford/reference_notch.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import types
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO_ROOT = HERE.parent.parent
REFERENCE = "/root/reference"


def _install_stubs() -> None:
    sys.path.insert(0, str(REPO_ROOT))
    import benchmarks.netcdf4_shim as netcdf4_shim
    sys.modules["netCDF4"] = netcdf4_shim

    import numpy as np

    def coord_to_rbm(num_nodes, num_dofs, x, y, z):
        assert num_dofs == 3
        B = np.zeros((3 * num_nodes, 6))
        for i in range(num_nodes):
            B[3 * i + 0] = [1, 0, 0, 0, z[i], -y[i]]
            B[3 * i + 1] = [0, 1, 0, -z[i], 0, x[i]]
            B[3 * i + 2] = [0, 0, 1, y[i], -x[i], 0]
        return B

    pyamg = types.ModuleType("pyamg")
    pyamg_util = types.ModuleType("pyamg.util")
    pyamg_utils = types.ModuleType("pyamg.util.utils")
    pyamg_utils.coord_to_rbm = coord_to_rbm
    pyamg_util.utils = pyamg_utils
    pyamg.util = pyamg_util

    def _absent(*_a, **_k):
        raise RuntimeError("pyamg is not installed in this image")

    pyamg.smoothed_aggregation_solver = _absent
    sys.modules["pyamg"] = pyamg
    sys.modules["pyamg.util"] = pyamg_util
    sys.modules["pyamg.util.utils"] = pyamg_utils

    # gmsh SDK is absent; the notch deck reads an .exo mesh, so the
    # gmsh arm of the reference's mesh_io dispatch is never taken
    gmsh = types.ModuleType("gmsh")
    gmsh.initialize = _absent
    sys.modules["gmsh"] = gmsh


def main() -> None:
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    _install_stubs()
    sys.path.insert(0, REFERENCE)

    import jax
    jax.config.update("jax_platform_name", "cpu")

    workdir = Path(tempfile.mkdtemp(prefix="ref_notch_"))
    (workdir / "meshes").mkdir()
    shutil.copy(Path(REFERENCE) / "examples/notch_hosford.yaml",
                workdir / "notch_hosford.yaml")
    shutil.copy(Path(REFERENCE) / "examples/meshes/notch.exo",
                workdir / "meshes/notch.exo")

    from cmad.cli.main import main as ref_main

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        t0 = time.perf_counter()
        rc = ref_main(["primal", "notch_hosford.yaml"])
        wall = time.perf_counter() - t0
    finally:
        os.chdir(cwd)
    assert rc == 0, f"reference primal failed rc={rc}"

    out = {
        "metric": "notch_hosford_primal_wall_s",
        "value": round(wall, 2),
        "unit": "s",
        "hardware": "reference cmad on host CPU (float64, SuperLU direct)",
        "deck": "reference examples/notch_hosford.yaml (4 steps)",
    }
    (HERE / "reference_notch.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
