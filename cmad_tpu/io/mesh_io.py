"""Mesh-file suffix dispatch.

Parity: reference ``cmad/io/mesh_io.py``.
"""
from __future__ import annotations

from pathlib import Path

from cmad_tpu.fem.mesh import Mesh


def read_mesh_file(path: Path) -> Mesh:
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in (".exo", ".e", ".ex2"):
        from cmad_tpu.io.exodus import read_mesh
        return read_mesh(path)
    if suffix == ".msh":
        from cmad_tpu.io.gmsh import read_mesh
        return read_mesh(path)
    raise ValueError(
        f"unsupported mesh extension {suffix!r} (path: {path}); "
        f"supported: .exo, .e, .ex2, .msh")
