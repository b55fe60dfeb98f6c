"""Generate the unit-cube Exodus mesh used by the FE example decks.

Usage:
    python examples/make_cube_mesh.py [--n N] [--kind {hex,tet}] [--out PATH]
"""
from __future__ import annotations

import argparse
from pathlib import Path

from cmad_tpu.fem.mesh import StructuredHexMesh, hex_to_tet_split
from cmad_tpu.io.exodus import ExodusWriter


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n", type=int, default=8)
    parser.add_argument("--kind", choices=("hex", "tet"), default="hex")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (args.n, args.n, args.n))
    if args.kind == "tet":
        mesh = hex_to_tet_split(mesh)
    out = args.out or f"examples/meshes/cube_{args.kind}_{args.n}.exo"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    writer = ExodusWriter(out, mesh)
    writer.close()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
