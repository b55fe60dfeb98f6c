"""Generate a notched-plate mesh without gmsh.

Counterpart of the reference ``examples/notch_mesh.py`` (which drives the
gmsh SDK — absent from this image). The geometry is a rectangular plate
with a quarter-cylinder notch of radius R at the origin corner, built as a
*mapped structured* mesh: nodes live on rays from the notch arc
(theta in [0, pi/2]) to the rectangle boundary, so every exterior face
lies exactly on a bounding plane or on the arc, and
``coordinate_side_sets`` recovers the usual ``{x,y,z}{min,max}_sides``.

Usage:
    python examples/notch_mesh.py [--h H] [--plate LX LY LZ] [--radius R]
                                  [--kind {hex,tet}] [--out PATH]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from cmad_tpu.fem.mesh import Mesh, hex_to_tet_split
from cmad_tpu.fem.topology import ElementFamily
from cmad_tpu.io.exodus import ExodusWriter


def notch_mesh(h: float, plate=(1.0, 1.0, 0.1), notch_radius: float = 0.2,
               kind: str = "hex") -> Mesh:
    """Structured notched-plate mesh at target element size ~h."""
    lx, ly, lz = plate
    R = notch_radius

    # resolution from the target size
    arc_len = 0.5 * np.pi * R
    n_theta = max(4, int(np.ceil(arc_len / h)))
    n_r = max(3, int(np.ceil((min(lx, ly) - R) / h)))
    n_z = max(1, int(np.ceil(lz / h)))

    thetas = np.linspace(0.0, np.pi / 2.0, n_theta + 1)
    s_r = np.linspace(0.0, 1.0, n_r + 1)
    zs = np.linspace(0.0, lz, n_z + 1)

    # ray length from the origin to the rectangle boundary
    cos_t = np.cos(thetas)
    sin_t = np.sin(thetas)
    with np.errstate(divide="ignore"):
        L = np.minimum(np.where(cos_t > 0, lx / cos_t, np.inf),
                       np.where(sin_t > 0, ly / sin_t, np.inf))

    # nodes indexed (i_theta, i_r, i_z)
    r = R + s_r[None, :] * (L[:, None] - R)          # (nt+1, nr+1)
    X = r * cos_t[:, None]
    Y = r * sin_t[:, None]
    # snap the boundary columns exactly onto the planes
    X[-1, :] = 0.0
    Y[0, :] = 0.0

    nt1, nr1, nz1 = n_theta + 1, n_r + 1, n_z + 1
    nodes = np.empty((nt1, nr1, nz1, 3))
    nodes[..., 0] = X[:, :, None]
    nodes[..., 1] = Y[:, :, None]
    nodes[..., 2] = zs[None, None, :]
    nodes_flat = nodes.reshape(-1, 3)

    def vid(it, ir, iz):
        return (it * nr1 + ir) * nz1 + iz

    elems = []
    for it in range(n_theta):
        for ir in range(n_r):
            for iz in range(n_z):
                # hex_linear ordering: bottom CCW then top CCW. The
                # (theta, r) in-plane frame is right-handed with +z, so
                # order (it, ir) -> (it+1, ir) -> (it+1, ir+1) -> (it, ir+1)
                # ... check orientation: increasing theta rotates CCW,
                # increasing r moves outward; (e_theta x e_r) points -z,
                # so flip to (r-first) ordering for positive volumes.
                n0 = vid(it, ir, iz)
                n1 = vid(it, ir + 1, iz)
                n2 = vid(it + 1, ir + 1, iz)
                n3 = vid(it + 1, ir, iz)
                elems.append([n0, n1, n2, n3,
                              vid(it, ir, iz + 1),
                              vid(it, ir + 1, iz + 1),
                              vid(it + 1, ir + 1, iz + 1),
                              vid(it + 1, ir, iz + 1)])
    connectivity = np.asarray(elems, dtype=np.intp)

    mesh = Mesh(nodes=nodes_flat, connectivity=connectivity,
                element_family=ElementFamily.HEX_LINEAR,
                element_blocks={"block_1": np.arange(
                    connectivity.shape[0], dtype=np.intp)},
                node_sets={}, side_sets={})
    if kind == "tet":
        mesh = hex_to_tet_split(mesh)
    return mesh


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--h", type=float, default=0.08)
    parser.add_argument("--plate", type=float, nargs=3,
                        metavar=("LX", "LY", "LZ"),
                        default=(1.0, 1.0, 0.1))
    parser.add_argument("--radius", type=float, default=0.2)
    parser.add_argument("--kind", choices=("hex", "tet"), default="tet")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    mesh = notch_mesh(args.h, plate=tuple(args.plate),
                      notch_radius=args.radius, kind=args.kind)
    out = args.out or f"examples/meshes/notch_h{args.h:.3f}.exo"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    writer = ExodusWriter(out, mesh)
    writer.close()
    print(f"wrote {out} ({mesh.connectivity.shape[0]} "
          f"{'tets' if args.kind == 'tet' else 'hexes'})")


if __name__ == "__main__":
    main()
