"""Pure-Python gmsh ``.msh`` (ASCII v4.1 / v2.2) reader.

Parity: reference ``cmad/io/gmsh.py`` (which shells out to the gmsh SDK —
absent from this image, so this is a from-scratch ASCII parser).
Supports tet4 / hex8 volume elements; 3D physical groups become element
blocks; 2D physical groups become side sets by matching each surface
element's vertex set against the faces of an adjacent volume element.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from cmad_tpu.fem.mesh import Mesh
from cmad_tpu.fem.topology import ElementFamily, LOCAL_FACES

# gmsh element type -> (family or None(surface), n nodes)
_VOLUME_TYPES = {4: (ElementFamily.TET_LINEAR, 4),
                 5: (ElementFamily.HEX_LINEAR, 8)}
_SURFACE_TYPES = {2: 3, 3: 4}  # tri3, quad4

# gmsh hex node ordering matches cmad's (Exodus); tet too.


def _read_sections(path: Path) -> dict[str, list[str]]:
    sections: dict[str, list[str]] = {}
    current = None
    for line in path.read_text().splitlines():
        stripped = line.strip()
        if stripped.startswith("$End"):
            current = None
        elif stripped.startswith("$"):
            current = stripped[1:]
            sections[current] = []
        elif current is not None:
            sections[current].append(stripped)
    return sections


def read_mesh(path: Path) -> Mesh:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"mesh file not found: {path}")
    sections = _read_sections(path)
    if "MeshFormat" not in sections:
        raise ValueError(f"{path} is not a gmsh .msh file")
    version = float(sections["MeshFormat"][0].split()[0])
    if version >= 4.0:
        return _read_v4(sections)
    return _read_v2(sections)


def _physical_names(sections) -> dict[tuple[int, int], str]:
    names = {}
    for line in sections.get("PhysicalNames", [])[1:]:
        parts = line.split(maxsplit=2)
        if len(parts) == 3:
            dim, tag, name = int(parts[0]), int(parts[1]), parts[2]
            names[(dim, tag)] = name.strip().strip('"')
    return names


def _read_v4(sections) -> Mesh:
    phys_names = _physical_names(sections)

    # entity -> physical tags (dims 2 and 3)
    ent_phys: dict[tuple[int, int], list[int]] = {}
    ent_lines = sections.get("Entities", [])
    if ent_lines:
        counts = [int(x) for x in ent_lines[0].split()]
        idx = 1
        for dim, n in enumerate(counts):
            for _ in range(n):
                parts = ent_lines[idx].split()
                idx += 1
                tag = int(parts[0])
                if dim == 0:
                    n_phys = int(parts[4])
                    phys = [int(p) for p in parts[5:5 + n_phys]]
                else:
                    n_phys = int(parts[7])
                    phys = [int(p) for p in parts[8:8 + n_phys]]
                ent_phys[(dim, tag)] = phys

    # nodes
    node_lines = sections["Nodes"]
    header = node_lines[0].split()
    num_blocks = int(header[0])
    idx = 1
    tags, coords = [], []
    for _ in range(num_blocks):
        _dim, _etag, _param, n = (int(x) for x in node_lines[idx].split())
        idx += 1
        block_tags = [int(node_lines[idx + i]) for i in range(n)]
        idx += n
        for i in range(n):
            xyz = [float(x) for x in node_lines[idx + i].split()[:3]]
            coords.append(xyz)
        idx += n
        tags.extend(block_tags)
    tag_to_idx = {t: i for i, t in enumerate(tags)}
    nodes = np.asarray(coords, dtype=float)

    # elements
    elem_lines = sections["Elements"]
    num_blocks = int(elem_lines[0].split()[0])
    idx = 1
    volume_elems: list[tuple[int, np.ndarray]] = []  # (phys_tag, conn)
    surface_elems: list[tuple[int, np.ndarray]] = []
    families = set()
    for _ in range(num_blocks):
        dim, etag, etype, n = (int(x) for x in elem_lines[idx].split())
        idx += 1
        rows = elem_lines[idx:idx + n]
        idx += n
        phys = ent_phys.get((dim, etag), [])
        ptag = phys[0] if phys else 0
        if etype in _VOLUME_TYPES:
            family, npe = _VOLUME_TYPES[etype]
            families.add(family)
            for row in rows:
                parts = [int(x) for x in row.split()]
                conn = np.asarray([tag_to_idx[t] for t in parts[1:npe + 1]],
                                  dtype=np.intp)
                volume_elems.append((ptag, conn))
        elif etype in _SURFACE_TYPES:
            npe = _SURFACE_TYPES[etype]
            for row in rows:
                parts = [int(x) for x in row.split()]
                conn = np.asarray([tag_to_idx[t] for t in parts[1:npe + 1]],
                                  dtype=np.intp)
                surface_elems.append((ptag, conn))

    return _assemble(nodes, volume_elems, surface_elems, families,
                     phys_names)


def _read_v2(sections) -> Mesh:
    phys_names = _physical_names(sections)
    node_lines = sections["Nodes"]
    n = int(node_lines[0])
    tags, coords = [], []
    for line in node_lines[1:1 + n]:
        parts = line.split()
        tags.append(int(parts[0]))
        coords.append([float(x) for x in parts[1:4]])
    tag_to_idx = {t: i for i, t in enumerate(tags)}
    nodes = np.asarray(coords, dtype=float)

    elem_lines = sections["Elements"]
    n = int(elem_lines[0])
    volume_elems, surface_elems, families = [], [], set()
    for line in elem_lines[1:1 + n]:
        parts = [int(x) for x in line.split()]
        etype, ntags = parts[1], parts[2]
        ptag = parts[3] if ntags >= 1 else 0
        conn_tags = parts[3 + ntags:]
        conn = np.asarray([tag_to_idx[t] for t in conn_tags],
                          dtype=np.intp)
        if etype in _VOLUME_TYPES:
            families.add(_VOLUME_TYPES[etype][0])
            volume_elems.append((ptag, conn))
        elif etype in _SURFACE_TYPES:
            surface_elems.append((ptag, conn))
    return _assemble(nodes, volume_elems, surface_elems, families,
                     phys_names)


def _assemble(nodes, volume_elems, surface_elems, families,
              phys_names) -> Mesh:
    if not volume_elems:
        raise ValueError("no supported volume elements (tet4/hex8) found")
    if len(families) != 1:
        raise ValueError("mixed element families are not supported")
    family = families.pop()

    connectivity = np.stack([c for _, c in volume_elems])
    ptags = np.asarray([p for p, _ in volume_elems])

    blocks: dict[str, np.ndarray] = {}
    block_ids: dict[str, int] = {}
    for tag in sorted(set(ptags)):
        name = phys_names.get((3, tag), f"block_{tag}" if tag else "all")
        blocks[name] = np.flatnonzero(ptags == tag).astype(np.intp)
        block_ids[name] = int(tag) if tag >= 1 else 1
    if len(blocks) == 1:
        (only,) = blocks
        if only.startswith("block_0"):
            blocks = {"all": blocks[only]}
            block_ids = {"all": 1}

    # face-key -> (elem, local_face)
    local = LOCAL_FACES[family]
    face_map: dict[tuple, tuple[int, int]] = {}
    for e in range(connectivity.shape[0]):
        for f in range(local.shape[0]):
            key = tuple(sorted(connectivity[e, local[f]].tolist()))
            face_map[key] = (e, f)

    side_sets: dict[str, list] = {}
    side_ids: dict[str, int] = {}
    for tag, conn in surface_elems:
        key = tuple(sorted(conn.tolist()))
        hit = face_map.get(key)
        if hit is None:
            continue  # interior or orphan surface element
        name = phys_names.get((2, tag), f"sideset_{tag}")
        side_sets.setdefault(name, []).append(hit)
        side_ids.setdefault(name, int(tag) if tag >= 1 else
                            len(side_ids) + 1)

    return Mesh(nodes=nodes, connectivity=connectivity,
                element_family=family, element_blocks=blocks,
                node_sets={},
                side_sets={k: np.asarray(v, dtype=np.intp)
                           for k, v in side_sets.items()},
                element_block_ids=block_ids, side_set_ids=side_ids)
