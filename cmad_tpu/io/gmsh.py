"""Pure-Python gmsh ``.msh`` (ASCII + binary, v4.1 / v2.2) reader.

Parity: reference ``cmad/io/gmsh.py`` (which shells out to the gmsh SDK —
absent from this image, so this is a from-scratch parser). Both the
ASCII and binary encodings of msh 2.2 and msh 4.1 are supported, with
either endianness (the 4-byte sentinel in ``$MeshFormat`` decides).
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


def _read_sections(text: str) -> dict[str, list[str]]:
    sections: dict[str, list[str]] = {}
    current = None
    for line in text.splitlines():
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
    data = path.read_bytes()
    start = data.find(b"$MeshFormat")
    if start < 0:
        raise ValueError(f"{path} is not a gmsh .msh file")
    line_start = data.index(b"\n", start) + 1
    line_end = data.index(b"\n", line_start)
    fmt = data[line_start:line_end].decode("latin-1").split()
    version = float(fmt[0])
    is_binary = len(fmt) > 1 and int(fmt[1]) == 1
    if not is_binary:
        sections = _read_sections(data.decode("latin-1"))
        if version >= 4.0:
            return _read_v4(sections)
        return _read_v2(sections)
    # binary: the format line is followed by a raw 4-byte int 1 whose
    # byte order reveals the file's endianness
    sentinel = int(np.frombuffer(data, dtype="<i4", count=1,
                                 offset=line_end + 1)[0])
    endian = "<" if sentinel == 1 else ">"
    size_t = f"u{int(fmt[2])}" if len(fmt) > 2 else "u8"
    if version >= 4.0:
        if version < 4.1:
            raise ValueError(
                f"binary msh {fmt[0]} is not supported (4.1 and 2.2 are)")
        return _read_v4_binary(data, endian, size_t)
    return _read_v2_binary(data, endian)


class _BinCursor:
    """Sequential typed reads over a bytes buffer."""

    def __init__(self, data: bytes, offset: int, endian: str):
        self._data = data
        self.offset = offset
        self._endian = endian

    def take(self, code: str, count: int) -> np.ndarray:
        dt = np.dtype(self._endian + code)
        out = np.frombuffer(self._data, dtype=dt, count=int(count),
                            offset=self.offset)
        self.offset += dt.itemsize * int(count)
        return out

    def one(self, code: str) -> int:
        return int(self.take(code, 1)[0])


def _binary_section(data: bytes, name: str) -> int | None:
    """Byte offset of a section's payload (just past ``$Name\\n``)."""
    marker = b"$" + name.encode()
    start = data.find(marker)
    while start >= 0:
        nl = data.index(b"\n", start)
        if data[start:nl].strip() == marker:
            return nl + 1
        start = data.find(marker, nl)
    return None


def _ascii_section_lines(data: bytes, name: str) -> list[str]:
    """Lines of an ASCII section embedded in a binary file."""
    begin = _binary_section(data, name)
    if begin is None:
        return []
    end = data.index(b"$End" + name.encode(), begin)
    return data[begin:end].decode("latin-1").splitlines()


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


def _read_v4_binary(data: bytes, endian: str, size_t: str) -> Mesh:
    phys_names = _physical_names(
        {"PhysicalNames": _ascii_section_lines(data, "PhysicalNames")})

    # entity -> physical tags (binary Entities section)
    ent_phys: dict[tuple[int, int], list[int]] = {}
    begin = _binary_section(data, "Entities")
    if begin is not None:
        cur = _BinCursor(data, begin, endian)
        counts = [cur.one(size_t) for _ in range(4)]
        for dim, n in enumerate(counts):
            for _ in range(n):
                tag = cur.one("i4")
                cur.take("f8", 3 if dim == 0 else 6)  # bbox
                n_phys = cur.one(size_t)
                phys = cur.take("i4", n_phys).tolist()
                if dim > 0:
                    n_bound = cur.one(size_t)
                    cur.take("i4", n_bound)
                ent_phys[(dim, tag)] = [int(p) for p in phys]

    begin = _binary_section(data, "Nodes")
    if begin is None:
        raise ValueError("binary msh 4.1 file has no $Nodes section")
    cur = _BinCursor(data, begin, endian)
    num_blocks = cur.one(size_t)
    cur.take(size_t, 3)  # numNodes, minTag, maxTag
    tags: list[int] = []
    coords_parts: list[np.ndarray] = []
    for _ in range(num_blocks):
        cur.take("i4", 3)  # entityDim, entityTag, parametric
        n = cur.one(size_t)
        tags.extend(int(t) for t in cur.take(size_t, n))
        coords_parts.append(cur.take("f8", 3 * n).reshape(n, 3))
    tag_to_idx = {t: i for i, t in enumerate(tags)}
    nodes = (np.concatenate(coords_parts, axis=0).astype(float)
             if coords_parts else np.zeros((0, 3)))

    begin = _binary_section(data, "Elements")
    if begin is None:
        raise ValueError("binary msh 4.1 file has no $Elements section")
    cur = _BinCursor(data, begin, endian)
    num_blocks = cur.one(size_t)
    cur.take(size_t, 3)
    volume_elems: list[tuple[int, np.ndarray]] = []
    surface_elems: list[tuple[int, np.ndarray]] = []
    families = set()
    for _ in range(num_blocks):
        dim = cur.one("i4")
        etag = cur.one("i4")
        etype = cur.one("i4")
        n = cur.one(size_t)
        npe = (_VOLUME_TYPES[etype][1] if etype in _VOLUME_TYPES
               else _SURFACE_TYPES.get(etype))
        if npe is None:
            # unsupported element type: npe is unknowable without a
            # full type table, so the block cannot be skipped reliably
            raise ValueError(
                f"unsupported gmsh element type {etype} in binary file "
                "(tet4/hex8 volumes, tri3/quad4 surfaces)")
        rows = cur.take(size_t, n * (1 + npe)).reshape(n, 1 + npe)
        phys = ent_phys.get((dim, etag), [])
        ptag = phys[0] if phys else 0
        for row in rows:
            conn = np.asarray([tag_to_idx[int(t)] for t in row[1:]],
                              dtype=np.intp)
            if etype in _VOLUME_TYPES:
                families.add(_VOLUME_TYPES[etype][0])
                volume_elems.append((ptag, conn))
            else:
                surface_elems.append((ptag, conn))
    return _assemble(nodes, volume_elems, surface_elems, families,
                     phys_names)


def _read_v2_binary(data: bytes, endian: str) -> Mesh:
    phys_names = _physical_names(
        {"PhysicalNames": _ascii_section_lines(data, "PhysicalNames")})

    begin = _binary_section(data, "Nodes")
    if begin is None:
        raise ValueError("binary msh 2.2 file has no $Nodes section")
    # the node count is an ASCII line even in binary files
    count_end = data.index(b"\n", begin)
    n = int(data[begin:count_end])
    rec = np.dtype([("tag", endian + "i4"), ("xyz", endian + "f8", 3)])
    recs = np.frombuffer(data, dtype=rec, count=n, offset=count_end + 1)
    tag_to_idx = {int(t): i for i, t in enumerate(recs["tag"])}
    nodes = recs["xyz"].astype(float)

    begin = _binary_section(data, "Elements")
    if begin is None:
        raise ValueError("binary msh 2.2 file has no $Elements section")
    count_end = data.index(b"\n", begin)
    n_total = int(data[begin:count_end])
    cur = _BinCursor(data, count_end + 1, endian)
    volume_elems: list[tuple[int, np.ndarray]] = []
    surface_elems: list[tuple[int, np.ndarray]] = []
    families = set()
    n_read = 0
    while n_read < n_total:
        etype = cur.one("i4")
        n_follow = cur.one("i4")
        n_tags = cur.one("i4")
        npe = (_VOLUME_TYPES[etype][1] if etype in _VOLUME_TYPES
               else _SURFACE_TYPES.get(etype))
        if npe is None:
            raise ValueError(
                f"unsupported gmsh element type {etype} in binary file "
                "(tet4/hex8 volumes, tri3/quad4 surfaces)")
        rows = cur.take("i4", n_follow * (1 + n_tags + npe)).reshape(
            n_follow, 1 + n_tags + npe)
        for row in rows:
            ptag = int(row[1]) if n_tags >= 1 else 0
            conn = np.asarray(
                [tag_to_idx[int(t)] for t in row[1 + n_tags:]],
                dtype=np.intp)
            if etype in _VOLUME_TYPES:
                families.add(_VOLUME_TYPES[etype][0])
                volume_elems.append((ptag, conn))
            else:
                surface_elems.append((ptag, conn))
        n_read += n_follow
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
