"""Gmsh `.msh` input: arbitrary triangulations as data.

The reference consumes arbitrary Gmsh meshes through Ferrite's loaders
(`/root/reference/src/utils.jl:20-40` builds on the same grid machinery);
here the parity path is `read_gmsh(path) -> UnstructuredTriangleMesh`
(fem/mesh.py) — topology enters as (coords, cells, node_sets) arrays and
everything downstream (assembly, Matérn priors, conditioning, evaluation
operators, RCM bandedness reordering) works unchanged.

Supports ASCII MSH 2.2 and 4.1:
  * triangles: type 2 (P1, 3-node) and type 9 (P2, 6-node — Gmsh's local
    edge order [v0 v1 v2 m01 m12 m20] matches the framework's reference
    element exactly);
  * physical groups of dimension 0/1 (points/curves) become node sets
    keyed by their $PhysicalNames name (fallback: "phys<tag>");
  * non-contiguous node tags are remapped densely.
"""

from __future__ import annotations

import numpy as np


def _read_sections(text: str) -> dict:
    """Split the file into {section name: list of lines}."""
    sections = {}
    cur = None
    buf = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("$End"):
            sections[cur] = buf
            cur, buf = None, []
        elif line.startswith("$"):
            cur = line[1:]
            buf = []
        elif cur is not None:
            buf.append(line)
    return sections


def _parse_physical_names(lines):
    names = {}
    if not lines:
        return names
    for line in lines[1:]:
        parts = line.split(None, 2)
        dim, tag = int(parts[0]), int(parts[1])
        names[(dim, tag)] = parts[2].strip().strip('"')
    return names


def _parse_v2(sections):
    node_lines = sections["Nodes"]
    n_nodes = int(node_lines[0])
    tags = np.empty(n_nodes, dtype=np.int64)
    coords = np.empty((n_nodes, 2), dtype=np.float64)
    for i, line in enumerate(node_lines[1 : 1 + n_nodes]):
        p = line.split()
        tags[i] = int(p[0])
        coords[i] = (float(p[1]), float(p[2]))
    elem_lines = sections["Elements"]
    n_elem = int(elem_lines[0])
    tris, tri_order = [], None
    groups = {}  # (dim, phys_tag) -> [node tags]
    for line in elem_lines[1 : 1 + n_elem]:
        p = [int(x) for x in line.split()]
        etype, ntags = p[1], p[2]
        etags = p[3 : 3 + ntags]
        nodes = p[3 + ntags :]
        phys = etags[0] if etags else 0
        if etype in (2, 9):
            order = 1 if etype == 2 else 2
            if tri_order not in (None, order):
                raise ValueError("mixed P1/P2 triangles in one mesh")
            tri_order = order
            tris.append(nodes)
        elif etype in (1, 8):  # 2/3-node line
            groups.setdefault((1, phys), []).extend(nodes)
        elif etype == 15:  # point
            groups.setdefault((0, phys), []).extend(nodes)
    return tags, coords, np.asarray(tris, dtype=np.int64), tri_order, groups


def _parse_v4(sections):
    # $Entities: map (dim, entityTag) -> [physicalTags]
    ent_phys = {}
    ent = sections.get("Entities")
    if ent:
        counts = [int(x) for x in ent[0].split()]
        idx = 1
        for dim, cnt in enumerate(counts):
            for _ in range(cnt):
                p = ent[idx].split()
                idx += 1
                tag = int(p[0])
                # points: tag x y z numPhys ...; others: tag 6 bbox floats
                off = 4 if dim == 0 else 7
                n_phys = int(p[off])
                ent_phys[(dim, tag)] = [
                    int(x) for x in p[off + 1 : off + 1 + n_phys]
                ]
    node_lines = sections["Nodes"]
    hdr = node_lines[0].split()
    n_blocks, n_nodes = int(hdr[0]), int(hdr[1])
    tags = np.empty(n_nodes, dtype=np.int64)
    coords = np.empty((n_nodes, 2), dtype=np.float64)
    idx, out = 1, 0
    for _ in range(n_blocks):
        bl = node_lines[idx].split()
        idx += 1
        cnt = int(bl[3])
        for k in range(cnt):
            tags[out + k] = int(node_lines[idx + k])
        for k in range(cnt):
            p = node_lines[idx + cnt + k].split()
            coords[out + k] = (float(p[0]), float(p[1]))
        idx += 2 * cnt
        out += cnt
    elem_lines = sections["Elements"]
    hdr = elem_lines[0].split()
    n_blocks = int(hdr[0])
    idx = 1
    tris, tri_order = [], None
    groups = {}
    for _ in range(n_blocks):
        bl = elem_lines[idx].split()
        idx += 1
        dim, etag, etype, cnt = (
            int(bl[0]), int(bl[1]), int(bl[2]), int(bl[3]),
        )
        phys_tags = ent_phys.get((dim, etag), [])
        for k in range(cnt):
            p = [int(x) for x in elem_lines[idx + k].split()]
            nodes = p[1:]
            if etype in (2, 9):
                order = 1 if etype == 2 else 2
                if tri_order not in (None, order):
                    raise ValueError("mixed P1/P2 triangles in one mesh")
                tri_order = order
                tris.append(nodes)
            elif etype in (1, 8, 15):
                d = 0 if etype == 15 else 1
                for pt in phys_tags or [0]:
                    groups.setdefault((d, pt), []).extend(nodes)
        idx += cnt
    return tags, coords, np.asarray(tris, dtype=np.int64), tri_order, groups


def read_gmsh(path, order: int = 2, reorder: bool = True):
    """Parse an ASCII `.msh` file into an `UnstructuredTriangleMesh`.

    `order`: target element order of the returned mesh. P1 triangle input
    gets midpoint nodes generated when order=2; P2 input is used as-is
    (order must be 2 then).
    """
    from diffeqgmrfs_tpu.fem.mesh import UnstructuredTriangleMesh

    with open(path) as f:
        text = f.read()
    sections = _read_sections(text)
    if "MeshFormat" not in sections:
        raise ValueError("not a Gmsh .msh file (no $MeshFormat)")
    fmt = sections["MeshFormat"][0].split()
    version, is_binary = float(fmt[0]), int(fmt[1])
    if is_binary:
        raise ValueError("binary .msh is not supported; export ASCII")
    if version >= 4.0:
        tags, coords, tris, tri_order, groups = _parse_v4(sections)
    else:
        tags, coords, tris, tri_order, groups = _parse_v2(sections)
    if tris.size == 0:
        raise ValueError("no triangle elements in mesh")
    # dense node remap (gmsh tags can be arbitrary)
    remap = {int(t): i for i, t in enumerate(tags)}
    cells = np.vectorize(remap.__getitem__, otypes=[np.int64])(tris)
    names = _parse_physical_names(sections.get("PhysicalNames"))
    node_sets = {}
    for (dim, ptag), nlist in groups.items():
        name = names.get((dim, ptag), f"phys{ptag}")
        ids = np.unique(
            np.vectorize(remap.__getitem__, otypes=[np.int64])(
                np.asarray(nlist, dtype=np.int64)
            )
        )
        if name in node_sets:
            ids = np.unique(np.concatenate([node_sets[name], ids]))
        node_sets[name] = ids
    if tri_order == 2 and order != 2:
        raise ValueError("P2 .msh input requires order=2")
    return UnstructuredTriangleMesh(
        coords, cells, order=order, node_sets=node_sets or None,
        reorder=reorder,
    )
