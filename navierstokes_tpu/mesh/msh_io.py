"""gmsh ``.msh`` ASCII reader/writer (formats 2.2 and 4.1).

Replaces deal.II ``GridIn::read_msh`` (reference: src/NavierStokes.cpp:11-17).
Only simplices are ingested: lines/triangles in 2D, triangles/tets in 3D.
Physical tags on codim-1 elements become boundary-face tags; the physical
volume/surface tag of the domain itself (10 in every reference .geo,
e.g. mesh/domain2D.geo:44) is ignored, exactly like the reference solver
ignores it.
"""

from __future__ import annotations

import numpy as np

from navierstokes_tpu.mesh.geometry import Mesh

# gmsh element type -> (n_nodes, dim)
_ELEM_TYPES = {1: (2, 1), 2: (3, 2), 4: (4, 3), 15: (1, 0)}


def read_msh(path: str, dim: int | None = None) -> Mesh:
    with open(path, "r") as f:
        lines = f.read().splitlines()

    sections: dict[str, list[str]] = {}
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("$") and not line.startswith("$End"):
            name = line[1:]
            j = i + 1
            body = []
            end = f"$End{name}"
            while j < len(lines) and lines[j].strip() != end:
                body.append(lines[j])
                j += 1
            sections[name] = body
            i = j + 1
        else:
            i += 1

    if "MeshFormat" not in sections:
        raise ValueError(f"{path}: not a gmsh msh file")
    version = float(sections["MeshFormat"][0].split()[0])

    if version >= 4.0:
        nodes, node_ids, elems = _parse_v4(sections)
    else:
        nodes, node_ids, elems = _parse_v2(sections)

    # Renumber node ids to contiguous 0-based.
    id_map = {int(g): k for k, g in enumerate(node_ids)}
    remap = np.vectorize(id_map.__getitem__)

    # Infer dimension: highest-dim simplices present.
    dims_present = {d for (_, d, _, _) in elems if d > 0}
    mesh_dim = dim or max(dims_present)

    cells, bfaces, btags = [], [], []
    for etype, edim, phys, conn in elems:
        if edim == mesh_dim and etype in (2, 4):
            cells.append((remap(conn), ))
        elif edim == mesh_dim - 1 and etype in (1, 2):
            bfaces.append(remap(conn))
            btags.append(np.full(len(conn), phys, dtype=np.int32))

    if not cells:
        raise ValueError(f"{path}: no {mesh_dim}-D simplex cells found")
    cells_arr = np.concatenate([c[0] for c in cells], axis=0)
    if bfaces:
        bfaces_arr = np.concatenate(bfaces, axis=0)
        btags_arr = np.concatenate(btags, axis=0)
    else:
        bfaces_arr = np.zeros((0, mesh_dim), dtype=np.int32)
        btags_arr = np.zeros((0,), dtype=np.int32)

    pts = nodes[:, :mesh_dim]
    mesh = Mesh(mesh_dim, pts, cells_arr.astype(np.int32),
                bfaces_arr.astype(np.int32), btags_arr)
    return mesh.ensure_positive_orientation()


def _parse_v2(sections):
    node_lines = sections["Nodes"]
    n_nodes = int(node_lines[0])
    ids = np.empty(n_nodes, dtype=np.int64)
    coords = np.empty((n_nodes, 3))
    for k in range(n_nodes):
        parts = node_lines[1 + k].split()
        ids[k] = int(parts[0])
        coords[k] = [float(x) for x in parts[1:4]]

    elem_lines = sections["Elements"]
    n_elems = int(elem_lines[0])
    elems = []  # (etype, dim, phys, conn (n, n_nodes))
    groups: dict[tuple, list] = {}
    for k in range(n_elems):
        parts = elem_lines[1 + k].split()
        etype = int(parts[1])
        if etype not in _ELEM_TYPES:
            continue
        n_tags = int(parts[2])
        phys = int(parts[3]) if n_tags >= 1 else 0
        nn, edim = _ELEM_TYPES[etype]
        conn = [int(x) for x in parts[3 + n_tags: 3 + n_tags + nn]]
        groups.setdefault((etype, edim, phys), []).append(conn)
    for (etype, edim, phys), conns in groups.items():
        elems.append((etype, edim, phys, np.array(conns, dtype=np.int64)))
    return coords, ids, elems


def _parse_v4(sections):
    # Entities: map (dim, entity_tag) -> physical tag (first one).
    ent_phys: dict[tuple, int] = {}
    if "Entities" in sections:
        body = sections["Entities"]
        counts = [int(x) for x in body[0].split()]  # points, curves, surf, vol
        row = 1
        for edim, cnt in enumerate(counts):
            for _ in range(cnt):
                parts = body[row].split()
                row += 1
                tag = int(parts[0])
                # points: tag x y z numPhys ...; others: tag 6*bbox numPhys ...
                off = 4 if edim == 0 else 7
                n_phys = int(parts[off])
                if n_phys > 0:
                    ent_phys[(edim, tag)] = int(parts[off + 1])

    node_body = sections["Nodes"]
    header = [int(x) for x in node_body[0].split()]
    n_blocks, n_nodes = header[0], header[1]
    ids = np.empty(n_nodes, dtype=np.int64)
    coords = np.empty((n_nodes, 3))
    row, out = 1, 0
    for _ in range(n_blocks):
        _edim, _etag, _param, n_in_block = [int(x) for x in node_body[row].split()]
        row += 1
        for k in range(n_in_block):
            ids[out + k] = int(node_body[row + k])
        row += n_in_block
        for k in range(n_in_block):
            coords[out + k] = [float(x) for x in node_body[row + k].split()[:3]]
        row += n_in_block
        out += n_in_block

    elem_body = sections["Elements"]
    header = [int(x) for x in elem_body[0].split()]
    n_blocks = header[0]
    row = 1
    elems = []
    for _ in range(n_blocks):
        edim, etag, etype, n_in_block = [int(x) for x in elem_body[row].split()]
        row += 1
        if etype in _ELEM_TYPES:
            nn, _ = _ELEM_TYPES[etype]
            conn = np.empty((n_in_block, nn), dtype=np.int64)
            for k in range(n_in_block):
                parts = elem_body[row + k].split()
                conn[k] = [int(x) for x in parts[1:1 + nn]]
            phys = ent_phys.get((edim, etag), 0)
            elems.append((etype, edim, phys, conn))
        row += n_in_block
    return coords, ids, elems


def write_msh(mesh: Mesh, path: str):
    """Write msh 2.2 ASCII (readable by gmsh, deal.II and ourselves)."""
    dim = mesh.dim
    cell_type = 2 if dim == 2 else 4
    face_type = 1 if dim == 2 else 2
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{mesh.n_points}\n")
        for i, p in enumerate(mesh.points):
            xyz = list(p) + [0.0] * (3 - dim)
            f.write(f"{i + 1} {xyz[0]:.16g} {xyz[1]:.16g} {xyz[2]:.16g}\n")
        f.write("$EndNodes\n")
        n_elems = mesh.n_cells + mesh.n_boundary_faces
        f.write(f"$Elements\n{n_elems}\n")
        eid = 1
        for face, tag in zip(mesh.boundary_faces, mesh.boundary_tags):
            conn = " ".join(str(v + 1) for v in face)
            f.write(f"{eid} {face_type} 2 {tag} {tag} {conn}\n")
            eid += 1
        for cell in mesh.cells:
            conn = " ".join(str(v + 1) for v in cell)
            f.write(f"{eid} {cell_type} 2 10 10 {conn}\n")
            eid += 1
        f.write("$EndElements\n")
