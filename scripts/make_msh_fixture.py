"""Generate tests/fixtures/domain2d_gmsh41.msh — a gmsh v4.1 ASCII file
with the full structure gmsh itself emits for mesh/domain2D.geo (reference
convention: physical curve tags 0..4, surface 10; domain2D.geo:39-44):

* $PhysicalNames
* $Entities with per-curve physical tags
* $Nodes split into per-entity blocks with NON-contiguous node ids
* $Elements with a point-element block (to be skipped), one line block per
  boundary curve, and the triangle block on the surface entity

This exercises everything `mesh/msh_io.read_msh` must handle beyond our
own writer's plain v2.2 output.  Run once; the fixture is committed.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from navierstokes_tpu.mesh import channel_with_cylinder_2d  # noqa: E402


def main():
    mesh = channel_with_cylinder_2d(h=0.12, h_near=0.05)
    pts, cells = mesh.points, mesh.cells
    bfaces, btags = mesh.boundary_faces, mesh.boundary_tags
    n = len(pts)

    # non-contiguous gmsh node ids: skip every 13th id
    gid = np.arange(1, n + 1, dtype=np.int64)
    gid += np.arange(n) // 12  # gaps

    # assign nodes to entities: curve entity = phys+1 for boundary nodes
    # (first tag wins), surface entity for the rest
    node_ent = np.full(n, -1, dtype=np.int64)  # -1 = surface
    for face, tag in zip(bfaces, btags):
        for v in face:
            if node_ent[v] == -1:
                node_ent[v] = tag
    curve_tags = sorted(set(btags.tolist()))

    out = []
    w = out.append
    w("$MeshFormat\n4.1 0 8\n$EndMeshFormat")
    w("$PhysicalNames")
    names = {0: "walls_bottom", 1: "outlet", 2: "walls_top", 3: "inlet",
             4: "obstacle"}
    w(str(len(curve_tags) + 1))
    for t in curve_tags:
        w(f'1 {t} "{names[t]}"')
    w('2 10 "domain"')
    w("$EndPhysicalNames")

    # entities: 0 points, len(curve_tags) curves, 1 surface
    w("$Entities")
    w(f"0 {len(curve_tags)} 1 0")
    for t in curve_tags:
        # curveTag minX minY minZ maxX maxY maxZ numPhys phys... numBnd ...
        w(f"{t + 1} 0 0 0 2.2 0.41 0 1 {t} 0")
    w("1 0 0 0 2.2 0.41 0 1 10 0")
    w("$EndEntities")

    # nodes: one block per curve entity + one surface block
    blocks = []
    for t in curve_tags:
        idx = np.where(node_ent == t)[0]
        blocks.append((1, t + 1, idx))
    blocks.append((2, 1, np.where(node_ent == -1)[0]))
    w("$Nodes")
    w(f"{len(blocks)} {n} {gid.min()} {gid.max()}")
    for edim, etag, idx in blocks:
        w(f"{edim} {etag} 0 {len(idx)}")
        for i in idx:
            w(str(gid[i]))
        for i in idx:
            w(f"{pts[i, 0]:.16g} {pts[i, 1]:.16g} 0")
    w("$EndNodes")

    # elements: 1 point block (skipped by the reader) + line blocks + tris
    eid = 1
    w("$Elements")
    corner = np.argmin(pts[:, 0] + pts[:, 1])
    n_eblocks = 1 + len(curve_tags) + 1
    n_elems = 1 + len(bfaces) + len(cells)
    w(f"{n_eblocks} {n_elems} 1 {n_elems}")
    w(f"0 1 15 1")
    w(f"{eid} {gid[corner]}")
    eid += 1
    for t in curve_tags:
        rows = np.where(btags == t)[0]
        w(f"1 {t + 1} 1 {len(rows)}")
        for r in rows:
            a, b = bfaces[r]
            w(f"{eid} {gid[a]} {gid[b]}")
            eid += 1
    w(f"2 1 2 {len(cells)}")
    for c in cells:
        w(f"{eid} {gid[c[0]]} {gid[c[1]]} {gid[c[2]]}")
        eid += 1
    w("$EndElements")

    dst = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "domain2d_gmsh41.msh")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {dst}: {n} nodes, {len(cells)} tris, "
          f"{len(bfaces)} boundary lines, tags {curve_tags}")
    # reference values for the regression test
    area = 0.0
    v = pts[cells]
    area = float(np.abs(np.cross(v[:, 1] - v[:, 0],
                                 v[:, 2] - v[:, 0])).sum() / 2)
    print(f"n_points={n} n_cells={len(cells)} n_bfaces={len(bfaces)} "
          f"area={area:.12f}")


if __name__ == "__main__":
    main()
