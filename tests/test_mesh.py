"""Mesh generator, msh I/O, and Taylor-Hood space tests."""

import numpy as np
import pytest

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh import (Mesh, box_3d, channel_with_cylinder_2d,
                                   duct_with_box_obstacle_3d,
                                   duct_with_cylinder_3d, naca_channel_2d,
                                   read_msh, rectangle_2d, write_msh)
from navierstokes_tpu.mesh.airfoil import naca4_polyline


def test_rectangle_2d():
    m = rectangle_2d(2.0, 1.0, 8, 4)
    assert m.n_cells == 8 * 4 * 2
    np.testing.assert_allclose(m.cell_volumes().sum(), 2.0)
    tags = set(m.boundary_tags.tolist())
    assert tags == {0, 1, 2, 3}


def test_channel_with_cylinder_2d():
    m = channel_with_cylinder_2d(h=0.05)
    area = 2.2 * 0.41 - np.pi * 0.05 ** 2
    # polygonal hole -> slightly larger than exact circle-cut area
    assert abs(m.cell_volumes().sum() - area) < 2e-3
    assert set(m.boundary_tags.tolist()) == {0, 1, 2, 3, 4}
    # obstacle faces lie on the circle
    obst = m.boundary_faces[m.boundary_tags == 4]
    pts = m.points[np.unique(obst)]
    r = np.hypot(pts[:, 0] - 0.2, pts[:, 1] - 0.2)
    np.testing.assert_allclose(r, 0.05, atol=1e-12)
    # mesh quality: no tiny angles
    p = m.points[m.cells]
    e1 = p[:, 1] - p[:, 0]
    e2 = p[:, 2] - p[:, 0]
    area2 = np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    lmax = max(np.linalg.norm(e1, axis=1).max(),
               np.linalg.norm(e2, axis=1).max())
    assert (area2 > 1e-6 * lmax ** 2).all()


def test_box_3d():
    m = box_3d(1.0, 1.0, 1.0, n=3)
    np.testing.assert_allclose(m.cell_volumes().sum(), 1.0, atol=1e-12)
    assert set(m.boundary_tags.tolist()) == {0, 1, 2, 3}
    # closed surface: boundary faces cover all 6 sides
    assert m.n_boundary_faces == 6 * 3 * 3 * 2


def test_duct_with_box_obstacle_3d():
    m = duct_with_box_obstacle_3d(h=0.1)
    vol = 2.5 * 0.41 * 0.41 - 0.1 * 0.1 * 0.41
    np.testing.assert_allclose(m.cell_volumes().sum(), vol, atol=1e-10)
    assert set(m.boundary_tags.tolist()) == {0, 1, 2, 3, 4}


def test_duct_with_cylinder_3d():
    m = duct_with_cylinder_3d(h=0.08)
    vol = (2.5 * 0.41 - np.pi * 0.05 ** 2) * 0.41
    assert abs(m.cell_volumes().sum() - vol) < 4e-3
    assert set(m.boundary_tags.tolist()) == {0, 1, 2, 3, 4}
    m.validate()


def test_naca_mesh():
    pts = naca4_polyline("2408", n=30)
    pts = pts * 0.4  # chord 0.4 like run_test.sh:8
    m = naca_channel_2d(pts, h=0.1, h_near=0.02)
    assert set(m.boundary_tags.tolist()) == {0, 1, 2, 3, 4}
    m.validate()


def test_msh_roundtrip(tmp_path):
    m = channel_with_cylinder_2d(h=0.08)
    path = str(tmp_path / "mesh.msh")
    write_msh(m, path)
    m2 = read_msh(path)
    assert m2.n_points == m.n_points
    assert m2.n_cells == m.n_cells
    np.testing.assert_allclose(
        np.sort(m.cell_volumes()), np.sort(m2.cell_volumes()), atol=1e-12)
    assert sorted(m2.boundary_tags.tolist()) == sorted(m.boundary_tags.tolist())


def test_msh_roundtrip_3d(tmp_path):
    m = box_3d(n=2)
    path = str(tmp_path / "mesh3.msh")
    write_msh(m, path)
    m2 = read_msh(path)
    assert m2.n_cells == m.n_cells
    np.testing.assert_allclose(m2.cell_volumes().sum(), 1.0, atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_taylor_hood_space(dim):
    m = rectangle_2d(1, 1, 4, 4) if dim == 2 else box_3d(n=2)
    sp = TaylorHoodSpace(m)
    # Euler-ish sanity: P2 nodes = vertices + edges
    assert sp.n_p2 == m.n_points + sp.n_edges
    assert sp.cell_p2.shape == (m.n_cells, sp.rs.n_v)
    # every P2 midpoint node coordinate is the midpoint of its edge
    assert sp.p2_coords.shape == (sp.n_p2, dim)
    # inlet nodes lie on x=0
    nodes = sp.p2_nodes_on_tag(3)
    np.testing.assert_allclose(sp.p2_coords[nodes][:, 0], 0.0, atol=1e-12)
    # face data: obstacle-free box, outlet faces have outward normal +x
    fd = sp.face_data(1)
    np.testing.assert_allclose(fd.normals[..., 0], 1.0, atol=1e-12)
    # total outlet measure
    measure = 1.0 if dim == 2 else 1.0
    np.testing.assert_allclose(fd.jxw.sum(), measure, atol=1e-12)


def test_read_gmsh_v41_fixture():
    """Parse a vendored gmsh-4.1-structured file ($PhysicalNames, $Entities
    with per-curve physical tags, multi-block $Nodes with non-contiguous
    ids, point-element block, per-curve line blocks) — the real
    GridIn::read_msh input shape (reference src/NavierStokes.cpp:11-17),
    not just round-trips of our own v2.2 writer."""
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "domain2d_gmsh41.msh")
    mesh = read_msh(path)
    assert mesh.dim == 2
    assert mesh.n_points == 317
    assert mesh.n_cells == 522
    assert mesh.n_boundary_faces == 112
    assert sorted(set(mesh.boundary_tags.tolist())) == [0, 1, 2, 3, 4]
    # total area: channel minus cylinder (value recorded at generation)
    v = mesh.points[mesh.cells]
    area = np.abs(np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])).sum() / 2
    np.testing.assert_allclose(area, 0.894235428647, rtol=1e-9)
    # orientation normalized on read
    assert np.all(np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]) > 0)
    # usable downstream: Taylor-Hood space builds
    from navierstokes_tpu.fem.spaces import TaylorHoodSpace
    sp = TaylorHoodSpace(mesh, 2, 1)
    assert sp.n_dofs == 2 * sp.n_p2 + sp.n_p1


@pytest.mark.parametrize("version", ["2.2", "4.1"])
@pytest.mark.parametrize("dim", [2, 3])
def test_msh_binary_roundtrip(tmp_path, version, dim):
    """Binary .msh (gmsh -bin output shape) reads back identically to the
    ASCII form — points, cells, tags (deal.II GridIn::read_msh ingests
    binary too, reference src/NavierStokes.cpp:11-17)."""
    from navierstokes_tpu.mesh.msh_io import write_msh_binary
    m = channel_with_cylinder_2d(h=0.12) if dim == 2 else box_3d(n=2)
    pa = str(tmp_path / "a.msh")
    pb = str(tmp_path / "b.msh")
    write_msh(m, pa)
    write_msh_binary(m, pb, version=version)
    ma = read_msh(pa)
    mb = read_msh(pb)
    np.testing.assert_allclose(mb.points, ma.points, atol=1e-12)
    np.testing.assert_array_equal(mb.cells, ma.cells)
    assert (sorted(mb.boundary_tags.tolist())
            == sorted(ma.boundary_tags.tolist()))
    rows = lambda f: {tuple(sorted(r)) for r in f.tolist()}
    assert rows(mb.boundary_faces) == rows(ma.boundary_faces)
    mb.validate()
