"""Curved (superparametric P2) boundary geometry.

The reference's geometric fidelity at the obstacle comes from gmsh
resolving the r=0.05 circle at the local mesh size (reference:
mesh/domain2D.geo:10, consumed via GridIn::read_msh at
src/NavierStokes.cpp:11-17).  Here the native generators attach analytic
projectors and the FE space snaps the P2 midside nodes onto the exact
surface; the touched cells and faces integrate with the quadratic map
(fem/spaces.snap_boundaries / curved_data, ops/assembly, ops/operators).
"""

import numpy as np
import pytest

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh.generators import (channel_with_cylinder_2d,
                                              duct_with_cylinder_3d,
                                              rectangle_2d)
from navierstokes_tpu.ops.assembly import (cell_arrays_numpy,
                                           geometric_factors)

R = 0.05


def _cyl_space(h=0.03, snap=True):
    m = channel_with_cylinder_2d(h=h, h_near=h / 3)
    sp = TaylorHoodSpace(m)
    if snap:
        assert sp.snap_boundaries(m.snap_projectors) == [4]
    return m, sp


def test_unsnapped_mesh_has_no_curved_data():
    m = rectangle_2d(nx=4, ny=4)
    assert m.snap_projectors is None
    sp = TaylorHoodSpace(m)
    assert sp.curved_data() is None


def test_snapped_nodes_lie_on_circle():
    m, sp = _cyl_space()
    nodes = sp._snapped_nodes
    assert len(nodes) > 0
    d = np.hypot(sp.p2_coords[nodes, 0] - 0.2, sp.p2_coords[nodes, 1] - 0.2)
    np.testing.assert_allclose(d, R, atol=1e-14)


def test_curved_volume_and_perimeter_high_order():
    """Polygonal cylinder: area error O(h^2); curved quadrature: the hole
    area and the obstacle perimeter are exact to many more digits."""
    m, sp = _cyl_space(h=0.03)
    detj, _ = geometric_factors(sp)
    cd = sp.curved_data()
    exact = 2.2 * 0.41 - np.pi * R * R
    area_poly = detj.sum() * 0.5
    area_curv = (area_poly - detj[cd.ids].sum() * 0.5
                 + (cd.qw[None, :] * cd.detj_q).sum())
    assert abs(area_poly - exact) > 1e-5            # polygonal gap is real
    assert abs(area_curv - exact) < 1e-3 * abs(area_poly - exact)

    perim = sp.face_data(4).jxw.sum()
    assert abs(perim - 2 * np.pi * R) < 1e-5


def test_curved_face_divergence_identity():
    """Divergence theorem on the curved obstacle boundary: the face normals
    point out of the FLUID (into the disk), so  sum_q (x . n) JxW
    = -2 * disk area = -2 pi r^2; and  sum_q n JxW = 0 (closed curve)."""
    m, sp = _cyl_space()
    fd = sp.face_data(4)
    x_rel = fd.qp_phys - np.array([0.2, 0.2])
    xdotn = np.einsum("fqd,fqd->fq", x_rel, fd.normals)
    np.testing.assert_allclose((xdotn * fd.jxw).sum(), -2 * np.pi * R * R,
                               rtol=1e-4)
    closed = np.einsum("fqd,fq->d", fd.normals, fd.jxw)
    np.testing.assert_allclose(closed, 0.0, atol=1e-10)
    # per-point normals are unit and radial (pointing at the center)
    nrm = np.linalg.norm(fd.normals, axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-12)
    rad = -x_rel / np.linalg.norm(x_rel, axis=-1, keepdims=True)
    # curved: normal == radial direction at every quad point (not just
    # face-average, which is all the straight facets could do)
    np.testing.assert_allclose(fd.normals, rad, atol=1e-4)


def test_identity_snap_reproduces_affine():
    """Snapping with the identity projector moves nothing: the quadratic-
    map quadrature path must reproduce the affine element matrices and the
    affine face tables to rounding — validates every curved contraction."""
    m = channel_with_cylinder_2d(h=0.04, h_near=0.04 / 3)
    sp_ref = TaylorHoodSpace(m)
    c_ref = cell_arrays_numpy(sp_ref)
    fd_ref = sp_ref.face_data(4)

    m2 = channel_with_cylinder_2d(h=0.04, h_near=0.04 / 3)
    sp = TaylorHoodSpace(m2)
    sp.snap_boundaries({4: lambda p: p})
    cd = sp.curved_data()
    assert len(cd.ids) > 0
    c = cell_arrays_numpy(sp)
    np.testing.assert_allclose(c.mass, c_ref.mass, rtol=0, atol=1e-13)
    np.testing.assert_allclose(c.stiff, c_ref.stiff, rtol=0, atol=1e-10)
    np.testing.assert_allclose(c.grad, c_ref.grad, rtol=0, atol=1e-12)
    # per-point geometry factors equal the affine ones on every curved cell
    detj, jinv = geometric_factors(sp)
    np.testing.assert_allclose(
        cd.detj_q, np.broadcast_to(detj[cd.ids][:, None], cd.detj_q.shape),
        rtol=1e-12)
    np.testing.assert_allclose(
        cd.jinv_q, np.broadcast_to(jinv[cd.ids][:, None], cd.jinv_q.shape),
        rtol=0, atol=1e-8)
    # face tables: normals/jxw/qp_phys match the straight facet path
    fd = sp.face_data(4)
    np.testing.assert_allclose(fd.normals, fd_ref.normals, atol=1e-12)
    np.testing.assert_allclose(fd.jxw, fd_ref.jxw, atol=1e-14)
    np.testing.assert_allclose(fd.qp_phys, fd_ref.qp_phys, atol=1e-13)
    assert fd.jinv_q is not None


def test_identity_snap_convection_matches_affine():
    import jax.numpy as jnp

    from navierstokes_tpu.ops.assembly import build_cell_arrays
    from navierstokes_tpu.ops.operators import convection_matrices

    m = channel_with_cylinder_2d(h=0.05, h_near=0.05 / 3)
    sp_ref = TaylorHoodSpace(m)
    cells_ref = build_cell_arrays(sp_ref, dtype=jnp.float64)

    m2 = channel_with_cylinder_2d(h=0.05, h_near=0.05 / 3)
    sp = TaylorHoodSpace(m2)
    sp.snap_boundaries({4: lambda p: p})
    cells = build_cell_arrays(sp, dtype=jnp.float64)
    assert cells.curv_ids is not None

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((sp.n_p2, 2)))
    t_hat = jnp.asarray(sp.rs.T_hat)
    c0 = convection_matrices(cells_ref, t_hat, u)
    c1 = convection_matrices(cells, t_hat, u)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=0, atol=1e-11)


def test_snap_3d_cylinder():
    m = duct_with_cylinder_3d(h=0.08)
    sp = TaylorHoodSpace(m)
    assert sp.snap_boundaries(m.snap_projectors) == [4]
    nodes = sp._snapped_nodes
    d = np.hypot(sp.p2_coords[nodes, 0] - 0.45, sp.p2_coords[nodes, 1] - 0.2)
    np.testing.assert_allclose(d, R, atol=1e-14)
    cd = sp.curved_data()
    assert (cd.detj_q > 0).all()
    # lateral cylinder area: sum JxW over tag 4 = 2 pi r * height
    fd = sp.face_data(4)
    np.testing.assert_allclose(fd.jxw.sum(), 2 * np.pi * R * 0.41, rtol=2e-4)
    # element matrices stay symmetric / consistent on curved cells
    c = cell_arrays_numpy(sp)
    np.testing.assert_allclose(c.mass, np.swapaxes(c.mass, 1, 2), atol=1e-14)
    np.testing.assert_allclose(c.stiff, np.swapaxes(c.stiff, 1, 2),
                               atol=1e-12)
    # row sums of stiffness vanish (constants in the kernel) on curved cells
    np.testing.assert_allclose(c.stiff[cd.ids].sum(axis=2), 0.0, atol=1e-10)
    np.testing.assert_allclose(c.grad[cd.ids].sum(axis=3)
                               + 0.0, -np.einsum(
                                   "kq,kqad->kad",
                                   cd.qw[None] * cd.detj_q,
                                   np.einsum("qax,kqxd->kqad", cd.dphi_v,
                                             cd.jinv_q)), atol=1e-12)


def test_curved_solve_smoke():
    """A short curved-vs-polygonal NS solve on the cylinder: both run, both
    produce close coefficients (the curved correction is a small geometric
    perturbation at this h)."""
    import jax.numpy as jnp

    from navierstokes_tpu.config import InletConfig, SolverConfig
    from navierstokes_tpu.models.navier_stokes import NavierStokes

    def run(curved):
        mesh = channel_with_cylinder_2d(h=0.05, h_near=0.05 / 3)
        cfg = SolverConfig(dtype="float64", nu=1e-3, ref_length=0.1,
                           force_formula="st", curved_boundary=curved)
        ns = NavierStokes(mesh, deltat=0.02, T=0.06, step=0,
                          inlet=InletConfig(kind="parabolic", u_m=0.3,
                                            height=0.41),
                          config=cfg)
        ns.setup()
        for _ in range(3):
            ns.solve_time_step()
        return ns.cd, ns.cl

    cd1, cl1 = run(True)
    cd0, cl0 = run(False)
    assert np.isfinite([cd0, cd1, cl0, cl1]).all()
    assert abs(cd1 - cd0) < 0.05 * abs(cd0)
