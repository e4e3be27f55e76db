"""Cross-validation of the batched matrix-free operators against an
independent dense quadrature-loop assembly (the algorithm the reference's
FEValues loop implements, src/NavierStokes.cpp:164-285, re-derived here in
plain numpy as a test oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.fem.reference_elements import shape_grads, shape_values
from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh import box_3d, rectangle_2d
from navierstokes_tpu.ops.assembly import build_cell_arrays
from navierstokes_tpu.ops.operators import (build_scatter,
                                            convection_matrices, apply_blocks,
                                            f_diag, lumped_mass, mass_apply)
from navierstokes_tpu.fem.quadrature import gauss_simplex


def dense_assemble(space, nu, dt, u_old):
    """Dense monolithic matrix + mass-rhs via straight quadrature loops."""
    mesh = space.mesh
    dim = mesh.dim
    qp, qw = gauss_simplex(dim, 3)
    phi = shape_values(dim, 2, qp)       # (nq, nv)
    dphi = shape_grads(dim, 2, qp)       # (nq, nv, dim)
    psi = shape_values(dim, 1, qp)       # (nq, np)
    nv, npp = phi.shape[1], psi.shape[1]

    nu_dofs = space.n_p2 * dim
    n = nu_dofs + space.n_p1
    A = np.zeros((n, n))
    rhs_u = np.zeros(nu_dofs)

    def udof(node, c):
        return node * dim + c

    for c_id in range(mesh.n_cells):
        vids = space.cell_p2[c_id]
        pids = space.cell_p1[c_id]
        verts = mesh.points[mesh.cells[c_id]]
        J = (verts[1:] - verts[0]).T
        detj = np.linalg.det(J)
        jinv = np.linalg.inv(J)
        gphi = np.einsum("qax,xd->qad", dphi, jinv)   # physical grads

        u_loc = u_old[vids]                           # (nv, dim)
        for q in range(len(qw)):
            w = qw[q] * detj
            uq = phi[q] @ u_loc                       # (dim,)
            for a in range(nv):
                for b in range(nv):
                    m = phi[q, a] * phi[q, b] * w
                    k = nu * (gphi[q, a] @ gphi[q, b]) * w
                    conv = phi[q, a] * (uq @ gphi[q, b]) * w
                    for d in range(dim):
                        A[udof(vids[a], d), udof(vids[b], d)] += \
                            m / dt + k + conv
                # pressure coupling
                for j in range(npp):
                    for d in range(dim):
                        val = gphi[q, a, d] * psi[q, j] * w
                        A[udof(vids[a], d), nu_dofs + pids[j]] -= val
                        A[nu_dofs + pids[j], udof(vids[a], d)] -= val
                # rhs: (u_old . v)/dt
                for d in range(dim):
                    rhs_u[udof(vids[a], d)] += phi[q, a] * uq[d] * w / dt
    return A, rhs_u


@pytest.mark.parametrize("dim", [2, 3])
def test_matrix_free_vs_dense(dim):
    mesh = rectangle_2d(1.0, 0.8, 3, 2) if dim == 2 else box_3d(n=2)
    space = TaylorHoodSpace(mesh)
    rng = np.random.default_rng(42)
    nu, dt = 0.7, 0.05
    u_old = rng.standard_normal((space.n_p2, dim))

    A, rhs_u = dense_assemble(space, nu, dt, u_old)

    cells = build_cell_arrays(space, dtype=jnp.float64)
    scat_v = build_scatter(space.cell_p2, space.n_p2)
    scat_p = build_scatter(space.cell_p1, space.n_p1)

    conv = convection_matrices(cells, jnp.asarray(space.rs.T_hat),
                               jnp.asarray(u_old))
    f_cell = cells.mass / dt + nu * cells.stiff + conv

    xu = rng.standard_normal((space.n_p2, dim))
    xp = rng.standard_normal(space.n_p1)
    yu, yp = apply_blocks(cells, f_cell, scat_v, scat_p,
                          jnp.asarray(xu), jnp.asarray(xp))

    x_flat = np.concatenate([xu.reshape(-1), xp])
    y_dense = A @ x_flat
    np.testing.assert_allclose(np.asarray(yu).reshape(-1),
                               y_dense[:space.n_p2 * dim], rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(yp), y_dense[space.n_p2 * dim:],
                               rtol=1e-10, atol=1e-12)

    # diagonal of F
    scat_vd = build_scatter(space.cell_p2, space.n_p2)
    dF = f_diag(cells, f_cell, scat_vd)
    diag_dense = np.diag(A)[:space.n_p2 * dim].reshape(-1, dim)
    np.testing.assert_allclose(np.asarray(dF), diag_dense[:, 0], rtol=1e-10)
    # all components share the diagonal
    np.testing.assert_allclose(
        diag_dense, np.broadcast_to(diag_dense[:, :1], diag_dense.shape),
        rtol=1e-12)

    # mass rhs
    r = mass_apply(cells, scat_v, jnp.asarray(u_old)) / dt
    np.testing.assert_allclose(np.asarray(r).reshape(-1), rhs_u, rtol=1e-10,
                               atol=1e-12)


def test_lumped_mass_positive():
    mesh = rectangle_2d(1, 1, 4, 4)
    space = TaylorHoodSpace(mesh)
    cells = build_cell_arrays(space, dtype=jnp.float64)
    scat = build_scatter(space.cell_p2, space.n_p2)
    lm = lumped_mass(cells, jnp.asarray(space.rs.Mlump_hat), scat)
    assert (np.asarray(lm) > 0).all()
    # reference-style abs-lumping: row sums of |phi_a| sum_b |phi_b| exceed
    # the consistent mass row sums (which total the domain measure per comp)
    assert np.asarray(lm).sum() >= 1.0 - 1e-12
