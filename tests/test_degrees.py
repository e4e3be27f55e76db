"""Arbitrary Taylor-Hood degree pairs (reference ctor generality,
src/NavierStokes.hpp:173-178 — deal.II FE_SimplexP accepts any degree,
though every shipped driver uses 2/1).

Covers: the generalized lattice Lagrange basis (fem/reference_elements),
the entity-major global numbering (fem/spaces._lagrange_numbering), and
end-to-end P3/P2 Stokes convergence at the theoretical orders O(h^4)
velocity / O(h^3) pressure — one order above the production P2/P1 pair.
"""

import numpy as np
import pytest

from navierstokes_tpu.fem.interpolation import (l2_error_pressure,
                                                l2_error_velocity)
from navierstokes_tpu.fem.reference_elements import (lattice_multi_indices,
                                                     n_basis,
                                                     node_ref_coords,
                                                     shape_grads,
                                                     shape_values)
from navierstokes_tpu.fem.spaces import TaylorHoodSpace, _lagrange_numbering
from navierstokes_tpu.mesh import rectangle_2d
from navierstokes_tpu.mesh.generators import box_3d


def test_lattice_basis_properties():
    """Nodal property, partition of unity, and FD-checked gradients for
    every supported (dim, degree)."""
    rng = np.random.default_rng(0)
    for dim in (2, 3):
        for k in (1, 2, 3) + ((4,) if dim == 2 else ()):
            nodes = node_ref_coords(dim, k)
            nb = n_basis(dim, k)
            assert nodes.shape == (nb, dim)
            assert np.allclose(shape_values(dim, k, nodes), np.eye(nb),
                               atol=1e-12)
            pts = rng.random((16, dim)) * 0.3
            V = shape_values(dim, k, pts)
            G = shape_grads(dim, k, pts)
            assert np.allclose(V.sum(1), 1.0, atol=1e-12)
            assert np.allclose(G.sum(1), 0.0, atol=1e-11)
            eps = 1e-6
            for d in range(dim):
                pp, pm = pts.copy(), pts.copy()
                pp[:, d] += eps
                pm[:, d] -= eps
                fd = (shape_values(dim, k, pp)
                      - shape_values(dim, k, pm)) / (2 * eps)
                assert np.allclose(fd, G[:, :, d], atol=1e-6)


def test_generic_numbering_matches_p2_fast_path():
    """The generic degree-k numbering at k=2 reproduces the production P2
    layout exactly (vertices then unique edges)."""
    mesh = rectangle_2d(1.0, 0.5, 6, 4)
    sp = TaylorHoodSpace(mesh, 2, 1, rcm=False)
    n_nodes, cell_nodes, coords, enb, _, _ = _lagrange_numbering(
        mesh, 2, mesh.cells.astype(np.int64),
        _cell_edges_of(sp), sp._edge_verts)
    assert n_nodes == sp.n_p2
    assert np.array_equal(cell_nodes, np.asarray(sp.cell_p2))
    assert np.allclose(coords, sp.p2_coords)


def _cell_edges_of(sp):
    # recover cell -> edge ids from the P2 fast path (edge node - n_points)
    return (np.asarray(sp.cell_p2)[:, sp.dim + 1:].astype(np.int64)
            - sp.mesh.n_points)


@pytest.mark.parametrize("dim,k", [(2, 3), (2, 4), (3, 3)])
def test_interpolation_continuity(dim, k):
    """A degree-k polynomial interpolated at the global lattice nodes is
    reproduced exactly inside every cell — this fails if shared-entity
    node numbering (edge orientation, face identity) were inconsistent
    between neighboring cells."""
    if dim == 2:
        mesh = rectangle_2d(1.0, 0.7, 4, 3)
    else:
        mesh = box_3d(1.0, 0.7, 0.5, n=3)
    sp = TaylorHoodSpace(mesh, k, k - 1)

    def f(x):  # full degree-k polynomial content along each axis
        out = x[:, 0] ** k + 0.5 * x[:, 1] ** (k - 1) * x[:, 0]
        if dim == 3:
            out = out + 0.25 * x[:, 2] ** k
        return out

    vals = f(sp.p2_coords)
    rng = np.random.default_rng(1)
    pts = rng.random((6, dim)) * (0.9 / dim)
    V = shape_values(dim, k, pts)
    verts = mesh.points[mesh.cells]
    J = np.swapaxes(verts[:, 1:, :] - verts[:, :1, :], 1, 2)
    phys = verts[:, 0, None, :] + np.einsum("cdx,qx->cqd", J, pts)
    interp = np.einsum("qa,ca->cq", V, vals[sp.cell_p2.astype(np.int64)])
    exact = f(phys.reshape(-1, dim)).reshape(interp.shape)
    assert np.allclose(interp, exact, atol=1e-10), \
        np.abs(interp - exact).max()


NU = 1.0


def _u_exact(x):
    out = np.empty_like(x)
    out[:, 0] = np.sin(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])
    out[:, 1] = -np.cos(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    return out


def _p_exact(x):
    return np.cos(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])


def _forcing(x, t=0.0):
    f = 2.0 * NU * np.pi ** 2 * _u_exact(x)
    f[:, 0] += -np.pi * np.sin(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])
    f[:, 1] += -np.pi * np.cos(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    return f


def test_stokes_p3p2_convergence_orders():
    """Manufactured Stokes with the P3/P2 pair: O(h^4) velocity and
    O(h^3) pressure L2 convergence — one order above the production
    P2/P1 results in test_convergence.py, demonstrating the degree
    generality is real (not just constructible)."""
    from navierstokes_tpu.config import SolverConfig
    from navierstokes_tpu.models.stokes import StokesSolver
    from navierstokes_tpu.ops.assembly import forcing_rhs

    def solve_on(n):
        mesh = rectangle_2d(1.0, 1.0, n, n)
        solver = StokesSolver(mesh, nu=NU,
                              config=SolverConfig(dtype="float64"),
                              degree_velocity=3, degree_pressure=2)
        space = solver.space
        all_nodes = np.unique(np.concatenate(
            [space.p2_nodes_on_tag(t) for t in (0, 1, 2, 3)]))
        vals = _u_exact(space.p2_coords[all_nodes])
        rhs = forcing_rhs(space, _forcing)
        u, p, res = solver.solve(all_nodes, vals, rhs_u=rhs, tol=1e-12,
                                 maxiter=800)
        assert bool(res.converged), f"P3/P2 Stokes solve failed at n={n}"
        return (l2_error_velocity(space, u, _u_exact),
                l2_error_pressure(space, p, _p_exact))

    errs = [solve_on(n) for n in (4, 8)]
    rate_u = np.log2(errs[0][0] / errs[1][0])
    rate_p = np.log2(errs[0][1] / errs[1][1])
    assert rate_u > 3.5, (errs, rate_u)
    assert rate_p > 2.5, (errs, rate_p)
