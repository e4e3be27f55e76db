"""Reference-element tables for P1/P2 Lagrange elements on simplices.

Replaces deal.II's ``FE_SimplexP`` / ``FESystem`` machinery
(reference: src/NavierStokes.cpp:31-57, src/NavierStokes.hpp:45-49) with
explicit barycentric shape functions evaluated into small static numpy
tables.  Those tables are contracted against per-cell geometric factors in
the batched assembly kernels (ops/assembly.py) — the TPU-idiomatic
replacement for deal.II's per-cell FEValues loop.

Conventions (fixed once, globally — this canonical ordering is also what
makes checkpoints device-count independent for free, unlike the reference's
compute_ordered_dofs_indices machinery at src/NavierStokes.cpp:571-784):

2D triangle: vertices V0=(0,0), V1=(1,0), V2=(0,1);
  barycentric l0=1-x-y, l1=x, l2=y;
  edges EDGES_2D = [(0,1), (0,2), (1,2)]; P2 nodes = 3 vertices + 3 midpoints.
3D tetrahedron: V0..V3 = origin + unit axes;
  l0=1-x-y-z, l1=x, l2=y, l3=z;
  edges EDGES_3D = [(0,1),(0,2),(0,3),(1,2),(1,3),(2,3)];
  P2 nodes = 4 vertices + 6 midpoints.

Facets (boundary faces) are identified by *sorted* vertex tuples; geometric
orientation (outward normal) is fixed against the owning cell's centroid at
mesh-preprocessing time, so local facet orientation conventions never matter.
"""

from __future__ import annotations

import functools

import numpy as np

from navierstokes_tpu.fem.quadrature import gauss_simplex

EDGES_1D = ((0, 1),)
EDGES_2D = ((0, 1), (0, 2), (1, 2))
EDGES_3D = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))

# Facets as local vertex index tuples (orientation-free).
FACETS_2D = ((0, 1), (1, 2), (2, 0))
FACETS_3D = ((1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2))


def _bary(dim: int, pts: np.ndarray) -> np.ndarray:
    """Barycentric coordinates (n, dim+1) of reference-cell points (n, dim)."""
    pts = np.atleast_2d(pts)
    lam0 = 1.0 - pts.sum(axis=1)
    return np.concatenate([lam0[:, None], pts], axis=1)


def _grad_bary(dim: int) -> np.ndarray:
    """Constant gradients of barycentric coords: (dim+1, dim)."""
    g = np.zeros((dim + 1, dim))
    g[0, :] = -1.0
    g[1:, :] = np.eye(dim)
    return g


def edges_of(dim: int):
    if dim == 1:
        return EDGES_1D
    return EDGES_2D if dim == 2 else EDGES_3D


def facets_of(dim: int):
    return FACETS_2D if dim == 2 else FACETS_3D


def n_basis(dim: int, degree: int) -> int:
    if degree == 1:
        return dim + 1
    if degree == 2:
        return dim + 1 + len(edges_of(dim))
    raise ValueError(f"unsupported degree {degree}")


def shape_values(dim: int, degree: int, pts: np.ndarray) -> np.ndarray:
    """(n_pts, n_basis) Lagrange shape values at reference points."""
    lam = _bary(dim, pts)  # (n, dim+1)
    if degree == 1:
        return lam
    if degree == 2:
        vertex = lam * (2.0 * lam - 1.0)
        edge = np.stack([4.0 * lam[:, a] * lam[:, b] for a, b in edges_of(dim)],
                        axis=1)
        return np.concatenate([vertex, edge], axis=1)
    raise ValueError(f"unsupported degree {degree}")


def shape_grads(dim: int, degree: int, pts: np.ndarray) -> np.ndarray:
    """(n_pts, n_basis, dim) reference-space gradients at reference points."""
    lam = _bary(dim, pts)            # (n, dim+1)
    g = _grad_bary(dim)              # (dim+1, dim)
    if degree == 1:
        return np.broadcast_to(g, (lam.shape[0],) + g.shape).copy()
    if degree == 2:
        vertex = (4.0 * lam - 1.0)[:, :, None] * g[None, :, :]
        edge = np.stack(
            [4.0 * (lam[:, a, None] * g[None, b] + lam[:, b, None] * g[None, a])
             for a, b in edges_of(dim)],
            axis=1)
        return np.concatenate([vertex, edge], axis=1)
    raise ValueError(f"unsupported degree {degree}")


def p2_node_ref_coords(dim: int) -> np.ndarray:
    """Reference coordinates of the P2 nodes (vertices then edge midpoints)."""
    verts = np.concatenate([np.zeros((1, dim)), np.eye(dim)], axis=0)
    mids = np.stack([(verts[a] + verts[b]) / 2.0 for a, b in edges_of(dim)])
    return np.concatenate([verts, mids], axis=0)


class ReferenceSimplex:
    """Bundled quadrature + shape tables for the Taylor-Hood pair.

    ``n_points_1d`` defaults to velocity_degree + 1 = 3, matching deal.II
    ``QGaussSimplex(fe->degree + 1)`` (src/NavierStokes.cpp:50-56): exact for
    total degree 5, which covers the trilinear convection integrand
    (P2 * grad P2 * P2).
    """

    def __init__(self, dim: int, degree_velocity: int = 2,
                 degree_pressure: int = 1, n_points_1d: int | None = None):
        if degree_velocity != 2 or degree_pressure != 1:
            raise NotImplementedError(
                "Taylor-Hood P2/P1 is the supported pair (like every "
                "reference scenario, tests/*/src/*.cpp degree args 2/1)")
        self.dim = dim
        self.degree_velocity = degree_velocity
        self.degree_pressure = degree_pressure
        n1d = n_points_1d or (degree_velocity + 1)

        # Cell quadrature
        self.qp, self.qw = gauss_simplex(dim, n1d)        # (n_q, dim), (n_q,)
        self.n_q = self.qp.shape[0]
        self.phi_v = shape_values(dim, 2, self.qp)        # (n_q, n_v)
        self.dphi_v = shape_grads(dim, 2, self.qp)        # (n_q, n_v, dim)
        self.phi_p = shape_values(dim, 1, self.qp)        # (n_q, n_p)
        self.dphi_p = shape_grads(dim, 1, self.qp)
        self.n_v = self.phi_v.shape[1]                    # 6 (2D) / 10 (3D)
        self.n_p = self.phi_p.shape[1]                    # 3 (2D) / 4 (3D)

        # Facet quadrature on the (dim-1) reference simplex.
        self.fqp, self.fqw = gauss_simplex(dim - 1, n1d)  # (n_fq, dim-1)
        self.n_fq = self.fqp.shape[0]
        # Barycentric weights of facet quad points w.r.t. facet vertices.
        self.fq_bary = _bary(dim - 1, self.fqp)           # (n_fq, dim)

        self.edges = edges_of(dim)
        self.facets = facets_of(dim)
        self.p2_nodes = p2_node_ref_coords(dim)

        # Precomputed reference tensors for assembly (all tiny, float64):
        w = self.qw
        # mass:      M[a,b]        = sum_q w phi_a phi_b
        self.M_hat = np.einsum("q,qa,qb->ab", w, self.phi_v, self.phi_v)
        # stiffness: K[x,y,a,b]    = sum_q w d_x phi_a d_y phi_b
        self.K_hat = np.einsum("q,qax,qby->xyab", w, self.dphi_v, self.dphi_v)
        # pressure:  G[a,x,j]      = sum_q w d_x phi_a psi_j
        self.G_hat = np.einsum("q,qax,qj->axj", w, self.dphi_v, self.phi_p)
        # convection T[a,b,x,e]    = sum_q w phi_a d_x phi_b phi_e
        self.T_hat = np.einsum("q,qa,qbx,qe->abxe", w, self.phi_v,
                               self.dphi_v, self.phi_v)
        # pressure-space convection: Tp[i,j,x,e] = sum_q w psi_i d_x psi_j phi_e
        # (for the PCD preconditioner's pressure convection operator)
        self.Tp_hat = np.einsum("q,qi,qjx,qe->ijxe", w, self.phi_p,
                                self.dphi_p, self.phi_v)
        # lumped-mass accumulator with the reference's per-quad-point abs
        # (src/NavierStokes.cpp:232-236): L[a] = sum_q w |phi_a| sum_b |phi_b|
        self.Mlump_hat = np.einsum("q,qa,q->a", w, np.abs(self.phi_v),
                                   np.abs(self.phi_v).sum(axis=1))

        # Facet shape tables: values/grads of cell basis at facet quad points,
        # per local facet: (n_facets, n_fq, n_basis[, dim]).
        verts = np.concatenate([np.zeros((1, dim)), np.eye(dim)], axis=0)
        fv, fg, fp = [], [], []
        for facet in self.facets:
            fverts = verts[list(facet)]                   # (dim, dim)
            cell_pts = self.fq_bary @ fverts              # (n_fq, dim)
            fv.append(shape_values(dim, 2, cell_pts))
            fg.append(shape_grads(dim, 2, cell_pts))
            fp.append(shape_values(dim, 1, cell_pts))
        self.facet_phi_v = np.stack(fv)                   # (n_f, n_fq, n_v)
        self.facet_dphi_v = np.stack(fg)                  # (n_f, n_fq, n_v, dim)
        self.facet_phi_p = np.stack(fp)                   # (n_f, n_fq, n_p)


@functools.lru_cache(maxsize=None)
def reference_simplex(dim: int, n_points_1d: int = 3) -> ReferenceSimplex:
    return ReferenceSimplex(dim, n_points_1d=n_points_1d)
