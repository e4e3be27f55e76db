"""Field evaluation and error norms (host-side, for validation).

The reference has no error computation at all (SURVEY.md par.4); these are
the tools behind the manufactured-solution convergence tests that verify
the P2/P1 discretization achieves its theoretical orders (O(h^3) velocity,
O(h^2) pressure in L2)."""

from __future__ import annotations

import numpy as np

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.ops.assembly import geometric_factors


def _quad_geometry(space: TaylorHoodSpace):
    rs, mesh = space.rs, space.mesh
    detj, _ = geometric_factors(space)
    verts = mesh.points[mesh.cells]
    lam0 = 1.0 - rs.qp.sum(axis=1)
    bary = np.concatenate([lam0[:, None], rs.qp], axis=1)
    xq = np.einsum("qk,ckd->cqd", bary, verts)          # (nc, n_q, dim)
    return detj, xq


def l2_error_velocity(space: TaylorHoodSpace, u, exact_fn) -> float:
    """|| u_h - u ||_L2 with u_h the P2 field (n_p2, dim)."""
    rs = space.rs
    detj, xq = _quad_geometry(space)
    u_c = np.asarray(u)[np.asarray(space.cell_p2)]      # (nc, n_v, dim)
    uh_q = np.einsum("qa,cad->cqd", rs.phi_v, u_c)
    ue_q = exact_fn(xq.reshape(-1, space.dim)).reshape(uh_q.shape)
    err2 = np.einsum("q,cqd,c->", rs.qw,
                     (uh_q - ue_q) ** 2, detj)
    return float(np.sqrt(err2))


def l2_error_pressure(space: TaylorHoodSpace, p, exact_fn,
                      zero_mean: bool = True) -> float:
    """|| p_h - p ||_L2 with p_h the P1 field (n_p1,); both fields are
    mean-shifted when zero_mean (pressure is defined up to a constant for
    enclosed flows)."""
    rs = space.rs
    detj, xq = _quad_geometry(space)
    p_c = np.asarray(p)[np.asarray(space.cell_p1)]      # (nc, n_p)
    ph_q = np.einsum("qj,cj->cq", rs.phi_p, p_c)
    pe_q = exact_fn(xq.reshape(-1, space.dim)).reshape(ph_q.shape)
    if zero_mean:
        vol = float(np.einsum("q,c->", rs.qw, detj))
        ph_q = ph_q - np.einsum("q,cq,c->", rs.qw, ph_q, detj) / vol
        pe_q = pe_q - np.einsum("q,cq,c->", rs.qw, pe_q, detj) / vol
    err2 = np.einsum("q,cq,c->", rs.qw, (ph_q - pe_q) ** 2, detj)
    return float(np.sqrt(err2))
