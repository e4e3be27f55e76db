"""Manufactured-solution convergence of the Taylor-Hood discretization.

Verifies the P2/P1 pair achieves its theoretical L2 orders on the steady
Stokes problem: O(h^3) velocity, O(h^2) pressure — validation the
reference never automates (SURVEY.md par.4)."""

import numpy as np
import pytest

from navierstokes_tpu.fem.interpolation import (l2_error_pressure,
                                                l2_error_velocity)
from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh import rectangle_2d
from navierstokes_tpu.models.stokes import StokesSolver
from navierstokes_tpu.ops.assembly import forcing_rhs

NU = 1.0


def u_exact(x):
    out = np.empty_like(x)
    out[:, 0] = np.sin(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])
    out[:, 1] = -np.cos(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    return out


def p_exact(x):
    return np.cos(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])


def forcing(x, t=0.0):
    # f = -nu lap(u) + grad(p) = 2 nu pi^2 u + grad(p)
    f = 2.0 * NU * np.pi ** 2 * u_exact(x)
    f[:, 0] += -np.pi * np.sin(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])
    f[:, 1] += -np.pi * np.cos(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    return f


def _solve_on(n):
    from navierstokes_tpu.config import SolverConfig

    mesh = rectangle_2d(1.0, 1.0, n, n)
    space = TaylorHoodSpace(mesh)
    solver = StokesSolver(mesh, nu=NU, config=SolverConfig(dtype="float64"))
    # all-boundary Dirichlet with the exact velocity
    all_nodes = np.unique(np.concatenate(
        [space.p2_nodes_on_tag(t) for t in (0, 1, 2, 3)]))
    vals = u_exact(space.p2_coords[all_nodes])
    rhs = forcing_rhs(space, forcing)
    u, p, res = solver.solve(all_nodes, vals, rhs_u=rhs, tol=1e-11,
                             maxiter=600)
    assert bool(res.converged), f"Stokes solve failed at n={n}"
    eu = l2_error_velocity(space, u, u_exact)
    ep = l2_error_pressure(space, p, p_exact)
    return eu, ep


def test_stokes_convergence_orders():
    errs = [_solve_on(n) for n in (4, 8, 16)]
    eu = [e[0] for e in errs]
    ep = [e[1] for e in errs]
    rate_u1 = np.log2(eu[0] / eu[1])
    rate_u2 = np.log2(eu[1] / eu[2])
    rate_p1 = np.log2(ep[0] / ep[1])
    rate_p2 = np.log2(ep[1] / ep[2])
    # P2 velocity: order 3; P1 pressure: order 2 (allow slack on coarse)
    assert rate_u1 > 2.5 and rate_u2 > 2.5, (eu, rate_u1, rate_u2)
    assert rate_p1 > 1.5 and rate_p2 > 1.5, (ep, rate_p1, rate_p2)
