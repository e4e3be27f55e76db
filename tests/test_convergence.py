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


def test_projection_bdf2_temporal_order():
    """Observed temporal order of the headline scheme (BDF2 rotational
    pressure-correction with extrapolated convection) against an ANALYTIC
    time-dependent solution, so the measured error is purely temporal:

        u(x, y, t) = g(t) * 4 U y (H - y) / H^2 * e_x,   p = 0,
        f = g'(t) U(y) e_x + 8 nu U g(t) / H^2 e_x

    (time-ramped Poiseuille; (u.grad)u = 0 exactly, the natural outflow
    condition is satisfied exactly, and the parabolic profile is in the P2
    space so the spatial error is zero to quadrature precision).  Halving
    dt must contract the final-time error at O(dt^2): observed order
    >= 1.8.  This automates the dt-scaling evidence in VALIDATION.md
    (Cl_max 1.118 -> 1.019 under dt halving).

    NOTE: dt-halving on the OPEN cylinder benchmark shows ~O(dt^1.5) in
    the velocity-difference norm — the known pressure boundary-layer
    error of incremental pressure-correction at open boundaries (the
    phi=0 outlet pin), not an integrator defect; this test isolates the
    integrator."""
    import jax.numpy as jnp

    from navierstokes_tpu.config import InletConfig, SolverConfig
    from navierstokes_tpu.models.navier_stokes import NavierStokes

    H, NU, UM, R, T = 0.41, 0.01, 1.0, 0.4, 0.4

    def g(t):
        return np.where(t >= R, 1.0, 0.5 - 0.5 * np.cos(np.pi * t / R))

    def u_profile(y):
        return 4.0 * UM * y * (H - y) / H ** 2

    def forcing(x, t):
        y = x[:, 1]
        gj = jnp.where(t >= R, 1.0, 0.5 - 0.5 * jnp.cos(jnp.pi * t / R))
        gpj = jnp.where(t >= R, 0.0,
                        0.5 * jnp.pi / R * jnp.sin(jnp.pi * t / R))
        fx = gpj * 4.0 * UM * y * (H - y) / H ** 2 \
            + 8.0 * NU * UM / H ** 2 * gj
        return jnp.stack([fx, jnp.zeros_like(fx)], axis=1)

    def final_error(dt):
        mesh = rectangle_2d(1.0, H, 8, 6)
        inlet = InletConfig(kind="parabolic", u_m=UM, height=H, ramp=R)
        cfg = SolverConfig(dtype="float64", nu=NU, ref_length=0.1,
                           scheme="projection", proj_bdf2=True,
                           proj_tol=1e-12, proj_f_maxiter=500,
                           proj_p_maxiter=400,
                           output_dir="/tmp/tconv/o",
                           cache_dir="/tmp/tconv/c",
                           csv_path="/tmp/tconv/f.csv")
        ns = NavierStokes(mesh, 2, 1, deltat=dt, T=T, step=0, inlet=inlet,
                          config=cfg, forcing=forcing)
        ns.setup()
        ns._init_state(0)
        for _ in range(int(round(T / dt))):
            ns.solve_time_step()
        sp = ns.space
        ue = np.zeros((sp.n_p2, 2))
        ue[:, 0] = g(T) * u_profile(sp.p2_coords[:, 1])
        return np.linalg.norm(np.asarray(ns._u) - ue)

    errs = [final_error(dt) for dt in (0.04, 0.02, 0.01)]
    r1 = np.log2(errs[0] / errs[1])
    r2 = np.log2(errs[1] / errs[2])
    assert r1 > 1.8 and r2 > 1.8, (errs, r1, r2)


def test_projection_open_boundary_pressure_extrapolation():
    """Open-boundary splitting error and the pressure-extrapolation trap.

    Manufactured solution on [0,1]x[0,H] with an OPEN outlet and a
    time-varying pressure G(t)(1-x) (exact in P1; u exact in P2; both
    convection and the outflow natural BC hold exactly, so all error is
    temporal).  The pressure increment has nonzero normal derivative at
    the inlet — exactly the dphi/dn=0 inconsistency that caps the
    incremental scheme near open boundaries.

    Pins the round-5 measured result (scripts/exp_pextrap.py, VALIDATION
    round 5): the plain incremental-rotational scheme CONVERGES (error
    contracts >= ~O(dt^2) over this range), while the formally
    second-order extrapolated pressure p* = 2p^n - p^{n-1}
    (proj_p_extrap=1) is DIVERGENT — the classical stability trap of
    pressure-correction methods [Guermond, Minev & Shen 2006 sec. 8] —
    so the knob stays default-off and the O(dt^1.5) open-boundary bound
    stands as a scheme property, not an implementation defect.
    Reference counterpart: the monolithic solver's implicit pressure
    coupling, src/NavierStokes.cpp:222-229, which has no such split."""
    import jax.numpy as jnp

    from navierstokes_tpu.config import InletConfig, SolverConfig
    from navierstokes_tpu.models.navier_stokes import NavierStokes

    H, NU, UM, R, T = 0.41, 0.01, 1.0, 0.2, 0.8
    OMEGA = np.pi / (2.0 * T)

    def g(t):
        return np.where(t >= R, 1.0, 0.5 - 0.5 * np.cos(np.pi * t / R))

    def forcing(x, t):
        y = x[:, 1]
        gj = jnp.where(t >= R, 1.0, 0.5 - 0.5 * jnp.cos(jnp.pi * t / R))
        gpj = jnp.where(t >= R, 0.0,
                        0.5 * jnp.pi / R * jnp.sin(jnp.pi * t / R))
        fx = (gpj * 4.0 * UM * y * (H - y) / H ** 2
              + 8.0 * NU * UM / H ** 2 * gj - jnp.sin(OMEGA * t))
        return jnp.stack([fx, jnp.zeros_like(fx)], axis=1)

    def final_error(dt, theta):
        mesh = rectangle_2d(1.0, H, 8, 6)
        inlet = InletConfig(kind="parabolic", u_m=UM, height=H, ramp=R)
        cfg = SolverConfig(dtype="float64", nu=NU, ref_length=0.1,
                           scheme="projection", proj_bdf2=True,
                           proj_p_extrap=theta, proj_tol=1e-12,
                           proj_f_maxiter=500, proj_p_maxiter=400,
                           output_dir="/tmp/pext/o", cache_dir="/tmp/pext/c",
                           csv_path="/tmp/pext/f.csv")
        ns = NavierStokes(mesh, 2, 1, deltat=dt, T=T, step=0, inlet=inlet,
                          config=cfg, forcing=forcing)
        ns.setup()
        ns._init_state(0)
        for _ in range(int(round(T / dt))):
            ns.solve_time_step()
        sp = ns.space
        ue = np.zeros((sp.n_p2, 2))
        ue[:, 0] = g(T) * 4.0 * UM * sp.p2_coords[:, 1] \
            * (H - sp.p2_coords[:, 1]) / H ** 2
        return (np.linalg.norm(np.asarray(ns._u) - ue)
                / np.linalg.norm(ue))

    # plain scheme: contracts at >= ~O(dt^2) over this dt range
    # (measured 3.37e-4 -> 1.89e-5 over one quartering of dt)
    e_plain = [final_error(dt, 0.0) for dt in (0.04, 0.01)]
    assert e_plain[1] < e_plain[0] / 10.0, e_plain
    assert e_plain[1] < 1e-4, e_plain
    # extrapolated pressure: measured divergent (8.1 at dt=0.01, and
    # growing under further refinement)
    e_extrap = final_error(0.01, 1.0)
    assert e_extrap > 10.0 * e_plain[1], (e_extrap, e_plain)
