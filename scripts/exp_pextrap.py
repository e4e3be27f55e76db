"""Open-boundary pressure splitting error: plain vs extrapolated pressure.

Manufactured solution on the channel [0,1]x[0,H] with an OPEN outlet:

    u(x, y, t) = g(t) * 4 U y (H - y) / H^2 * e_x
    p(x, y, t) = G(t) * (1 - x)

(u.grad)u = 0 exactly, div u = 0, the outflow natural BC
nu du/dn - p n = 0 holds exactly at x=1 (p(1)=0), and both u and p lie
in the P2/P1 spaces, so measured errors are purely temporal.  The
pressure increment p^{n+1}-p^n = dG*(1-x) has nonzero normal derivative
at the inlet, exercising exactly the dphi/dn=0 inconsistency of the
incremental scheme that VALIDATION.md flags as the O(dt^1.5)
open-boundary limit.  Forcing:

    f_x = g'(t) U(y) + 8 nu U g / H^2 - G(t)

Usage: python scripts/exp_pextrap.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from navierstokes_tpu.config import InletConfig, SolverConfig
from navierstokes_tpu.mesh import rectangle_2d
from navierstokes_tpu.models.navier_stokes import NavierStokes

H, NU, UM, R, T = 0.41, 0.01, 1.0, 0.2, 0.8
OMEGA = np.pi / (2.0 * T)


def g(t):
    return np.where(t >= R, 1.0, 0.5 - 0.5 * np.cos(np.pi * t / R))


def G(t):
    return np.sin(OMEGA * t)


def u_profile(y):
    return 4.0 * UM * y * (H - y) / H ** 2


def forcing(x, t):
    y = x[:, 1]
    gj = jnp.where(t >= R, 1.0, 0.5 - 0.5 * jnp.cos(jnp.pi * t / R))
    gpj = jnp.where(t >= R, 0.0, 0.5 * jnp.pi / R * jnp.sin(jnp.pi * t / R))
    fx = (gpj * 4.0 * UM * y * (H - y) / H ** 2
          + 8.0 * NU * UM / H ** 2 * gj - jnp.sin(OMEGA * t))
    return jnp.stack([fx, jnp.zeros_like(fx)], axis=1)


def final_error(dt, theta):
    mesh = rectangle_2d(1.0, H, 8, 6)
    inlet = InletConfig(kind="parabolic", u_m=UM, height=H, ramp=R)
    cfg = SolverConfig(dtype="float64", nu=NU, ref_length=0.1,
                       scheme="projection", proj_bdf2=True,
                       proj_p_extrap=theta,
                       proj_tol=1e-12, proj_f_maxiter=500,
                       proj_p_maxiter=400,
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
    ue[:, 0] = g(T) * u_profile(sp.p2_coords[:, 1])
    pe = G(T) * (1.0 - ns.mesh.points[:, 0])  # P1 DoFs = mesh vertices
    eu = np.linalg.norm(np.asarray(ns._u) - ue) / max(np.linalg.norm(ue),
                                                      1e-30)
    ep = np.linalg.norm(np.asarray(ns._p) - pe) / max(np.linalg.norm(pe),
                                                      1e-30)
    return eu, ep


dts = [0.04, 0.02, 0.01, 0.005]
for theta in (0.0, 0.5, 1.0):
    rows = [final_error(dt, theta) for dt in dts]
    print(f"proj_p_extrap theta={theta}:")
    for i, (dt, (eu, ep)) in enumerate(zip(dts, rows)):
        line = f"  dt={dt:<7} |u-ue|/|ue| = {eu:.3e}  |p-pe|/|pe| = {ep:.3e}"
        if i:
            ru = np.log2(rows[i - 1][0] / eu)
            rp = np.log2(rows[i - 1][1] / ep)
            line += f"  (order u {ru:.2f}, p {rp:.2f})"
        print(line, flush=True)
