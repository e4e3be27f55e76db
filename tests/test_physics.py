"""Physics invariance and accuracy tests.

Poiseuille flow is an EXACT discrete steady state of the Taylor-Hood
discretization (parabolic velocity lies in P2, linear pressure in P1, and
the convection term vanishes identically), so a time step started from it
must return it to solver tolerance — a sharp end-to-end check of assembly,
BCs, Neumann outflow and the solver acting together."""

import numpy as np
import pytest

from navierstokes_tpu.config import InletConfig, SolverConfig
from navierstokes_tpu.mesh import rectangle_2d
from navierstokes_tpu.models.navier_stokes import NavierStokes


@pytest.mark.parametrize("precond", ["cc", "asimple"])
def test_poiseuille_invariance(tmp_path, precond):
    import jax.numpy as jnp

    lx, ly, um, nu = 2.0, 1.0, 1.5, 0.05
    mesh = rectangle_2d(lx, ly, 12, 6)
    inlet = InletConfig(kind="parabolic", u_m=um, height=ly)
    cfg = SolverConfig(dtype="float64", nu=nu, preconditioner=precond,
                       output_dir=str(tmp_path / "o"),
                       cache_dir=str(tmp_path / "c"),
                       csv_path=str(tmp_path / "f.csv"))
    ns = NavierStokes(mesh, 2, 1, deltat=0.1, T=0.3, step=3, inlet=inlet,
                      config=cfg)
    ns.setup()
    ns._init_state(0)

    # exact steady state: u = (4 um y (ly-y)/ly^2, 0),
    # p = 8 nu um (lx - x) / ly^2   (dp/dx = -8 nu um / ly^2; p(outlet)=0)
    y = ns.space.p2_coords[:, 1]
    x = ns.space.p2_coords[:, 0]
    u_ex = np.zeros((ns.space.n_p2, 2))
    u_ex[:, 0] = 4 * um * y * (ly - y) / ly ** 2
    xp1 = ns.mesh.points[:, 0]
    p_ex = 8 * nu * um * (lx - xp1) / ly ** 2

    ns._u = jnp.asarray(u_ex)
    ns._u_prev = jnp.asarray(u_ex.copy())
    ns._p = jnp.asarray(p_ex)

    m = ns.solve_time_step()
    u_new = np.asarray(ns._u)
    p_new = np.asarray(ns._p)
    # must remain at the exact steady state (up to outer tolerance)
    err_u = np.abs(u_new - u_ex).max() / np.abs(u_ex).max()
    err_p = np.abs(p_new - p_ex).max() / np.abs(p_ex).max()
    assert err_u < 1e-6, err_u
    assert err_p < 1e-5, err_p
    assert int(m.iterations) <= 5  # starts at the solution


def test_wall_shear_force_formulas():
    """On an exactly-interpolated Poiseuille field, the ST viscous term
    t.grad(u).n on the bottom wall integrates to the analytic wall shear
    nu * 4 um / ly * lx, while the reference's n.grad(u).t term vanishes."""
    import jax.numpy as jnp

    from navierstokes_tpu.fem.spaces import TaylorHoodSpace
    from navierstokes_tpu.ops.assembly import build_face_arrays
    from navierstokes_tpu.ops.forces import drag_lift

    lx, ly, um, nu = 2.0, 1.0, 1.5, 0.05
    mesh = rectangle_2d(lx, ly, 8, 4)
    sp = TaylorHoodSpace(mesh)
    y = sp.p2_coords[:, 1]
    u = np.zeros((sp.n_p2, 2))
    u[:, 0] = 4 * um * y * (ly - y) / ly ** 2
    p = np.zeros(sp.n_p1)

    faces = build_face_arrays(sp, 0, dtype=jnp.float64)  # bottom wall
    drag_st, _ = drag_lift(faces, jnp.asarray(u), jnp.asarray(p), nu,
                           formula="st")
    drag_ref, _ = drag_lift(faces, jnp.asarray(u), jnp.asarray(p), nu,
                            formula="reference")
    # our normal points out of the fluid; the -drag in the Cd step restores
    # the physical sign, so the raw integral is -(shear force)
    shear = nu * 4 * um / ly * lx
    np.testing.assert_allclose(float(drag_st), -shear, rtol=1e-12)
    np.testing.assert_allclose(float(drag_ref), 0.0, atol=1e-12)


def test_poiseuille_from_rest(tmp_path):
    """Transient develops toward the exact profile."""
    lx, ly, um, nu = 2.0, 1.0, 1.0, 0.2
    mesh = rectangle_2d(lx, ly, 10, 6)
    inlet = InletConfig(kind="parabolic", u_m=um, height=ly)
    cfg = SolverConfig(dtype="float64", nu=nu,
                       output_dir=str(tmp_path / "o"),
                       cache_dir=str(tmp_path / "c"),
                       csv_path=str(tmp_path / "f.csv"))
    ns = NavierStokes(mesh, 2, 1, deltat=0.25, T=5.0, step=20, inlet=inlet,
                      config=cfg)
    ns.setup()
    ns.solve()
    y = ns.space.p2_coords[:, 1]
    u_ex = 4 * um * y * (ly - y) / ly ** 2
    err = np.abs(np.asarray(ns._u)[:, 0] - u_ex).max()
    assert err < 1e-4 * um, err

def test_vector_valued_inlet_profile(tmp_path):
    """The inlet hook accepts full dim-vector profiles (reference
    InletVelocity::vector_value, src/NavierStokes.hpp:77-122): boundary
    values carry both components and a step preserves them exactly."""
    import jax.numpy as jnp

    lx, ly = 2.0, 1.0
    mesh = rectangle_2d(lx, ly, 10, 5)

    def profile(pts, t):
        y = pts[:, 1]
        out = np.zeros((len(pts), 2))
        out[:, 0] = 4 * 1.5 * y * (ly - y) / ly ** 2
        out[:, 1] = 0.2 * np.sin(np.pi * y / ly)      # transverse component
        return out

    inlet = InletConfig(kind="custom", profile_fn=profile,
                        mean_override=1.0, height=ly)
    cfg = SolverConfig(dtype="float64", nu=0.05,
                       output_dir=str(tmp_path / "o"),
                       cache_dir=str(tmp_path / "c"),
                       csv_path=str(tmp_path / "f.csv"))
    ns = NavierStokes(mesh, 2, 1, deltat=0.05, T=0.1, step=2, inlet=inlet,
                      config=cfg)
    ns.setup()
    ns._init_state(0)

    # base_values carry the y-component on inlet nodes
    inlet_nodes = ns.space.p2_nodes_on_tag(3)
    bv = np.asarray(ns.bc.base_values)
    pts = ns.space.p2_coords[inlet_nodes]
    expect = profile(pts, 0.0)
    np.testing.assert_allclose(bv[inlet_nodes], expect, atol=1e-12)

    ns.solve_time_step()
    u = np.asarray(ns._u)
    # interior inlet nodes hold the full vector value after the step
    # (corner nodes are overridden by the wall precedence, cpp:303-318)
    interior = inlet_nodes[(pts[:, 1] > 1e-9) & (pts[:, 1] < ly - 1e-9)]
    np.testing.assert_allclose(u[interior],
                               profile(ns.space.p2_coords[interior], 0.0),
                               atol=1e-12)


def test_inlet_ramp_time_factor():
    """Raised-cosine start-up ramp: 0 at t=0, 1 from t=ramp on, C1, and
    composes with the pulsation factor."""
    import math

    inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41, ramp=0.2)
    assert inlet.time_factor(0.0) == 0.0
    assert abs(inlet.time_factor(0.1) - 0.5) < 1e-12
    assert inlet.time_factor(0.2) == 1.0
    assert inlet.time_factor(5.0) == 1.0
    # monotone on the ramp
    ts = np.linspace(0, 0.2, 21)
    fs = [inlet.time_factor(t) for t in ts]
    assert all(b >= a for a, b in zip(fs, fs[1:]))

    puls = InletConfig(kind="parabolic", u_m=1.5, height=0.41,
                       pulsating=True, period=8.0, ramp=0.2)
    t = 0.1
    assert abs(puls.time_factor(t)
               - math.sin(math.pi * t / 8.0) * 0.5) < 1e-12


def test_richardson_extrapolation():
    """richardson() recovers the limit and order of a synthetic
    first-order sequence f_k = 1 - 0.1 * 2^-k exactly."""
    from navierstokes_tpu.utils.analysis import richardson
    vals = [1 - 0.1 * 2.0 ** -k for k in range(4)]
    f_inf, r = richardson(vals)
    assert abs(f_inf - 1.0) < 1e-12
    assert abs(r - 0.5) < 1e-12
    f_inf, r, p = richardson(vals, ratios=[2.0, 2.0, 2.0])
    assert abs(p - 1.0) < 1e-12
    # non-geometric (non-monotone) sequences refuse to extrapolate
    import math
    f_inf, r = richardson([1.0, 1.2, 1.1])
    assert math.isnan(f_inf)
