"""Localize the blocked-mass NaN at the bench point.

Steps the 1M-DoF bench configuration with mass_format=blocked, printing
per-step norms; on the first non-finite state, recomputes the step's
pieces eagerly to isolate the offending operation.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from navierstokes_tpu.config import InletConfig, SolverConfig
from navierstokes_tpu.mesh.geometry import Mesh
from navierstokes_tpu.models.navier_stokes import NavierStokes

z = np.load("/root/repo/.bench_mesh.npz")
mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])
inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41)
cfg = SolverConfig(dtype="float32", output_dir="/tmp/d_out",
                   cache_dir="/tmp/d_cache", csv_path="/tmp/d.csv",
                   scheme="projection", proj_bdf2=False,
                   outer_maxiter=128, bsr_f_kmax=0,
                   mass_format=os.environ.get("MASS", "blocked"))
ns = NavierStokes(mesh, 2, 1, deltat=0.02, T=1.0, step=10, inlet=inlet,
                  config=cfg)
ns.set_re_number(100)
print("setup ...", flush=True)
ns.setup()
ns._init_state(0)
params = ns._params()
run = ns._chunk_fn(1)

u, p, up, phi, t = (ns._u, ns._p, ns._u_prev, ns._phi,
                    jnp.asarray(0.0, ns.dtype))
states = [(u, p, up, phi, t)]
for k in range(8):
    u, p, up, phi, t, ms = run(params, u, p, up, phi, t)
    stats = jax.jit(lambda u, p: (jnp.abs(u).max(), jnp.abs(p).max(),
                                  jnp.isfinite(u).all(),
                                  jnp.isfinite(p).all()))(u, p)
    print(f"step {k+1}: its={int(ms.iterations[0])} "
          f"res={float(ms.residual[0]):.2e} |u|max={float(stats[0]):.4g} "
          f"|p|max={float(stats[1]):.4g} finite={bool(stats[2])}/"
          f"{bool(stats[3])}", flush=True)
    states.append((u, p, up, phi, t))
    if not (bool(stats[2]) and bool(stats[3])):
        break

# bisect inside the first bad step
bad = len(states) - 1          # step index (1-based state list)
u0, p0, up0, phi0, t0 = states[bad - 1]
print(f"\nbisecting step {bad} (t={float(t0):.3f}) ...", flush=True)

cfgm = ns.config
ops = ns._ops
bc = params.bc
mask = bc.mask
dt = cfgm.deltat


@jax.jit
def pieces(u, p, up, t_prev):
    conv = ops.convection(params, u)
    f_cell = params.a0_cell + conv
    d = ops.f_diag(params, f_cell)
    mflat = mask[:, 0]
    sigma = jnp.sum(d * mflat) / jnp.maximum(jnp.sum(mflat), 1.0)
    u_t = u / dt
    m_u = ops.mass_apply(params, u_t)
    zero_p = jnp.zeros(ns.space.n_p1, ns.dtype)
    bt_p, _ = ops.apply_blocks(params, f_cell, jnp.zeros_like(u), p,
                               with_f=False, with_gt=False)
    factor = ns._time_factor(t_prev + dt).astype(ns.dtype)
    g = bc.lift(factor)
    fg, _ = ops.apply_blocks(params, f_cell, g, zero_p,
                             with_g=False, with_gt=False)
    b_u = (m_u + params.rhs_neumann - bt_p - fg) * mask + sigma * g
    return dict(conv_max=jnp.abs(conv).max(), fd_max=jnp.abs(d).max(),
                sigma=sigma, mu_max=jnp.abs(m_u).max(),
                mu_fin=jnp.isfinite(m_u).all(),
                btp_max=jnp.abs(bt_p).max(), fg_max=jnp.abs(fg).max(),
                bu_max=jnp.abs(b_u).max(), bu_fin=jnp.isfinite(b_u).all(),
                conv_fin=jnp.isfinite(conv).all())


out = pieces(u0, p0, up0, t0)
for k, v in out.items():
    print(f"  {k} = {float(v) if v.dtype != jnp.bool_ else bool(v)}",
          flush=True)
