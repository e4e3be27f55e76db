"""Knife-edge test of the 1M-DoF CFL~8 bench operating point.

Runs the bench configuration with mass_format=node (the healthy r3c
config) but perturbs the initial velocity by PERT (default 1e-6 rel).
If the trajectory still explodes like the blocked-mass runs did, the
NaN is chaotic amplification of an epsilon-level perturbation at the
impulsive start -- the blocked mass product (exact to 2e-12) is
exonerated and the fix is the operating point (ramped start), not the
mass kernel.

Env: PERT (float, 0 disables), MASS (node|blocked), RAMP (seconds),
STEPS (int, default 10).
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

PERT = float(os.environ.get("PERT", "1e-6"))
STEPS = int(os.environ.get("STEPS", "10"))

z = np.load("/root/repo/.bench_mesh.npz")
mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])
inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41,
                    ramp=float(os.environ.get("RAMP", "0")))
cfg = SolverConfig(dtype="float32", output_dir="/tmp/d_out",
                   cache_dir="/tmp/d_cache", csv_path="/tmp/d.csv",
                   scheme="projection", proj_bdf2=False,
                   outer_maxiter=128,
                   bsr_f_kmax=int(os.environ.get("KMAX", "0")),
                   mass_format=os.environ.get("MASS", "node"))
ns = NavierStokes(mesh, 2, 1, deltat=0.02, T=1.0, step=10, inlet=inlet,
                  config=cfg)
ns.set_re_number(100)
print(f"PERT={PERT} MASS={cfg.mass_format} RAMP={inlet.ramp}", flush=True)
print("setup ...", flush=True)
ns.setup()
ns._init_state(0)
params = ns._params()
run = ns._chunk_fn(1)

u, p, up, phi, t = (ns._u, ns._p, ns._u_prev, ns._phi,
                    jnp.asarray(0.0, ns.dtype))
if PERT:
    key = jax.random.PRNGKey(0)
    u = u + PERT * jax.random.normal(key, u.shape, u.dtype)

stats_fn = jax.jit(lambda u, p: (jnp.abs(u).max(), jnp.abs(p).max(),
                                 jnp.isfinite(u).all(),
                                 jnp.isfinite(p).all()))
t_meas = None
for k in range(STEPS):
    if k == 10:
        t_meas = time.time()
    u, p, up, phi, t, ms = run(params, u, p, up, phi, t)
    every = 1 if k < 6 or k >= STEPS - 2 else 5
    if (k + 1) % every:
        continue
    stats = stats_fn(u, p)
    print(f"step {k+1}: its={int(ms.iterations[0])} "
          f"res={float(ms.residual[0]):.2e} |u|max={float(stats[0]):.4g} "
          f"|p|max={float(stats[1]):.4g} finite={bool(stats[2])}/"
          f"{bool(stats[3])}", flush=True)
    if not (bool(stats[2]) and bool(stats[3])):
        break
if t_meas is not None and STEPS > 10:
    rate = (STEPS - 10) / (time.time() - t_meas)
    print(f"steps 11-{STEPS}: {rate:.3f} steps/s", flush=True)
print("done", flush=True)
