"""Validated-physics run AT THE BENCH SCALE (VERDICT round-2 item 3).

Runs the physics-validated production scheme (projection, BDF2 +
extrapolated convection, rotational pressure update) on the 1M-DoF
bench mesh with TRUE Schaefer-Turek 2D-2 physics (nu = 1e-3, Re = 100,
parabolic U_m = 1.5, D = 0.1 normalization, ST force formula), long
enough to develop vortex shedding, then reports tail Cd_max / Cl_max /
Strouhal against the published bands (3.22-3.24 / 0.99-1.01 /
0.295-0.305).

Restartable: pass RESTART=<step> to continue from the checkpoint cache.
Artifacts: csv trace (CSV env, default /tmp/stbench.csv), checkpoints
under CACHE (default /tmp/stbench_cache).

Env: DT (default 0.00125), T (default 8.0), RAMP (default 0.1),
RESTART (default 0), OUT_EVERY (steps between checkpoints, default 1600).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nstpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from navierstokes_tpu.config import InletConfig, SolverConfig
from navierstokes_tpu.mesh.geometry import Mesh
from navierstokes_tpu.models.navier_stokes import NavierStokes
from navierstokes_tpu.utils.analysis import load_forces, strouhal

DT = float(os.environ.get("DT", "0.00125"))
T = float(os.environ.get("T", "8.0"))
RAMP = float(os.environ.get("RAMP", "0.1"))
RESTART = int(os.environ.get("RESTART", "0"))
OUT_EVERY = int(os.environ.get("OUT_EVERY", "1600"))
CSV = os.environ.get("CSV", "/tmp/stbench.csv")
CACHE = os.environ.get("CACHE", "/tmp/stbench_cache")

z = np.load(os.path.join(os.path.dirname(__file__), "..",
                         ".bench_mesh.npz"))
mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])
inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41, ramp=RAMP)
cfg = SolverConfig(dtype="float32", nu=1.0e-3, ref_length=0.1,
                   force_formula="st", scheme="projection",
                   proj_bdf2=True,
                   output_dir="/tmp/stbench_out", cache_dir=CACHE,
                   csv_path=CSV)
over = os.environ.get("NS_OVERRIDES")
if over:
    for k, v in json.loads(over).items():
        setattr(cfg, k, v)
    print(f"overrides: {over}", flush=True)

ns = NavierStokes(mesh, 2, 1, deltat=DT, T=T, step=OUT_EVERY,
                  inlet=inlet, config=cfg)
print(f"dt={DT} T={T} ramp={RAMP} restart={RESTART} nu={cfg.nu}",
      flush=True)
t0 = time.time()
ns.setup()
print(f"setup {time.time()-t0:.0f}s; DoFs {ns.space.n_dofs}", flush=True)

t0 = time.time()
# append to the csv on restart so the trace stays continuous
ns.solve(time_step=RESTART)
wall = time.time() - t0
n_steps = int(round(T / DT)) - RESTART
print(f"\n{n_steps} steps in {wall:.0f}s -> {n_steps/wall:.3f} steps/s "
      "(incl. compile + I/O)", flush=True)

df = load_forces(CSV)
tail = df[df["time"] > 0.75 * T]
cd_max, cl_max = float(tail["Cd"].max()), float(tail["Cl"].max())
st = strouhal(CSV, skip_fraction=0.75, ref_length=0.1, u_mean=1.0)
print(json.dumps(dict(dofs=ns.space.n_dofs, dt=DT, cd_max=round(cd_max, 4),
                      cl_max=round(cl_max, 4), st=round(st, 4),
                      band_cd="3.22-3.24", band_cl="0.99-1.01",
                      band_st="0.295-0.305")), flush=True)
