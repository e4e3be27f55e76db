"""Schaefer-Turek benchmark validation runs.

Usage: python scripts/validate_st.py [case] [--h H] [--cpu] [--projection]
  case: 2d1 (Re=20 steady) | 2d2 (Re=100 vortex shedding)
      | 3d1 (3D-1Z square column, Re=20 steady)

Prints Cd/Cl in BOTH conventions:
  * reference convention (ref_length = 0.4, matching the deal.II solver's
    printed values — src/NavierStokes.hpp:256)
  * standard ST convention (D = 0.1) with published intervals
    (2D-1: Cd 5.57-5.59, Cl 0.0104-0.0110; 2D-2: Cd_max 3.22-3.24,
     Cl_max 0.99-1.01, St 0.295-0.305; 3D-1Z: Cd 7.5-7.7, Cl 0.06-0.08)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ap = argparse.ArgumentParser(description=__doc__,
                             formatter_class=argparse.RawDescriptionHelpFormatter)
ap.add_argument("case", nargs="?", default="2d1",
                choices=["2d1", "2d2", "3d1"])
ap.add_argument("--h", type=float, default=0.015, help="far-field spacing")
ap.add_argument("--hnear", type=float, default=None,
                help="near-obstacle spacing (default: case-specific)")
ap.add_argument("--hz", type=float, default=None,
                help="3D z spacing (3d1 only; default couples to --hnear)")
ap.add_argument("--T", type=float, default=None, help="final time override")
ap.add_argument("--dt", type=float, default=None, help="time step override")
ap.add_argument("--cpu", action="store_true",
                help="run on CPU in float64")
ap.add_argument("--projection", action="store_true",
                help="projection scheme instead of monolithic")
ap.add_argument("--refine", type=int, default=0,
                help="iterative-refinement passes (monolithic, fp32)")
ap.add_argument("--no-curved", action="store_true",
                help="disable curved (boundary-snapped P2) geometry")
ap.add_argument("--csv", default=None, help="csv output path override")
ap.add_argument("--wake-levels", type=int, default=None,
                help="extra wake-band refinement levels (2d2 default 1)")
ap.add_argument("--bsr-block", type=int, default=0,
                help="BSR block size (0 = auto, see SolverConfig)")
ap.add_argument("--steps-per-chunk", type=int, default=0,
                help="cap the jitted scan chunk length (1 near the HBM "
                     "limit: a second chunk-length variant is a second "
                     "resident TPU executable arena)")
ap.add_argument("--proj-poisson", default="laplacian",
                choices=["laplacian", "schur"],
                help="projection Poisson operator (schur = exact "
                     "discrete projection via the compatible B W B^T)")
ap.add_argument("--f-precond", default="bj", choices=["bj", "diag"],
                help="momentum-solve preconditioner (diag avoids the "
                     "block-Jacobi tile machinery: HBM-lean at >2M DoF)")
args = ap.parse_args()
if args.hz is not None and args.case != "3d1":
    print("note: --hz is only used for 3d1; ignoring", file=sys.stderr)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nstpu"))
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np

from navierstokes_tpu.config import InletConfig, SolverConfig
from navierstokes_tpu.mesh import channel_with_cylinder_2d
from navierstokes_tpu.models.navier_stokes import NavierStokes
from navierstokes_tpu.utils.analysis import load_forces, strouhal

case = args.case
h = args.h
scheme = "projection" if args.projection else "monolithic"

# True Schaefer-Turek setup: nu = 1e-3, D = 0.1 normalization.  (Note: the
# reference's set_re_number path uses its Diameter=0.4 quirk, which at
# "Re=20" actually gives nu=0.004, i.e. a TRUE Reynolds number of 5 — we
# validate the physics against the published benchmarks directly.)
dtype = "float64" if args.cpu else "float32"
csv = args.csv or f"/tmp/st_{case}.csv"
if case == "3d1":
    # ST 3D-1Z: square column in a duct (mesh/domain3D.geo geometry),
    # bi-parabolic inlet U_m=0.45 (tests/3D/test_01/src/test_01.cpp:15,24),
    # TRUE Re = U_mean*D/nu = 0.2*0.1/1e-3 = 20; published Cd 7.5-7.7
    from navierstokes_tpu.mesh import duct_with_box_obstacle_3d
    mesh = duct_with_box_obstacle_3d(h=h, h_near=args.hnear, h_z=args.hz)
    inlet = InletConfig(kind="biparabolic", u_m=0.45, height=0.41)
    dt, T = 0.01, 3.0
else:
    wl = args.wake_levels if args.wake_levels is not None else (
        1 if case == "2d2" else 0)
    mesh = channel_with_cylinder_2d(h=h, h_near=args.hnear or h / 3,
                                    wake_levels=wl)
    if case == "2d1":
        inlet = InletConfig(kind="parabolic", u_m=0.3, height=0.41)
        # T=6: the start-up Cl oscillation decays by ~t=4.5; the tail
        # statistic then samples the converged steady state
        dt, T = 0.01, 6.0
    else:
        inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41)
        dt, T = 0.0025, 8.0

if args.T is not None:
    T = args.T
if args.dt is not None:
    dt = args.dt

cfg = SolverConfig(dtype=dtype, nu=1.0e-3, ref_length=0.1,
                   force_formula="st", scheme=scheme, refine=args.refine,
                   f_precond=args.f_precond,
                   proj_f_maxiter=100, proj_p_maxiter=50,
                   curved_boundary=not args.no_curved,
                   bsr_block=args.bsr_block,
                   proj_poisson=args.proj_poisson,
                   steps_per_chunk=args.steps_per_chunk,
                   output_dir="/tmp/st_out", cache_dir="/tmp/st_cache",
                   csv_path=csv, inner_maxiter_f=10)
ns = NavierStokes(mesh, 2, 1, deltat=dt, T=T, step=400, inlet=inlet,
                  config=cfg)
ns.setup()
try:
    stats = jax.local_devices()[0].memory_stats() or {}
    used = stats.get("bytes_in_use", 0)
    lim = stats.get("bytes_limit", 0)
    if used:
        print(f"HBM after setup: {used/2**30:.2f} GiB in use"
              + (f" / {lim/2**30:.2f} GiB limit" if lim else ""),
              flush=True)
except Exception:
    pass
ns.solve()

df = load_forces(csv)
n = len(df)
tail = df.iloc[int(n * 0.6):]
if case == "2d1":
    # steady case: report the SETTLED state (last 10%) — the start-up Cl
    # oscillation decays through most of the run, so a wide-window mean
    # understates the converged value
    settled = df.iloc[int(n * 0.9):]
    cd, cl = float(settled["Cd"].mean()), float(settled["Cl"].mean())
    print(f"[standard ST] Cd = {cd:.4f} (target 5.57-5.59), "
          f"Cl = {cl:.4f} (target 0.0104-0.0110)  [settled: last 10%]")
elif case == "3d1":
    cd, cl = float(tail["Cd"].mean()), float(tail["Cl"].mean())
    print(f"[standard ST 3D-1Z] Cd = {cd:.4f} (target 7.5-7.7), "
          f"Cl = {cl:.4f} (target 0.06-0.08)")
else:
    cd_max = float(tail["Cd"].max())
    cl_max = float(tail["Cl"].max())
    u_mean = 2.0 * 1.5 / 3.0
    st = strouhal(csv, ref_length=0.1, u_mean=u_mean)
    print(f"[standard ST] Cd_max = {cd_max:.4f} (target 3.22-3.24), "
          f"Cl_max = {cl_max:.4f} (target 0.99-1.01), "
          f"St = {st:.4f} (target 0.295-0.305)")
