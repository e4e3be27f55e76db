"""Itemize the device-resident HBM of a 3D-1Z configuration on CPU.

The 3.39M-DoF projection run (h=0.023, h_near=0.007) compiles after the
round-5 chunked-segment-sum fix but still RESOURCE_EXHAUSTEDs at runtime
(logs/st_3d1_34M_scatter.log) — the resident arguments plus step temps
exceed the 15.75 GiB v5e HBM.  This probe builds the identical model on
CPU, walks the StepParams pytree + solver state with key paths, and
prints every leaf >= 8 MiB so the trim targets are measured, not
guessed.  It also prints the analytic sizes of the known step
transients (per-component gather rows, convection segment-sum chunks,
FGMRES/BiCGStab basis, block-Jacobi Newton-Schulz temporaries).

Usage: JAX_PLATFORMS=cpu python scripts/exp_hbm_account.py \
           [--h H] [--hnear H] [--bu B] [--f-precond bj|diag] [--mono]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

ap = argparse.ArgumentParser()
ap.add_argument("--h", type=float, default=0.023)
ap.add_argument("--hnear", type=float, default=0.007)
ap.add_argument("--hz", type=float, default=None)
ap.add_argument("--bu", type=int, default=0)
ap.add_argument("--f-precond", default="bj", choices=["bj", "diag"])
ap.add_argument("--mono", action="store_true")
args = ap.parse_args()

import jax

# this environment force-registers the axon TPU backend at interpreter
# startup and overrides JAX_PLATFORMS; only an explicit config update
# reliably selects CPU (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from navierstokes_tpu.config import InletConfig, SolverConfig
from navierstokes_tpu.mesh import duct_with_box_obstacle_3d
from navierstokes_tpu.models.navier_stokes import NavierStokes

mesh = duct_with_box_obstacle_3d(h=args.h, h_near=args.hnear, h_z=args.hz)

cfg = SolverConfig(dtype="float32", nu=1.0e-3, ref_length=0.1,
                   force_formula="st",
                   scheme="monolithic" if args.mono else "projection",
                   f_precond=args.f_precond, bsr_block=args.bu,
                   proj_f_maxiter=100, proj_p_maxiter=50,
                   output_dir="/tmp/st_out", cache_dir="/tmp/st_cache",
                   csv_path="/tmp/acct.csv", inner_maxiter_f=10)
inlet = InletConfig(kind="biparabolic", u_m=0.45, height=0.41)
ns = NavierStokes(mesh, 2, 1, deltat=0.01, T=3.0, step=400, inlet=inlet,
                  config=cfg)
ns.setup()
print("setup done", flush=True)
ns._init_state(0)
params = ns._params()

GB = float(1 << 30)
rows = []
seen = {}


def walk(prefix, leaf):
    if isinstance(leaf, (jax.Array, np.ndarray)):
        if id(leaf) in seen:
            rows.append((0.0, f"{prefix}  [= {seen[id(leaf)]}]",
                         leaf.shape, leaf.dtype))
            return
        seen[id(leaf)] = prefix
        rows.append((leaf.size * leaf.dtype.itemsize / GB, prefix,
                     leaf.shape, leaf.dtype))


flat = jax.tree_util.tree_flatten_with_path(params)[0]
for path, leaf in flat:
    walk("params" + jax.tree_util.keystr(path), leaf)
for name in ("_u", "_p", "_u_prev", "_phi"):
    walk("state." + name, getattr(ns, name, None))

total = sum(r[0] for r in rows)
rows.sort(reverse=True)
print(f"\n== resident arguments: {total:.3f} GiB ==")
for sz, name, shape, dt in rows:
    if sz >= 8 / 1024:
        print(f"{sz:8.3f} GiB  {name}  {shape} {dt}")

# ---- analytic step transients ------------------------------------------
e = ns.ell
n_ext, K0 = e.f_cols.shape
bu = e.bu
C = K0 * bu
d = ns.dim
n_u = ns.space.n_p2 * d
print(f"\n== step transients (analytic) ==  bu={bu} K0={K0} "
      f"n_ext={n_ext} ncon={e.con_row.shape[0]}")
print(f"{d * n_ext * C * 4 / GB:8.3f} GiB  xg per-component gather rows "
      f"(d x (n_ext, C) f32)")
if e.con_splits is not None:
    mx = max(i1 - i0 for (i0, i1, s0, s1) in e.con_splits)
    print(f"{mx * C * 4 / GB:8.3f} GiB  largest convection segsum chunk "
          f"(({mx}, {C}) f32) x2 (in+out)  [{len(e.con_splits)} chunks]")
else:
    print(f"{e.con_row.shape[0] * C * 4 / GB:8.3f} GiB  convection "
          f"segsum rows (unchunked)")
m = 30
print(f"{2 * (m + 1) * n_u * 4 / GB:8.3f} GiB  FGMRES V+Z basis "
      f"(2 x {m + 1} x {n_u})")
plan = getattr(ns, "_bj_plan", None)
if plan is not None:
    ts = plan.S * plan.bu
    ntl = plan.n_tiles
    print(f"{3 * ntl * ts * ts * 4 / GB:8.3f} GiB  bj Newton-Schulz "
          f"temporaries (3 x ({ntl},{ts},{ts}) f32), layout="
          f"{plan.layout}")
