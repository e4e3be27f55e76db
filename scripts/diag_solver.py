"""Solver-layer diagnostics: inner F/S convergence quality and outer
contraction at a given mesh size.  CPU/f64 by default (runs anywhere)."""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from navierstokes_tpu.config import InletConfig, SolverConfig
from navierstokes_tpu.mesh import channel_with_cylinder_2d
from navierstokes_tpu.models.navier_stokes import NavierStokes
from navierstokes_tpu.ops import bsr as B
from navierstokes_tpu.solvers.krylov import bicgstab, fgmres
from navierstokes_tpu.solvers.schur import (build_coarse_plan, coarse_inverse,
                                            coarse_matrix, make_two_level)

h = float(sys.argv[1]) if len(sys.argv) > 1 else 0.012
dtype = "float32" if "--tpu" in sys.argv else "float64"

mesh = channel_with_cylinder_2d(h=h, h_near=h / 2)
inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41)
cfg = SolverConfig(dtype=dtype, output_dir="/tmp/dg", cache_dir="/tmp/dgc",
                   csv_path="/tmp/dg.csv")
ns = NavierStokes(mesh, 2, 1, deltat=0.02, T=1.0, step=10, inlet=inlet,
                  config=cfg)
ns.set_re_number(100)
ns.setup()
ns._init_state(0)
params = ns._params()
print(f"dofs={ns.space.n_dofs}", flush=True)

# take one converged-ish state: a few steps with small outer budget
bsr = params.cells
mask = params.bc.mask
mflat = mask[:, 0]

# Build the same operator pieces _step_fn builds
from navierstokes_tpu.ops.bsr import apply_f as bsr_f, apply_b as bsr_b, \
    apply_bt as bsr_bt, f_diag as bsr_diag, convection_blk

u = ns._u
conv = convection_blk(bsr, u)
f_blk = params.a0_cell + conv
d = bsr_diag(bsr, f_blk)
sigma = jnp.sum(d * mflat) / jnp.sum(mflat)
d_bc = d * mflat + sigma * (1 - mflat)
dinv = (1.0 / d_bc)[:, None]
w = dinv[:, 0] * mflat


def apply_F(xu):
    xum = xu * mask
    return bsr_f(bsr, f_blk, xum) * mask + sigma * (xu - xum)


def apply_Bt(xp):
    return bsr_bt(bsr, xp) * mask


def apply_B(xu):
    return bsr_b(bsr, xu * mask)


def apply_S(v):
    return apply_B(apply_Bt(v) * dinv)


from navierstokes_tpu.ops.bsr import schur_diag as bsr_sdiag
diag_s = bsr_sdiag(bsr, w)

rng = np.random.default_rng(0)
ru = jnp.asarray(rng.standard_normal((ns.space.n_p2, 2)), ns.dtype) * mask
rp = jnp.asarray(rng.standard_normal(ns.space.n_p1), ns.dtype)

# --- inner F quality ---
for m in (5, 10, 20):
    res = bicgstab(apply_F, ru, tol=1e-10, maxiter=m,
                   precond=lambda r: r * dinv)
    rn = np.linalg.norm(np.asarray(apply_F(res.x) - ru)) / \
        np.linalg.norm(np.asarray(ru))
    print(f"F bicgstab {m} its: rel res {rn:.2e}", flush=True)

# --- inner S quality: jacobi vs two-level ---
sdinv = jnp.where(diag_s != 0, 1 / diag_s, 1.0)
plan = ns._coarse_plan
sc = coarse_matrix(bsr, plan, w)
sc_inv = coarse_inverse(sc)
two = make_two_level(apply_S, diag_s, plan, sc_inv)
for name, pc in (("jacobi", lambda r: r * sdinv), ("two-level", two)):
    for m in (10, 20, 40):
        res = bicgstab(apply_S, rp, tol=1e-10, maxiter=m, precond=pc)
        rn = np.linalg.norm(np.asarray(apply_S(res.x) - rp)) / \
            np.linalg.norm(np.asarray(rp))
        print(f"S {name} {m} its: rel res {rn:.2e}", flush=True)

# --- outer contraction with the full aSIMPLE ---
from navierstokes_tpu.solvers.preconditioners import InnerSolve, make_asimple


def apply_A(x):
    xu, xp = x
    xum = xu * mask
    yu = bsr_f(bsr, f_blk, xum) + bsr_bt(bsr, xp)
    yu = yu * mask + sigma * (xu - xum)
    yp = bsr_b(bsr, xum)
    return yu, yp


for inf, ins in ((8, 10), (10, 25)):
    M = make_asimple(apply_F, apply_B, apply_Bt, dinv, diag_s, 0.5,
                     InnerSolve(1e-2, inf), InnerSolve(1e-2, ins),
                     precond_s=two)
    b = (ru, rp)
    for om in (10, 25, 50):
        t0 = time.time()
        res = fgmres(apply_A, b, tol=1e-10, restart=om, maxiter=om,
                     precond=M)
        print(f"outer F{inf}/S{ins} {om} its: res {float(res.residual):.2e} "
              f"({time.time() - t0:.0f}s)", flush=True)
